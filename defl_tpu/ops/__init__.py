"""Device compute ops (JAX/XLA/Pallas).

Importing this package enables JAX's persistent compilation cache (unless
DEFL_TPU_NO_COMPILE_CACHE is set): the lockstep decoder compiles once per
shape bucket and the XLA executable is reused across processes — the same
role the reference's lazily-built static Huffman tables play for it
(infl.c:1044-1052), but at compilation granularity.
"""

import os


def _enable_compile_cache():
    if os.environ.get("DEFL_TPU_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "DEFL_TPU_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "defl_tpu", "jax"),
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax knobs
        pass


_enable_compile_cache()
