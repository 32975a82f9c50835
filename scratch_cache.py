import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from defl_tpu.ops.inflate_batch import decode_tokens, step_budget
N, W = 32, 256
T = step_budget(1024)
words = jnp.zeros((N, W), jnp.uint32)
nbits = jnp.zeros(N, jnp.int32)
t0 = time.perf_counter()
lowered = decode_tokens.lower(words, nbits, nbits, nbits, T=T, K=128)
t1 = time.perf_counter()
compiled = lowered.compile()
print(f"8dev lower {t1-t0:.1f}s compile {time.perf_counter()-t1:.1f}s", flush=True)
