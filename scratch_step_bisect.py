"""Time scan(_step) alone, then bisect internals."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from defl_tpu.ops import inflate_batch as ib

N = 32
st = ib._init_scan_state(N)
ck = ib._init_chunk_state(N)
st["state"] = jnp.full((N,), ib.S_SYM, jnp.int32)
nbits = jnp.full((N,), 99999, jnp.int32)
cap = jnp.full((N,), 65536, jnp.int32)
limit = jnp.full((N,), 1 << 30, jnp.int32)
small = jnp.zeros((N, ib.SMALL), jnp.uint32)
small_base = jnp.zeros((N,), jnp.int32)

@jax.jit
def run(st, small, small_base):
    def body(st, _):
        st, toks = ib._step(st, ck, small, small_base, nbits, cap, limit,
                            0, False)
        return st, toks
    st, t = jax.lax.scan(body, st, None, length=128)
    return st, t

t0 = time.perf_counter()
s2, t = run(st, small, small_base)
np.asarray(s2["bitpos"])
print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
for r in range(2):
    t0 = time.perf_counter()
    s2, t = run(st, small, small_base)
    np.asarray(s2["bitpos"])
    print(f"scan(128 steps): {time.perf_counter()-t0:.3f}s", flush=True)
