import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from defl_tpu.ops import inflate_batch as ib

N = 32
st0 = ib._init_scan_state(N)
ck0 = ib._init_chunk_state(N)
st0["state"] = jnp.full((N,), ib.S_SYM, jnp.int32)
nbits = jnp.full((N,), 99999, jnp.int32)
cap = jnp.full((N,), 65536, jnp.int32)
limit = jnp.full((N,), 1 << 30, jnp.int32)

@jax.jit
def run(st, ck, small, small_base):
    def body(st, _):
        st, toks = ib._step(st, ck, small, small_base, nbits, cap, limit,
                            0, False)
        return st, toks
    st, t = jax.lax.scan(body, st, None, length=128)
    return st, t

small0 = jnp.zeros((N, ib.SMALL), jnp.uint32)
sb0 = jnp.zeros((N,), jnp.int32)
r = run(st0, ck0, small0, sb0); np.asarray(r[0]["bitpos"])
t0 = time.perf_counter()
r = run(st0, ck0, small0, sb0); np.asarray(r[0]["bitpos"])
print(f"scan128 step, traced ck: {time.perf_counter()-t0:.3f}s", flush=True)

@jax.jit
def canon_only(ck, peek):
    def body(p, _):
        s, c, f = ib._canonical_decode(ck, p, jnp.zeros(p.shape, bool),
                                       jnp.zeros(p.shape, bool))
        return p + s.astype(jnp.uint32) + c.astype(jnp.uint32), ()
    p, _ = jax.lax.scan(body, peek, None, length=512)
    return p

peek = jnp.zeros((N,), jnp.uint32)
r = canon_only(ck0, peek); np.asarray(r)
t0 = time.perf_counter()
r = canon_only(ck0, peek); np.asarray(r)
print(f"scan512 canonical_decode: {time.perf_counter()-t0:.3f}s", flush=True)

@jax.jit
def lens_only(st):
    def body(lp, i):
        lp = ib._write_lens_run(lp, jnp.ones((N,), bool), i % 300 + 0*lp[0].astype(jnp.int32),
                                i % 300 + 3 + 0*lp[0].astype(jnp.int32), jnp.full((N,), 5, jnp.int32))
        return lp, ()
    lp, _ = jax.lax.scan(body, st["lens_pk"], jnp.arange(512, dtype=jnp.int32))
    return lp

r = lens_only(st0); np.asarray(r[0, 0])
t0 = time.perf_counter()
r = lens_only(st0); np.asarray(r[0, 0])
print(f"scan512 write_lens_run: {time.perf_counter()-t0:.3f}s", flush=True)
