import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from defl_tpu.ops import inflate_batch as ib

N = 32
nbits = jnp.full((N,), 99999, jnp.int32)
cap = jnp.full((N,), 1024, jnp.int32)
limit = jnp.full((N,), 1 << 30, jnp.int32)

def mk(unroll, length, state):
    @jax.jit
    def one_chunk(st, ck, small_in):
        def sbody(st, _):
            toks = []
            for _u in range(unroll):
                st, (tok, tok2) = ib._step(st, ck, small_in, ck["win_word"],
                                           nbits, cap, limit, 0, False)
                toks.append(tok); toks.append(tok2)
            return st, jnp.stack(toks)
        st, toks = jax.lax.scan(sbody, st, None, length=length)
        return st, toks
    return one_chunk

ck0 = ib._init_chunk_state(N)
small0 = jnp.zeros((N, ib.SMALL), jnp.uint32)
for unroll, length, state in [(1, 128, ib.S_SYM), (1, 128, ib.S_BHDR),
                              (4, 32, ib.S_SYM), (4, 32, ib.S_BHDR)]:
    st0 = ib._init_scan_state(N)
    st0["state"] = jnp.full((N,), state, jnp.int32)
    fn = mk(unroll, length, state)
    r = fn(st0, ck0, small0); np.asarray(r[0]["bitpos"])
    t0 = time.perf_counter()
    r = fn(st0, ck0, small0); np.asarray(r[0]["bitpos"])
    print(f"chunk[u{unroll} l{length} s{state}]: {time.perf_counter()-t0:.3f}s", flush=True)
