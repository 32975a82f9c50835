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

def mk(mode):
    @jax.jit
    def one_chunk(st, ck, small_in):
        def sbody(st, _):
            if mode == "extract":
                loc0 = jnp.clip((st["bitpos"] >> 5) - ck["win_word"], 0, ib.WIN - ib.SMALL)
                small = ib._extract_small(ck["win"], loc0)
                small_base = ck["win_word"] + loc0
            else:
                small = small_in
                small_base = ck["win_word"]
            toks = []
            for _u in range(ib.UNROLL):
                st, (tok, tok2) = ib._step(st, ck, small, small_base, nbits,
                                           cap, limit, 0, False)
                toks.append(tok); toks.append(tok2)
            return st, jnp.stack(toks)
        st, toks = jax.lax.scan(sbody, st, None, length=32)
        return st, toks
    return one_chunk

st0 = ib._init_scan_state(N); ck0 = ib._init_chunk_state(N)
st0["state"] = jnp.full((N,), ib.S_BHDR, jnp.int32)
small0 = jnp.zeros((N, ib.SMALL), jnp.uint32)
for mode in ["noext", "extract"]:
    fn = mk(mode)
    r = fn(st0, ck0, small0); np.asarray(r[0]["bitpos"])
    t0 = time.perf_counter()
    r = fn(st0, ck0, small0); np.asarray(r[0]["bitpos"])
    print(f"chunk[{mode}]: {time.perf_counter()-t0:.3f}s", flush=True)
