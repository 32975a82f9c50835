import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np, zlib
from defl_tpu.ops import inflate_batch as ib
from defl_tpu.runtime.pack import pack_streams

N = 32
stream = zlib.compress(b"hello world " * 50, 6)
packed = pack_streams([stream], 1, [1024])
words = np.zeros((N, 256), np.uint32); words[:1, :packed.words.shape[1]] = packed.words
nbits = jnp.asarray(np.full(N, 8*len(stream), np.int32))
cap = jnp.full((N,), 1024, jnp.int32)
limit = jnp.full((N,), 1 << 30, jnp.int32)
words_j = jnp.asarray(words)
W = 256; S = (W + ib.SEG - 1) // ib.SEG
wpad = jnp.pad(words_j, ((0, 0), (0, S * ib.SEG - W)))
lo3 = (wpad & jnp.uint32(0xFFFF)).astype(jnp.float32).reshape(N, S, ib.SEG)
hi3 = (wpad >> jnp.uint32(16)).astype(jnp.float32).reshape(N, S, ib.SEG)
K = 128

def mk_chunk(do_refill, do_builds):
    @jax.jit
    def one_chunk(st, ck):
        if do_refill:
            ck = ib._refill_windows(ck, st, lo3, hi3)
        if do_builds:
            ck, st = ib._apply_builds(ck, st)
        def sbody(st, _):
            loc0 = jnp.clip((st["bitpos"] >> 5) - ck["win_word"], 0, ib.WIN - ib.SMALL)
            small = ib._extract_small(ck["win"], loc0)
            small_base = ck["win_word"] + loc0
            toks = []
            for _u in range(ib.UNROLL):
                st, (tok, tok2) = ib._step(st, ck, small, small_base, nbits,
                                           cap, limit, 0, False)
                toks.append(tok); toks.append(tok2)
            return st, jnp.stack(toks)
        st, toks = jax.lax.scan(sbody, st, None, length=K // ib.UNROLL)
        return st, ck, toks
    return one_chunk

st0 = ib._init_scan_state(N); ck0 = ib._init_chunk_state(N)
st0["state"] = jnp.full((N,), ib.S_BHDR, jnp.int32)
for name, (dr, db) in [("neither", (0,0)), ("refill", (1,0)),
                       ("builds", (0,1)), ("both", (1,1))]:
    fn = mk_chunk(dr, db)
    r = fn(st0, ck0); np.asarray(r[0]["bitpos"])
    t0 = time.perf_counter()
    r = fn(st0, ck0); np.asarray(r[0]["bitpos"])
    print(f"chunk[{name}]: {time.perf_counter()-t0:.3f}s", flush=True)
