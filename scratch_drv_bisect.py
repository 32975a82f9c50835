"""Bisect the decode driver: chunk body pieces on CPU."""
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
nbits_np = np.zeros(N, np.int32); nbits_np[0] = packed.nbits[0]
zf = np.zeros(N, np.int32); zf[0] = 1
cap_np = np.zeros(N, np.int32); cap_np[0] = 1024

words_j = jnp.asarray(words)
nbits = jnp.asarray(nbits_np)
cap = jnp.asarray(cap_np)
limit = jnp.full((N,), 1 << 30, jnp.int32)
W = 256; S = (W + ib.SEG - 1) // ib.SEG
wpad = jnp.pad(words_j, ((0, 0), (0, S * ib.SEG - W)))
lo3 = (wpad & jnp.uint32(0xFFFF)).astype(jnp.float32).reshape(N, S, ib.SEG)
hi3 = (wpad >> jnp.uint32(16)).astype(jnp.float32).reshape(N, S, ib.SEG)
K = 128

def mk(st, ck):
    return st, ck

@jax.jit
def one_chunk(st, ck):
    ck = ib._refill_windows(ck, st, lo3, hi3)
    ck, st = ib._apply_builds(ck, st)
    def sbody(st, _):
        loc0 = jnp.clip((st["bitpos"] >> 5) - ck["win_word"], 0, ib.WIN - ib.SMALL)
        small = ib._extract_small(ck["win"], loc0)
        small_base = ck["win_word"] + loc0
        toks = []
        for _u in range(ib.UNROLL):
            st, (tok, tok2) = ib._step(st, ck, small, small_base, nbits, cap,
                                       limit, 0, False)
            toks.append(tok); toks.append(tok2)
        return st, jnp.stack(toks)
    st, toks = jax.lax.scan(sbody, st, None, length=K // ib.UNROLL)
    return st, ck, toks

st = ib._init_scan_state(N); ck = ib._init_chunk_state(N)
st["state"] = jnp.where(jnp.asarray(zf) > 0, ib.S_ZHDR, ib.S_BHDR)
t0 = time.perf_counter()
s2, c2, t = one_chunk(st, ck)
np.asarray(s2["bitpos"])
print(f"chunk compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
for r in range(3):
    t0 = time.perf_counter()
    s2, c2, t = one_chunk(st, ck)
    np.asarray(s2["bitpos"])
    print(f"one chunk: {time.perf_counter()-t0:.3f}s", flush=True)
