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
words_j = jnp.asarray(words)
W = 256; S = (W + ib.SEG - 1) // ib.SEG
wpad = jnp.pad(words_j, ((0, 0), (0, S * ib.SEG - W)))
lo3 = (wpad & jnp.uint32(0xFFFF)).astype(jnp.float32).reshape(N, S, ib.SEG)
hi3 = (wpad >> jnp.uint32(16)).astype(jnp.float32).reshape(N, S, ib.SEG)

st = ib._init_scan_state(N); ck = ib._init_chunk_state(N)

@jax.jit
def refill(st, ck):
    return ib._refill_windows(ck, st, lo3, hi3)

@jax.jit
def builds(st, ck):
    st = dict(st); st["need_build"] = jnp.full((N,), 3, jnp.int32)
    return ib._apply_builds(ck, st)

@jax.jit
def extract(st, ck):
    def body(st, _):
        loc0 = jnp.clip((st["bitpos"] >> 5) - ck["win_word"], 0, ib.WIN - ib.SMALL)
        small = ib._extract_small(ck["win"], loc0)
        st = dict(st); st["bitpos"] = st["bitpos"] + small[:, 0].astype(jnp.int32) % 3
        return st, ()
    st, _ = jax.lax.scan(body, st, None, length=32)
    return st

for name, fn in [("refill", refill), ("builds", builds), ("extract32", extract)]:
    r = fn(st, ck); jax.tree.map(lambda a: np.asarray(a).ravel()[0] if hasattr(a, 'ravel') else a, r)
    t0 = time.perf_counter()
    r = fn(st, ck)
    jax.tree.map(lambda a: np.asarray(a).ravel()[0] if hasattr(a, 'ravel') else a, r)
    print(f"{name}: {time.perf_counter()-t0:.3f}s", flush=True)
