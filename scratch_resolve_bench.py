"""Device resolve_tokens rate at bench scale."""
import os, sys, time, zlib
import numpy as np
sys.path.insert(0, "/root/repo")
from defl_tpu import bench as B
import jax, jax.numpy as jnp
from defl_tpu.runtime.pack import pack_streams
from defl_tpu.ops.pallas.decode_pl import decode_tokens_pl
from defl_tpu.ops.inflate_batch import step_budget
from defl_tpu.ops.resolve import resolve_tokens

n_streams = int(os.environ.get("S", "8192"))
block = 65536
payloads = B.make_silesia_like(n_streams * block, block)[:n_streams]
cache = {}
streams = [cache.setdefault(id(p), zlib.compress(p, 6)) for p in payloads]
raw = sum(len(p) for p in payloads)
packed = pack_streams(streams, 1, block)
w_pad = 1024
while w_pad < packed.words.shape[1]:
    w_pad *= 2
wp = np.zeros((packed.n, w_pad), np.uint32)
wp[:, : packed.words.shape[1]] = packed.words
packed.words = wp
T = step_budget(block)
words = jnp.asarray(packed.words)
toks, st = decode_tokens_pl(words, jnp.asarray(packed.nbits),
                            jnp.asarray(packed.zflag),
                            jnp.asarray(packed.dst_cap), T=T, K=128)
print("decode ok:", int((np.asarray(st["status"])==0).sum()), flush=True)
rfn = jax.jit(lambda t, w, d: resolve_tokens(t, w, d, C=block))
t0 = time.perf_counter()
out = rfn(toks, words, st["dst_pos"])
np.asarray(out[0, :4])
print(f"resolve first: {time.perf_counter()-t0:.1f}s", flush=True)
for r in range(3):
    t0 = time.perf_counter()
    out = rfn(toks, words, st["dst_pos"])
    np.asarray(out[0, :4])
    dt = time.perf_counter() - t0
    print(f"resolve rep {r}: {dt*1e3:.1f}ms -> {raw/dt/1e9:.3f} GB/s", flush=True)
# spot-check correctness
dp = np.asarray(st["dst_pos"])
for i in (0, 1, 4000, 8191):
    got = np.asarray(out[i, :dp[i]]).tobytes()
    print(i, "ok", got == payloads[i], flush=True)
