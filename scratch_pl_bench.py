"""Decode-stage bench: Pallas kernel vs XLA path, full corpus."""
import os, sys, time, zlib
import numpy as np
sys.path.insert(0, "/root/repo")
from defl_tpu import bench as B
import jax, jax.numpy as jnp
from defl_tpu.runtime.pack import pack_streams
from defl_tpu.ops.inflate_batch import decode_tokens, step_budget
from defl_tpu.ops.pallas.decode_pl import decode_tokens_pl

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
K = int(os.environ.get("K", "128"))
words = jnp.asarray(packed.words)
nbits = jnp.asarray(packed.nbits)
zflag = jnp.asarray(packed.zflag)
cap = jnp.asarray(packed.dst_cap)

which = os.environ.get("WHICH", "pl")
fn = decode_tokens_pl if which == "pl" else decode_tokens
print(f"== {which} == N={n_streams} K={K}", flush=True)
t0 = time.perf_counter()
toks, st = fn(words, nbits, zflag, cap, T=T, K=K)
stn = np.asarray(st["status"])
print(f"first call {time.perf_counter()-t0:.1f}s ok={int((stn==0).sum())}/{n_streams}", flush=True)
for r in range(3):
    t0 = time.perf_counter()
    toks, st = fn(words, nbits, zflag, cap, T=T, K=K)
    _ = np.asarray(st["status"])
    dt = time.perf_counter() - t0
    print(f"rep {r}: {dt*1e3:.1f}ms -> {raw/dt/1e9:.3f} GB/s", flush=True)
