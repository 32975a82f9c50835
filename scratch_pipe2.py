import os, sys, time, zlib
import numpy as np
sys.path.insert(0, "/root/repo")
from defl_tpu import bench as B
import jax, jax.numpy as jnp
from defl_tpu.runtime.session import _pick_decoder
from defl_tpu.ops.inflate_batch import step_budget
from defl_tpu.runtime.pack import pack_streams
from defl_tpu.runtime.native import native_resolve_tokens
from concurrent.futures import ThreadPoolExecutor

n_streams, block = 8192, 65536
payloads = B.make_silesia_like(n_streams * block, block)[:n_streams]
cache = {}
streams = [cache.setdefault(id(p), zlib.compress(p, 6)) for p in payloads]
raw = sum(len(p) for p in payloads)
dec = _pick_decoder()
T = step_budget(block)
packed = pack_streams(streams, 1, block)
Bn = 4
dev_in = []
for _ in range(Bn):
    a = (jnp.asarray(packed.words), jnp.asarray(packed.nbits),
         jnp.asarray(packed.zflag), jnp.asarray(packed.dst_cap))
    for x in a: np.asarray(x.ravel()[0])
    dev_in.append(a)
toks, st = dec(*dev_in[0], T=T, K=128)
tn = np.asarray(jnp.transpose(toks))
np.asarray(st["status"].ravel()[0])
print("warm", flush=True)
RT = int(os.environ.get("RT", "3"))

def resolve_one(i, dst_pos):
    t0 = time.perf_counter()
    out = native_resolve_tokens(tn, packed.words, dst_pos, block, n_threads=RT)
    print(f"  resolve[{i}]: {time.perf_counter()-t0:.3f}s", flush=True)
    return out

t_all = time.perf_counter()
with ThreadPoolExecutor(1) as ex:
    pending = None
    for i, a in enumerate(dev_in):
        t0 = time.perf_counter()
        toks, st = dec(*a, T=T, K=128)
        t1 = time.perf_counter()
        dst_pos = np.asarray(st["dst_pos"]); status = np.asarray(st["status"])
        t2 = time.perf_counter()
        if pending is not None:
            pending.result()
        t3 = time.perf_counter()
        pending = ex.submit(resolve_one, i, dst_pos)
        print(f"iter {i}: dispatch {t1-t0:.3f}s fetch {t2-t1:.3f}s wait {t3-t2:.3f}s", flush=True)
    pending.result()
wall = time.perf_counter() - t_all
print(f"wall {wall:.2f}s -> {raw*Bn/wall/1e9:.3f} GB/s", flush=True)
