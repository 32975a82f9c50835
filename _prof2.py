import time, zlib, jax, jax.numpy as jnp, numpy as np
from defl_tpu.runtime.pack import pack_streams
from defl_tpu.ops.inflate_batch import decode_tokens, step_budget
from bench import make_silesia_like
N, block = 8192, 65536
payloads = make_silesia_like(N*block, block)[:N]
cc={}
streams = [cc.setdefault(id(p), zlib.compress(p, 6)) for p in payloads]
packed = pack_streams(streams, 1, block)
T = step_budget(block)
a = [jnp.asarray(x) for x in (packed.words, packed.nbits, packed.zflag, packed.dst_cap)]
toks, st = decode_tokens(*a, T=T, K=256)
_ = np.asarray(st["status"])
with jax.profiler.trace("/tmp/jaxtrace2"):
    toks, st = decode_tokens(*a, T=T, K=256)
    _ = np.asarray(st["status"])
print("done", flush=True)
