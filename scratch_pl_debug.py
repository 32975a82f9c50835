"""Find mismatching lanes: pattern + minimal repro."""
import os, sys, time, zlib
import numpy as np
sys.path.insert(0, "/root/repo")
from defl_tpu import bench as B
import jax, jax.numpy as jnp
from defl_tpu.runtime.pack import pack_streams
from defl_tpu.ops.pallas.decode_pl import decode_tokens_pl
from defl_tpu.ops.inflate_batch import decode_tokens, step_budget
from defl_tpu.runtime.native import native_resolve_tokens

n_streams = 8192
block = 65536
payloads = B.make_silesia_like(n_streams * block, block)[:n_streams]
cache = {}
streams = [cache.setdefault(id(p), zlib.compress(p, 6)) for p in payloads]
packed = pack_streams(streams, 1, block)
w_pad = 1024
while w_pad < packed.words.shape[1]:
    w_pad *= 2
wp = np.zeros((packed.n, w_pad), np.uint32)
wp[:, : packed.words.shape[1]] = packed.words
packed.words = wp
T = step_budget(block)
toks, st = decode_tokens_pl(jnp.asarray(packed.words), jnp.asarray(packed.nbits),
                            jnp.asarray(packed.zflag), jnp.asarray(packed.dst_cap),
                            T=T, K=int(os.environ.get("K", "128")))
stn = {k: np.asarray(v) for k, v in st.items()}
tn = np.asarray(jnp.transpose(toks))
dp = stn["dst_pos"]
out = native_resolve_tokens(tn, packed.words, dp, block)
bad = [i for i in range(n_streams)
       if out[i, :dp[i]].tobytes() != payloads[i]]
print("bad lanes:", len(bad), flush=True)
print("first 40:", bad[:40], flush=True)
print("mod64 (content id):", sorted(set(i % 64 for i in bad)), flush=True)
print("mod128 (lane col):", sorted(set(i % 128 for i in bad))[:20], flush=True)
print("row (i//128):", sorted(set(i // 128 for i in bad))[:20], flush=True)
print("status of bad:", set(int(stn["status"][i]) for i in bad), flush=True)
print("dst_pos of bad:", set(int(dp[i]) for i in bad[:10]), flush=True)
i = bad[0]
# where does the output diverge?
got = out[i, :dp[i]].tobytes(); want = payloads[i]
for k in range(min(len(got), len(want))):
    if got[k] != want[k]:
        print(f"lane {i}: first divergence at byte {k}/{len(want)}", flush=True)
        break
np.save("/tmp/bad_lanes.npy", np.array(bad))
