import os, sys, time, zlib
import numpy as np
sys.path.insert(0, "/root/repo")
from defl_tpu import bench as B
from defl_tpu.runtime import large
from defl_tpu.runtime import native
from defl_tpu.errors import Result

raw = b"".join(B.make_silesia_like(8 << 20, 65536))
comp = zlib.compress(raw, 6)
body = np.frombuffer(comp, np.uint8)[2:]
n_seg = max(1, body.size // large.SEGMENT_BYTES)
cands = large._find_candidates(body, 0, n_seg, 8 * large.SEGMENT_BYTES)
print("segments:", n_seg, "cands:", len(cands), flush=True)
li = large._device_decode(body, cands, 128)
toks_nt, dst_pos, status, final, bit_end, words = li
M = len(cands)
okc = 0
for k in range(M):
    want = cands[k + 1] if k + 1 < M else None
    ok = status[k] == 0 and (final[k] > 0 or (want is not None and bit_end[k] == want))
    okc += ok
    if k < 12 or (not ok and okc > 0):
        print(f"k={k} status={status[k]} final={final[k]} dst={dst_pos[k]} "
              f"end={bit_end[k]} want={want} ok={ok}", flush=True)
print(f"valid lanes: {okc}/{M}", flush=True)
print("finals:", np.nonzero(final > 0)[0][:10], flush=True)
