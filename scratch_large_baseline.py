import sys, time, zlib
sys.path.insert(0, "/root/repo")
import numpy as np
from defl_tpu import bench as B
from defl_tpu.runtime import native

raw = b"".join(B.make_silesia_like(64 << 20, 65536))
comp = zlib.compress(raw, 6)
print(f"raw {len(raw)/1e6:.0f}MB comp {len(comp)/1e6:.0f}MB", flush=True)
for r in range(3):
    t0 = time.perf_counter()
    res, out = native.native_inflate(comp, len(raw))
    dt = time.perf_counter() - t0
    print(f"C++ serial inflate: {dt:.2f}s -> {len(raw)/dt/1e9:.3f} GB/s res={res}", flush=True)
assert out == raw
t0 = time.perf_counter(); zlib.decompress(comp); print(f"zlib: {time.perf_counter()-t0:.2f}s", flush=True)
