import os, sys, time, zlib
import numpy as np
sys.path.insert(0, "/root/repo")
from defl_tpu import bench as B
from defl_tpu.runtime.large import inflate_large
from defl_tpu.errors import Result

mb = int(os.environ.get("MB", "8"))
raw = b"".join(B.make_silesia_like(mb << 20, 65536))
comp = zlib.compress(raw, 6)
print(f"raw {len(raw)/1e6:.0f}MB comp {len(comp)/1e6:.1f}MB", flush=True)
t0 = time.perf_counter()
r, out = inflate_large(comp)
print(f"first: {time.perf_counter()-t0:.1f}s r={r}", flush=True)
print("bytes ok:", out == raw, len(out), len(raw), flush=True)
for rep in range(2):
    t0 = time.perf_counter()
    r, out = inflate_large(comp)
    dt = time.perf_counter() - t0
    print(f"rep {rep}: {dt:.2f}s -> {len(raw)/dt/1e9:.3f} GB/s", flush=True)
assert out == raw
