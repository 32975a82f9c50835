import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax; jax.config.update("jax_platforms", "cpu")
t0 = time.perf_counter()
stamp = lambda m: print(f"{time.perf_counter()-t0:7.1f}s  {m}", flush=True)
stamp("jax imported")
from tests.test_regressions import _incomplete_code_truncated
from defl_tpu.runtime.session import device_inflate
stamp("imports done")
res, _, _ = device_inflate([_incomplete_code_truncated()], flags=0,
                           dst_capacities=64)
stamp(f"device_inflate done: {res[0]}")
res, _, _ = device_inflate([_incomplete_code_truncated()], flags=0,
                           dst_capacities=64)
stamp("second call done")
