import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if False:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
t0 = time.perf_counter()
stamp = lambda m: print(f"{time.perf_counter()-t0:7.1f}s  {m}", flush=True)
from tests.test_regressions import _incomplete_code_truncated
from defl_tpu.ops.inflate_batch import decode_tokens, step_budget
from defl_tpu.ops.resolve import resolve_tokens
from defl_tpu.runtime.pack import pack_streams
stamp("imports")
packed = pack_streams([_incomplete_code_truncated()], 0, [64])
words = np.zeros((32, 256), np.uint32); words[:1, :packed.words.shape[1]] = packed.words
nbits = np.zeros(32, np.int32); nbits[0] = packed.nbits[0]
zf = np.zeros(32, np.int32); cap = np.zeros(32, np.int32); cap[0] = 64
T = step_budget(1024)
toks, st = decode_tokens(jnp.asarray(words), jnp.asarray(nbits),
                         jnp.asarray(zf), jnp.asarray(cap), T=T, K=128)
s = np.asarray(st["status"])
stamp(f"decode 1: status={s[0]}")
toks, st = decode_tokens(jnp.asarray(words), jnp.asarray(nbits),
                         jnp.asarray(zf), jnp.asarray(cap), T=T, K=128)
np.asarray(st["status"])
stamp("decode 2")
out = resolve_tokens(toks, jnp.asarray(words), st["dst_pos"], C=1024)
np.asarray(out[0, :2])
stamp("resolve 1")
out = resolve_tokens(toks, jnp.asarray(words), st["dst_pos"], C=1024)
np.asarray(out[0, :2])
stamp("resolve 2")
print("tok_rows:", int(st["tok_rows"]), "n_chunks_max:", (max(128, T//2)+127)//128, flush=True)
print("statuses:", np.unique(np.asarray(st["status"]), return_counts=True), flush=True)
