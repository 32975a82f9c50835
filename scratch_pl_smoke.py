"""Smoke: decode_tokens_pl (interpret, CPU) vs decode_tokens (XLA)."""
import os, time, zlib
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from defl_tpu.runtime.pack import pack_streams
from defl_tpu.ops.inflate_batch import decode_tokens, step_budget
from defl_tpu.ops.pallas.decode_pl import decode_tokens_pl
from defl_tpu.ops.resolve import resolve_tokens

payloads = [
    b"hello hello hello world" * 20,
    bytes(range(256)) * 8,
    b"\0" * 3000,
    np.random.default_rng(0).integers(0, 256, 500, dtype=np.uint8).tobytes(),
]
streams = [zlib.compress(p, 6) for p in payloads]
caps = [len(p) for p in payloads]
C = 4096
import sys
packed = pack_streams(streams, 1, caps)
T = 2048
K = 32

words = jnp.asarray(packed.words)
nbits = jnp.asarray(packed.nbits)
zflag = jnp.asarray(packed.zflag)
cap = jnp.asarray(packed.dst_cap)

t0 = time.time()
tok_x, st_x = decode_tokens(words, nbits, zflag, cap, T=T, K=K)
tok_x, st_x = jax.tree.map(np.asarray, (tok_x, st_x))
print("xla done", time.time() - t0, flush=True)

t0 = time.time()
tok_p, st_p = decode_tokens_pl(words, nbits, zflag, cap, T=T, K=K,
                               interpret=True)
tok_p, st_p = jax.tree.map(np.asarray, (tok_p, st_p))
print("pl done", time.time() - t0, flush=True)

print("status  x:", st_x["status"], " p:", st_p["status"], flush=True)
print("dst_pos x:", st_x["dst_pos"], " p:", st_p["dst_pos"], flush=True)
print("bitpos  x:", st_x["bitpos"], " p:", st_p["bitpos"], flush=True)

# token buffers differ in slot timing; compare resolved output instead
out_x = np.asarray(resolve_tokens(jnp.asarray(tok_x), words,
                                  jnp.asarray(st_x["dst_pos"]), C=C))
out_p = np.asarray(resolve_tokens(jnp.asarray(tok_p), words,
                                  jnp.asarray(st_p["dst_pos"]), C=C))
ok = True
for i, p in enumerate(payloads):
    gx = out_x[i, : st_x["dst_pos"][i]].tobytes()
    gp = out_p[i, : st_p["dst_pos"][i]].tobytes()
    print(i, "xla==ref", gx == p, " pl==ref", gp == p, flush=True)
    ok &= gp == p and st_p["status"][i] == st_x["status"][i]
print("SMOKE", "PASS" if ok else "FAIL", flush=True)
