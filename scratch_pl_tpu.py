"""TPU smoke: decode_tokens_pl (Mosaic) vs oracle on small batch."""
import time, zlib
import numpy as np
import jax
print("devices:", jax.devices(), flush=True)
import jax.numpy as jnp
from defl_tpu.runtime.pack import pack_streams
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
packed = pack_streams(streams, 1, caps)
T, K = 2048, 32
words = jnp.asarray(packed.words)
t0 = time.time()
tok_p, st_p = decode_tokens_pl(words, jnp.asarray(packed.nbits),
                               jnp.asarray(packed.zflag),
                               jnp.asarray(packed.dst_cap), T=T, K=K)
st_p = jax.tree.map(np.asarray, st_p)
print("pl compile+run", time.time() - t0, flush=True)
print("status ", st_p["status"], flush=True)
print("dst_pos", st_p["dst_pos"], flush=True)
out_p = np.asarray(resolve_tokens(tok_p, words,
                                  jnp.asarray(st_p["dst_pos"]), C=C))
ok = True
for i, p in enumerate(payloads):
    gp = out_p[i, : st_p["dst_pos"][i]].tobytes()
    print(i, "pl==ref", gp == p, flush=True)
    ok &= gp == p and st_p["status"][i] == 0
print("TPU SMOKE", "PASS" if ok else "FAIL", flush=True)
