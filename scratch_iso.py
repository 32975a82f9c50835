import os, time, zlib
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
print("jax ready", jax.devices(), flush=True)
import numpy as np, jax.numpy as jnp
from defl_tpu.runtime.pack import pack_streams
from defl_tpu.ops.inflate_batch import decode_tokens
streams = [zlib.compress(b"abc" * 100, 6)]
packed = pack_streams(streams, 1, [400])
t0 = time.time()
tok, st = decode_tokens(jnp.asarray(packed.words), jnp.asarray(packed.nbits),
                        jnp.asarray(packed.zflag), jnp.asarray(packed.dst_cap),
                        T=512, K=32)
print("xla compile+run", time.time() - t0, flush=True)
print("status", np.asarray(st["status"]), np.asarray(st["dst_pos"]), flush=True)
