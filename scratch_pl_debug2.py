"""Token-level diff: PL vs XLA on the one failing stream."""
import os, sys, time, zlib
import numpy as np
sys.path.insert(0, "/root/repo")
from defl_tpu import bench as B
import jax, jax.numpy as jnp
from defl_tpu.runtime.pack import pack_streams
from defl_tpu.ops.pallas.decode_pl import decode_tokens_pl
from defl_tpu.ops.inflate_batch import decode_tokens, step_budget

block = 65536
payloads = B.make_silesia_like(8192 * block, block)[:8192]
pay = payloads[55]
stream = zlib.compress(pay, 6)
print("payload len", len(pay), "comp", len(stream), flush=True)
packed = pack_streams([stream], 1, block)
w_pad = 1024
while w_pad < packed.words.shape[1]:
    w_pad *= 2
wp = np.zeros((packed.n, w_pad), np.uint32)
wp[:, : packed.words.shape[1]] = packed.words
packed.words = wp
T = step_budget(block)
args = (jnp.asarray(packed.words), jnp.asarray(packed.nbits),
        jnp.asarray(packed.zflag), jnp.asarray(packed.dst_cap))
tp, sp = decode_tokens_pl(*args, T=T, K=128)
tx, sx = decode_tokens(*args, T=T, K=128)
tpn = np.asarray(tp)[:, 0]
txn = np.asarray(tx)[:, 0]
print("pl status", int(np.asarray(sp["status"])[0]), "dst", int(np.asarray(sp["dst_pos"])[0]), flush=True)
print("xla status", int(np.asarray(sx["status"])[0]), "dst", int(np.asarray(sx["dst_pos"])[0]), flush=True)
pl_seq = tpn[tpn != 0]
xla_seq = txn[txn != 0]
print("token counts: pl", len(pl_seq), "xla", len(xla_seq), flush=True)
n = min(len(pl_seq), len(xla_seq))
diff = np.nonzero(pl_seq[:n] != xla_seq[:n])[0]
print("first diffs:", diff[:10], flush=True)
if len(diff):
    d = diff[0]
    for j in range(max(0, d-3), min(n, d+5)):
        a, b = int(pl_seq[j]), int(xla_seq[j])
        def dec(v):
            k = v >> 30
            if k == 0b01: return f"MATCH len={((v>>21)&0x1FF)+3} dist={(v&0x7FFF)+1}"
            if k == 0b00:
                s = f"LIT {v&0xFF}"
                if v & (1<<16): s += f"+{(v>>8)&0xFF}"
                return s
            if k == 0b10: return f"STORED run={((v>>22)&0xFF)+1} off={v&0x3FFFFF}"
            return f"?{v:08x}"
        print(j, ("!" if a!=b else " "), dec(a), "|", dec(b), flush=True)
