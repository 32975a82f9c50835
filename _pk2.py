import time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 8, 128
N = R * L
WIN = 128
BANK = 344
K = 128

# layout: lane n=(r,l); window [R, WIN, L] -> reduce over axis=1 (sublanes)
def kernel(win_ref, bank_ref, bitpos_ref, acc_ref):
    def step(i, carry):
        bitpos, acc = carry           # [R, L] i32
        loc = (bitpos >> 5) & (WIN - 1)
        wi = jax.lax.broadcasted_iota(jnp.int32, (R, WIN, L), 1)
        win = win_ref[:].astype(jnp.int32)
        w0 = jnp.sum(jnp.where(wi == loc[:, None, :], win, 0), axis=1).astype(jnp.uint32)
        w1 = jnp.sum(jnp.where(wi == (loc + 1)[:, None, :], win, 0), axis=1).astype(jnp.uint32)
        b = (bitpos & 31).astype(jnp.uint32)
        peek = jnp.where(b == 0, w0, (w0 >> b) | (w1 << ((jnp.uint32(32) - b) & jnp.uint32(31))))
        found = jnp.zeros((R, L), bool)
        symidx = jnp.zeros((R, L), jnp.int32)
        for l in range(1, 16):
            cand = (peek & jnp.uint32((1 << l) - 1)).astype(jnp.int32)
            hit = (~found) & (cand < 3 * l)
            symidx = jnp.where(hit, cand + l, symidx)
            found |= hit
        bi = jax.lax.broadcasted_iota(jnp.int32, (R, BANK, L), 1)
        sym = jnp.sum(jnp.where(bi == jnp.clip(symidx, 0, BANK-1)[:, None, :], bank_ref[:], 0), axis=1)
        return bitpos + (sym & 7) + 1, acc + sym
    bitpos = jnp.zeros((R, L), jnp.int32)
    acc = jnp.zeros((R, L), jnp.int32)
    bitpos, acc = jax.lax.fori_loop(0, K, step, (bitpos, acc))
    acc_ref[:] = acc

win = jnp.asarray(np.random.randint(0, 2**31, (R, WIN, L)).astype(np.uint32))
bank = jnp.asarray(np.random.randint(0, 288, (R, BANK, L)).astype(np.int32))
bp = jnp.zeros((R, L), jnp.int32)
f = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)
r = f(win, bank, bp); r.block_until_ready()
t = time.time()
for _ in range(10):
    r = f(win, bank, bp)
_ = np.asarray(r)
print(f"per-step: {(time.time()-t)/10/K*1e6:.2f} us (N={N})", flush=True)
