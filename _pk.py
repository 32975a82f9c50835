import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, L = 8, 128          # lanes as [R, 128]
N = R * L
WIN = 128
BANK = 344
K = 128

def kernel(win_ref, bank_ref, bitpos_ref, acc_ref):
    def step(i, carry):
        bitpos, acc = carry
        loc = (bitpos >> 5) & (WIN - 1)
        # window extraction: one-hot select-reduce over WIN for 2 words
        wi = jax.lax.broadcasted_iota(jnp.int32, (R, L, WIN), 2)
        win = win_ref[:].astype(jnp.int32)        # reduce as i32 (single term)
        w0 = jnp.sum(jnp.where(wi == loc[:, :, None], win, 0), axis=2).astype(jnp.uint32)
        w1 = jnp.sum(jnp.where(wi == (loc + 1)[:, :, None], win, 0), axis=2).astype(jnp.uint32)
        b = (bitpos & 31).astype(jnp.uint32)
        peek = jnp.where(b == 0, w0, (w0 >> b) | (w1 << ((jnp.uint32(32) - b) & jnp.uint32(31))))
        # fake canonical decode: 15 rounds of compare/select
        found = jnp.zeros((R, L), bool)
        symidx = jnp.zeros((R, L), jnp.int32)
        for l in range(1, 16):
            cand = (peek & jnp.uint32((1 << l) - 1)).astype(jnp.int32)
            hit = (~found) & (cand < 3 * l)
            symidx = jnp.where(hit, cand + l, symidx)
            found |= hit
        # one-hot bank lookup
        bi = jax.lax.broadcasted_iota(jnp.int32, (R, L, BANK), 2)
        sym = jnp.sum(jnp.where(bi == jnp.clip(symidx, 0, BANK-1)[:, :, None], bank_ref[:], 0), axis=2)
        bitpos = bitpos + (sym & 7) + 1
        acc = acc + sym
        return bitpos, acc
    bitpos = jnp.zeros((R, L), jnp.int32)
    acc = jnp.zeros((R, L), jnp.int32)
    bitpos, acc = jax.lax.fori_loop(0, K, step, (bitpos, acc))
    acc_ref[:] = acc

win = jnp.asarray(np.random.randint(0, 2**31, (R, L, WIN)).astype(np.uint32))
bank = jnp.asarray(np.random.randint(0, 288, (R, L, BANK)).astype(np.int32))
bp = jnp.zeros((R, L), jnp.int32)
try:
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    r = f(win, bank, bp)
    r.block_until_ready()
    print("COMPILED+RAN", np.asarray(r)[0, :3], flush=True)
    t = time.time()
    for _ in range(10):
        r = f(win, bank, bp)
    _ = np.asarray(r)
    per_step = (time.time() - t) / 10 / K
    print(f"per-step: {per_step*1e6:.2f} us (N={N})", flush=True)
except Exception as e:
    print("FAILED:", str(e)[:800], flush=True)
