"""Pallas TPU kernel: batched adler32.

First Pallas kernel in the tree — checksum reduction is the natural entry
point (pure reductions vectorise well in Mosaic, unlike the data-dependent
selects of the decode loop; see NOTES.md).  Functionally identical to
``ops.checksums.adler32_batch``; kept interpretable so it also runs on the
CPU backend in tests.

Per slab of 3072 bytes (the int32-safe NMAX-style bound):
  A' = A + sum(d);  B' = B + m*A + sum((m - j) * d_j)   (mod 65521)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ADLER_MOD = 65521
_SLAB = 3072


def _kernel(data_ref, len_ref, out_ref):
    N, C = data_ref.shape
    n_slabs = (C + _SLAB - 1) // _SLAB

    lengths = len_ref[:]                       # [N] int32

    def slab(s, carry):
        a, b = carry
        seg = data_ref[:, pl.ds(s * _SLAB, _SLAB)].astype(jnp.int32)
        j = jax.lax.broadcasted_iota(jnp.int32, (N, _SLAB), 1)
        gpos = s * _SLAB + j
        valid = gpos < lengths[:, None]
        seg = jnp.where(valid, seg, 0)
        m = jnp.sum(valid.astype(jnp.int32), axis=1)
        w = jnp.where(valid, m[:, None] - j, 0)
        b = (b + a * m + jnp.sum(seg * w, axis=1)) % ADLER_MOD
        a = (a + jnp.sum(seg, axis=1)) % ADLER_MOD
        return a, b

    a = jnp.ones((N,), jnp.int32)
    b = jnp.zeros((N,), jnp.int32)
    a, b = jax.lax.fori_loop(0, n_slabs, slab, (a, b))
    out_ref[:] = (b.astype(jnp.uint32) << jnp.uint32(16)) | a.astype(
        jnp.uint32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def adler32_batch_pallas(data, lengths, interpret: bool = False):
    """data: uint8 [N, C] (C multiple of 3072 recommended); lengths: [N].
    Returns uint32 [N]."""
    N, C = data.shape
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((N,), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(data, lengths.astype(jnp.int32))
