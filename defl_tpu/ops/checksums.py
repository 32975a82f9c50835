"""Batched checksums on device.

New capability relative to the reference (which contains no checksum code
at all — SURVEY §2.1).  adler32 vectorises cleanly: for a block of n
bytes, A advances by sum(d) and B by n*A0 + sum((n-i)*d_i), so a batch of
lanes reduces with two weighted sums per 4KB slab with deferred modulo
(the classic NMAX bound).  Used by the device inflate path to verify zlib
trailers (FLAG_VERIFY_ADLER32) without shipping outputs to the host.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

ADLER_MOD = 65521
_SLAB = 3072  # 255*3072*3073/2 + carry terms stay inside int32


@functools.partial(jax.jit, static_argnames=())
def adler32_batch(data, lengths):
    """data: uint8 [N, C]; lengths: int32 [N] valid bytes per lane.
    Returns uint32 [N] adler32 checksums."""
    N, Cw = data.shape
    n_slabs = (Cw + _SLAB - 1) // _SLAB
    pad = n_slabs * _SLAB - Cw
    d = jnp.pad(data, ((0, 0), (0, pad))).astype(jnp.int32)

    pos = jnp.arange(n_slabs * _SLAB, dtype=jnp.int32)[None, :]
    valid = pos < lengths[:, None]
    d = jnp.where(valid, d, 0)

    def slab(carry, s):
        a, b = carry
        seg = jax.lax.dynamic_slice_in_dim(d, s * _SLAB, _SLAB, axis=1)
        seg_pos = jax.lax.dynamic_slice_in_dim(pos, s * _SLAB, _SLAB, axis=1)
        seg_valid = seg_pos < lengths[:, None]
        # bytes after a lane's end contribute nothing: they're zero AND
        # their weight is masked
        n_seg = jnp.sum(seg_valid.astype(jnp.int32), axis=1)
        # weight for byte at local index j (only valid ones): n_seg - j
        j = jnp.arange(_SLAB, dtype=jnp.int32)[None, :]
        w = jnp.where(seg_valid, n_seg[:, None] - j, 0)
        b = (b + a * n_seg + jnp.sum(seg * w, axis=1)) % ADLER_MOD
        a = (a + jnp.sum(seg, axis=1)) % ADLER_MOD
        return (a, b), None

    a0 = jnp.ones((N,), jnp.int32)
    b0 = jnp.zeros((N,), jnp.int32)
    (a, b), _ = jax.lax.scan(slab, (a0, b0), jnp.arange(n_slabs))
    return (b.astype(jnp.uint32) << jnp.uint32(16)) | a.astype(jnp.uint32)
