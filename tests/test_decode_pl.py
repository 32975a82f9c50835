"""Cross-check of the Pallas decode kernel against the host oracle.

The Mosaic kernel (ops/pallas/decode_pl.py) only compiles on real TPU
hardware; CPU interpret-mode tracing of a kernel this size takes tens of
minutes, so these tests run only when a TPU device is present (the
tests/conftest.py CPU override is bypassed by the driver's bench run and
by setting DEFL_TEST_TPU=1).  Coverage at scale comes from bench.py,
which decodes the full mixed corpus through this kernel and byte-compares
every lane.
"""

import os
import zlib

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("DEFL_TEST_TPU") != "1",
    reason="Mosaic kernel needs a real TPU (set DEFL_TEST_TPU=1)")


def _payloads():
    rng = np.random.default_rng(7)
    return [
        b"hello hello hello world" * 40,
        bytes(range(256)) * 16,
        b"\0" * 5000,                       # RLE: overlapping dist=1
        rng.integers(0, 256, 700, dtype=np.uint8).tobytes(),  # incompressible
        b"ab" * 4000,                        # dist=2 chains
        b"x",                                # tiny
    ]


def test_pl_matches_oracle_zlib():
    import jax.numpy as jnp

    from defl_tpu.ops.pallas.decode_pl import decode_tokens_pl
    from defl_tpu.ops.resolve import resolve_tokens
    from defl_tpu.runtime.pack import pack_streams

    payloads = _payloads()
    streams = [zlib.compress(p, 6) for p in payloads]
    caps = [max(len(p), 1) for p in payloads]
    packed = pack_streams(streams, 1, caps)
    C = 8192
    toks, st = decode_tokens_pl(
        jnp.asarray(packed.words), jnp.asarray(packed.nbits),
        jnp.asarray(packed.zflag), jnp.asarray(packed.dst_cap),
        T=4096, K=32)
    st = {k: np.asarray(v) for k, v in st.items()}
    out = np.asarray(resolve_tokens(toks, jnp.asarray(packed.words),
                                    jnp.asarray(st["dst_pos"]), C=C))
    for i, p in enumerate(payloads):
        assert st["status"][i] == 0, (i, st["status"][i])
        assert out[i, : st["dst_pos"][i]].tobytes() == p, i


def test_pl_stored_and_raw_blocks():
    import jax.numpy as jnp

    from defl_tpu.ops.pallas.decode_pl import decode_tokens_pl
    from defl_tpu.ops.resolve import resolve_tokens
    from defl_tpu.runtime.pack import pack_streams

    payloads = [b"stored block payload " * 30, b"\xff" * 2000]
    # stored blocks via level-0 zlib, plus a raw-deflate stream
    streams = [zlib.compress(payloads[0], 0),
               zlib.compress(payloads[1], 6, -15)]
    packed = pack_streams(streams, [1, 0], [4096, 4096])
    toks, st = decode_tokens_pl(
        jnp.asarray(packed.words), jnp.asarray(packed.nbits),
        jnp.asarray(packed.zflag), jnp.asarray(packed.dst_cap),
        T=4096, K=32)
    st = {k: np.asarray(v) for k, v in st.items()}
    out = np.asarray(resolve_tokens(toks, jnp.asarray(packed.words),
                                    jnp.asarray(st["dst_pos"]), C=4096))
    for i, p in enumerate(payloads):
        assert st["status"][i] == 0, (i, st["status"][i])
        assert out[i, : st["dst_pos"][i]].tobytes() == p, i


def test_pl_error_containment():
    import jax.numpy as jnp

    from defl_tpu.errors import Result
    from defl_tpu.ops.pallas.decode_pl import decode_tokens_pl
    from defl_tpu.ops.resolve import resolve_tokens
    from defl_tpu.runtime.pack import pack_streams

    good = b"fine payload " * 50
    streams = [zlib.compress(good, 6),
               b"\x78\x9c" + b"\x07\xff\xff\xff",   # BTYPE=3
               zlib.compress(good, 6)[:-8]]          # truncated
    packed = pack_streams(streams, 1, [2048, 2048, 2048])
    toks, st = decode_tokens_pl(
        jnp.asarray(packed.words), jnp.asarray(packed.nbits),
        jnp.asarray(packed.zflag), jnp.asarray(packed.dst_cap),
        T=4096, K=32)
    st = {k: np.asarray(v) for k, v in st.items()}
    assert st["status"][0] == 0
    assert st["status"][1] == int(Result.ERR)
    assert st["status"][2] == int(Result.UNFINISHED)
    out = np.asarray(resolve_tokens(toks, jnp.asarray(packed.words),
                                    jnp.asarray(st["dst_pos"]), C=2048))
    assert out[0, : st["dst_pos"][0]].tobytes() == good
