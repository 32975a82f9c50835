"""Corpus-wide API-layer parity: every corpus payload through
`api.InflateStream` across the same path matrix the reference drives
(`/root/reference/test/test_files.c`):

  - contiguous one-shot (test_file, :174-257)
  - chunked include at 1/2/4/8-byte chunks (test_file_chunked, :259-331)
  - streaming at 64..1024-byte feeds with empty-feed drains
    (test_file_streaming, :688-790)
  - bytewise streaming on a representative payload
    (test_file_streaming_bytewise, :792-869)

plus lifecycle negatives (NOOP / EBADF-after-destroy / reset-reuse /
input_pos & output_pos accounting, :871-1029).  Round-1 coverage drove
the engine layer; these drive the public stream object itself.
"""

import zlib

import pytest

from defl_tpu.api import InflateStream
from defl_tpu.errors import FLAG_ZLIB, Result
from tests.gendata import make_corpus

CORPUS = make_corpus()
NAMES = sorted(CORPUS)


def _cap(payload: bytes) -> int:
    return max(len(payload), 1)


@pytest.mark.parametrize("name", NAMES)
def test_contiguous_one_shot(name):
    payload = CORPUS[name]
    st = InflateStream(_cap(payload))
    assert st.include(zlib.compress(payload, 6)) is Result.OK
    assert st.run() is Result.OK
    assert st.output == payload
    assert st.output_pos == len(payload)


@pytest.mark.parametrize("chunk", [1, 2, 4, 8])
@pytest.mark.parametrize("name", NAMES)
def test_chunked_include(name, chunk):
    payload = CORPUS[name]
    comp = zlib.compress(payload, 6)
    st = InflateStream(_cap(payload))
    for i in range(0, len(comp), chunk):
        assert st.include(comp[i : i + chunk]) is Result.OK
    assert st.run() is Result.OK
    assert st.output == payload


@pytest.mark.parametrize("feed", [64, 256, 1024])
@pytest.mark.parametrize("name", NAMES)
def test_streaming_feeds(name, feed):
    payload = CORPUS[name]
    comp = zlib.compress(payload, 6)
    st = InflateStream(_cap(payload))
    r = Result.UNFINISHED
    for i in range(0, len(comp), feed):
        r = st.stream(comp[i : i + feed])
        assert r in (Result.OK, Result.UNFINISHED), (name, i, r)
    assert r is Result.OK, name
    # trailing empty-feed drains are no-ops after completion
    assert st.stream(b"") in (Result.OK, Result.NOOP)
    assert st.output == payload


def test_streaming_bytewise():
    payload = CORPUS["png_simulation"]
    payload = payload[:3000]
    comp = zlib.compress(payload, 6)
    st = InflateStream(len(payload) or 1)
    r = Result.UNFINISHED
    for i in range(len(comp)):
        r = st.stream(comp[i : i + 1])
    assert r is Result.OK
    assert st.output == payload


def test_lifecycle_noop_ebadf_reset_positions():
    payload = CORPUS["text"][:500]
    comp = zlib.compress(payload, 6)

    st = InflateStream(len(payload))
    assert st.stream(b"") is Result.NOOP           # ≙ stream.c:505-507
    assert st.stream(comp) is Result.OK
    assert st.output == payload
    assert st.output_pos == len(payload)
    # trailer is never consumed (decode stops at the final EOB)
    assert st.input_pos == len(comp) - 4

    # reset-reuse with a different payload
    other = CORPUS["json"][:400]
    st.reset(len(other))
    assert st.stream(zlib.compress(other, 6)) is Result.OK
    assert st.output == other

    st.destroy()
    assert st.stream(b"x") is Result.EBADF
    assert st.include(b"x") is Result.EBADF
    assert st.run() is Result.EBADF
    assert st.output_pos == 0 and st.input_pos == 0


def test_raw_deflate_paths():
    payload = CORPUS["period_13"]
    comp = zlib.compress(payload, 6, -15)          # raw DEFLATE, no header
    st = InflateStream(len(payload), flags=0)
    for i in range(0, len(comp), 4):
        st.include(comp[i : i + 4])
    assert st.run() is Result.OK
    assert st.output == payload
