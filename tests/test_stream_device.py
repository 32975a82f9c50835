"""Device streaming session: carry-resume across incremental feeds.

≙ the reference's infl_stream tests (test_file_streaming,
test/test_files.c:688-790) run against the device decoder's carry pytree.
"""

import zlib

import pytest

from defl_tpu.errors import Result
from defl_tpu.runtime.stream_device import DeviceInflateSession
from tests.gendata import make_corpus

CORPUS = make_corpus()


def test_incremental_feeds_resume():
    payloads = [CORPUS["text"][:700], CORPUS["period_7"][:600],
                CORPUS["rand_255"], CORPUS["json"][:500]]
    streams = [zlib.compress(p, 6) for p in payloads]
    sess = DeviceInflateSession(4, 1024)

    feed = 48
    pos = [0] * 4
    done = False
    rounds = 0
    while not done and rounds < 60:
        chunk = []
        for i, s in enumerate(streams):
            chunk.append(s[pos[i] : pos[i] + feed])
            pos[i] += feed
        res = sess.feed(chunk)
        done = all(r is not Result.UNFINISHED for r in res)
        rounds += 1

    res, outs = sess.outputs()
    assert all(r is Result.OK for r in res), res
    assert outs == payloads
    assert rounds > 1  # genuinely incremental


def test_single_byte_feeds():
    p = CORPUS["rand_64"]
    s = zlib.compress(p, 6)
    sess = DeviceInflateSession(2, 256)
    for i in range(len(s)):
        res = sess.feed([s[i : i + 1], s[i : i + 1]])
    assert all(r is Result.OK for r in res)
    _, outs = sess.outputs()
    assert outs == [p, p]


def test_efull_resize_resume_device():
    p = b"w" * 800
    s = zlib.compress(p, 6)
    sess = DeviceInflateSession(1, 100)
    res = sess.feed([s])
    assert res[0] is Result.EFULL
    sess.resize_output(1024)
    res = sess.feed([b""])
    assert res[0] is Result.OK
    _, outs = sess.outputs()
    assert outs[0] == p
