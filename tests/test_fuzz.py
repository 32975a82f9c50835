"""Fuzzing: malformed/mutated inputs must fail cleanly, never crash or
hang, and host/device/native engines must agree.

≙ the reference's deterministic LCG fuzzer (test/test_fuzz.c:136-312):
semi-valid DEFLATE streams with mutation strategies, asserting sane
return codes.  Extended with cross-engine agreement: for every fuzz case
the oracle, the C++ engine and the device decoder must produce the same
(result-class, output) pair.
"""

import random
import zlib

import pytest

from defl_tpu.core.oracle import inflate_oracle
from defl_tpu.errors import FLAG_ZLIB, Result
from tests.gendata import make_corpus

CORPUS = make_corpus()
CAP = 1024


def _gen_cases(seed, n):
    rng = random.Random(seed)
    base_payloads = [CORPUS["text"][:400], CORPUS["rand_255"],
                     CORPUS["period_3"][:300], b"", b"a"]
    cases = []
    for i in range(n):
        kind = rng.randrange(5)
        if kind == 0:           # valid zlib
            data = zlib.compress(rng.choice(base_payloads), rng.randrange(10))
        elif kind == 1:         # truncated valid
            d = zlib.compress(rng.choice(base_payloads), 6)
            data = d[: rng.randrange(1, max(2, len(d)))]
        elif kind == 2:         # bit flips in valid stream
            d = bytearray(zlib.compress(rng.choice(base_payloads), 6))
            for _ in range(rng.randrange(1, 5)):
                if d:
                    p = rng.randrange(len(d))
                    d[p] ^= 1 << rng.randrange(8)
            data = bytes(d)
        elif kind == 3:         # random garbage
            data = rng.randbytes(rng.randrange(1, 200))
        else:                   # valid header + garbage body
            data = b"\x78\x9c" + rng.randbytes(rng.randrange(1, 150))
        cases.append(data)
    return cases


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_oracle_fuzz_no_crash(seed):
    for data in _gen_cases(seed, 60):
        res, out = inflate_oracle(data, FLAG_ZLIB, CAP)
        assert res in (Result.OK, Result.ERR, Result.UNFINISHED, Result.EFULL)
        assert len(out) <= CAP


def test_cross_engine_agreement():
    """Oracle vs C++ engine vs device decoder on fuzz cases."""
    from defl_tpu.runtime.native import available, native_inflate
    from defl_tpu.runtime.session import device_inflate

    cases = _gen_cases(7, 48)
    oracle_res = [inflate_oracle(d, FLAG_ZLIB, CAP) for d in cases]

    dev_res, dev_out, _ = device_inflate(cases, dst_capacities=CAP)
    for i, (data, (orr, oro)) in enumerate(zip(cases, oracle_res)):
        # identical result code and identical decoded prefix
        assert dev_res[i] is orr, (i, data.hex()[:40], dev_res[i], orr)
        if orr is Result.OK:
            assert dev_out[i] == oro, i

    if available():
        for i, (data, (orr, oro)) in enumerate(zip(cases, oracle_res)):
            nr, no = native_inflate(data, CAP, 1)
            assert nr is orr, (i, data.hex()[:40], nr, orr)
            if orr is Result.OK:
                assert no == oro, i


def test_fuzz_raw_mode_device():
    from defl_tpu.runtime.session import device_inflate

    rng = random.Random(11)
    cases = [rng.randbytes(rng.randrange(1, 120)) for _ in range(24)]
    res, outs, _ = device_inflate(cases, flags=0, dst_capacities=CAP)
    for r, o in zip(res, outs):
        assert int(r) in (0, -1, 2, -105)
        assert len(o) <= CAP
