"""Golden-corpus generator.

Follows the reference's test-data strategy (SURVEY §4; the reference
generates its corpus with CPython zlib at level 6 plus hand-built
stored-block and edge-case bitstreams, test/data/gendata.py) but is
generated fresh in memory per test session: a dict of name -> raw bytes,
compressed on demand with CPython zlib (the independent oracle).

Also provides a bit-writer used to hand-craft edge-case DEFLATE streams
(empty static block, lone literal, max stored block, minimal dynamic
block, ...) — these cannot be produced by zlib and exercise decoder
corners directly.
"""

from __future__ import annotations

import json
import random
import zlib


class BitWriter:
    """LSB-first bit packer for hand-crafting DEFLATE streams."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value: int, nbits: int):
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8
        return self

    def code(self, value: int, nbits: int):
        """Huffman code: MSB of the code goes first in the bit order."""
        for i in range(nbits - 1, -1, -1):
            self.bits((value >> i) & 1, 1)
        return self

    def align(self):
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return self

    def raw(self, data: bytes):
        assert self.n == 0
        self.buf += data
        return self

    def getvalue(self) -> bytes:
        out = bytearray(self.buf)
        if self.n:
            out.append(self.acc & 0xFF)
        return bytes(out)


def _fixed_lit_code(sym: int) -> tuple[int, int]:
    """Fixed-Huffman litlen code for a symbol (RFC 1951 §3.2.6)."""
    if sym <= 143:
        return 0x30 + sym, 8
    if sym <= 255:
        return 0x190 + sym - 144, 9
    if sym <= 279:
        return sym - 256, 7
    return 0xC0 + sym - 280, 8


def edge_streams() -> dict[str, tuple[bytes, bytes]]:
    """Hand-crafted raw-DEFLATE streams: name -> (compressed, expected_raw)."""
    cases: dict[str, tuple[bytes, bytes]] = {}

    # Final static block containing only EOB.
    w = BitWriter().bits(1, 1).bits(1, 2)
    w.code(*_fixed_lit_code(256))
    cases["edge_empty_static"] = (w.getvalue(), b"")

    # Single literal 'A' in a static block.
    w = BitWriter().bits(1, 1).bits(1, 2)
    w.code(*_fixed_lit_code(ord("A")))
    w.code(*_fixed_lit_code(256))
    cases["edge_single_literal"] = (w.getvalue(), b"A")

    # Static block with an RLE match: 'a' then (len=10, dist=1).
    w = BitWriter().bits(1, 1).bits(1, 2)
    w.code(*_fixed_lit_code(ord("a")))
    w.code(*_fixed_lit_code(264))           # length 10, no extra bits
    w.code(0, 5)                            # dist sym 0 -> distance 1
    w.code(*_fixed_lit_code(256))
    cases["edge_rle_static"] = (w.getvalue(), b"a" * 11)

    # Maximum-size stored block.
    payload = bytes((i * 7 + 13) & 0xFF for i in range(65535))
    w = BitWriter().bits(1, 1).bits(0, 2).align()
    w.raw((65535).to_bytes(2, "little") + (0).to_bytes(2, "little") + payload)
    cases["edge_stored_max"] = (w.getvalue(), payload)

    # Zero-length stored block then final empty static block.
    w = BitWriter().bits(0, 1).bits(0, 2).align()
    w.raw((0).to_bytes(2, "little") + (0xFFFF).to_bytes(2, "little"))
    w.bits(1, 1).bits(1, 2)
    w.code(*_fixed_lit_code(256))
    cases["edge_stored_empty_then_static"] = (w.getvalue(), b"")

    # Several empty non-final static blocks before the final one.
    w = BitWriter()
    for i in range(4):
        w.bits(1 if i == 3 else 0, 1).bits(1, 2)
        w.code(*_fixed_lit_code(256))
    cases["edge_multi_empty_blocks"] = (w.getvalue(), b"")

    # Minimal dynamic block: codelen code {1:len1, 0:len1}? Build the
    # smallest legal dynamic header: litlen codes for 'X'(1 bit) and
    # EOB(1 bit), one distance code (unused).
    w = BitWriter().bits(1, 1).bits(2, 2)
    # HLIT=257 (so lens cover 0..256), HDIST=1, HCLEN chosen to cover the
    # codelen symbols we use: {0, 1, 18}.
    w.bits(0, 5)        # HLIT  = 257
    w.bits(0, 5)        # HDIST = 1
    # codelen order: 16 17 18 0 8 7 9 6 10 5 11 4 12 3 13 2 14 1 15
    # we need entries up to index of '1' (17th) -> HCLEN = 18 -> bits 14
    w.bits(18 - 4, 4)
    cl = {16: 0, 17: 0, 18: 2, 0: 2, 8: 0, 7: 0, 9: 0, 6: 0, 10: 0,
          5: 0, 11: 0, 4: 0, 12: 0, 3: 0, 13: 0, 2: 0, 14: 0, 1: 2}
    order = (16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1)
    for s in order:
        w.bits(cl[s], 3)
    # codelen alphabet codes (canonical, all len 2): 0->00, 1->01, 18->10
    C0, C1, C18 = 0b00, 0b01, 0b10
    # litlen lengths: sym 'X'=88 gets 1, EOB 256 gets 1, everything else 0.
    # 88 zeros: 18(extra 77)  [11+77=88]
    w.code(C18, 2).bits(88 - 11, 7)
    w.code(C1, 2)                       # sym 88 -> len 1
    # zeros for 89..255 (167 zeros): 18(138) + 18(29->extra 18)
    w.code(C18, 2).bits(138 - 11, 7)
    w.code(C18, 2).bits(29 - 11, 7)
    w.code(C1, 2)                       # sym 256 -> len 1
    # distance lengths: 1 entry, len 1  (assigns code 0 to dist sym 0)
    w.code(C1, 2)
    # data: 'X' = code 0 (len 1), EOB = code 1 (len 1)
    w.bits(0, 1)
    w.code(1, 1)
    cases["edge_min_dynamic"] = (w.getvalue(), b"X")

    return cases


def make_corpus(seed: int = 1234, big: bool = False) -> dict[str, bytes]:
    """Raw test payloads: name -> bytes (compressed on demand by tests)."""
    rng = random.Random(seed)
    c: dict[str, bytes] = {}

    c["empty"] = b""
    for n in (1, 2, 3, 7, 64, 255, 256, 4095, 65535):
        c[f"rand_{n}"] = rng.randbytes(n)
    c["rand_100k"] = rng.randbytes(100_000) if big else rng.randbytes(20_000)

    c["zeros_65536"] = bytes(65536 if big else 16384)
    c["ones_4096"] = b"\xff" * 4096

    # periodic patterns hit a spread of back-reference distances
    for period in (1, 2, 3, 4, 7, 8, 13, 32, 64, 258, 300, 1024, 4096):
        unit = bytes(rng.randrange(256) for _ in range(period))
        reps = max(2, 9000 // period)
        c[f"period_{period}"] = unit * reps

    # long-distance matches: a block, noise, then the block again
    blk = rng.randbytes(600)
    c["far_match_32k"] = blk + rng.randbytes(31_000) + blk
    c["far_match_4k"] = blk + rng.randbytes(3_000) + blk

    words = ("the quick brown fox jumps over the lazy dog "
             "pack my box with five dozen liquor jugs ").split()
    c["text"] = (" ".join(rng.choice(words) for _ in range(4000))).encode()
    c["json"] = json.dumps(
        [{"id": i, "name": f"item-{i}", "v": rng.random()} for i in range(500)]
    ).encode()
    c["csv"] = b"\n".join(
        b",".join(str(rng.randrange(1000)).encode() for _ in range(8))
        for _ in range(800)
    )
    c["unicode"] = ("héllo wörld ünïcödé ☃ 🎈 ελληνικά русский 中文 " * 200).encode()

    # PNG-ish: filtered scanlines (filter byte + small-delta pixels)
    scan = bytearray()
    prev = 128
    for _row in range(120):
        scan.append(rng.randrange(5))
        for _px in range(200):
            prev = (prev + rng.randrange(-4, 5)) & 0xFF
            scan.append(prev)
    c["png_simulation"] = bytes(scan)

    return c


def compress_variants(raw: bytes, level: int = 6) -> dict[str, bytes]:
    """Compress a payload with CPython zlib: raw DEFLATE and zlib-wrapped
    (level 6, matching the reference corpus, gendata.py:58-86)."""
    co = zlib.compressobj(level, zlib.DEFLATED, -15)
    rawc = co.compress(raw) + co.flush()
    return {"raw": rawc, "zlib": zlib.compress(raw, level)}
