"""Lockstep batched DEFLATE token decoder (pass 1 of the device inflate).

TPU-native redesign of the reference's serial decode loops
(`infl_ft_block`, /root/reference/src/infl/infl.c:717-901, and the
streaming machine, stream.c:468-794).  DEFLATE is bit-serial *within* a
stream, so the exploitable parallelism is *across* streams: N independent
streams advance in lockstep, one per vector lane.  Each step every lane:

  1. gathers a 32-bit window at its bit cursor (`bitio.peek32`),
  2. runs a *tableless* canonical-Huffman decode — bit-reverse once, then
     15 rounds of compare/select against per-lane `first_code[len]`
     (pure VPU arithmetic; the only memory access is one small gather into
     the per-lane sorted-symbol bank) — or parses a fixed-width header
     field, depending on its per-lane state machine state,
  3. emits one token (literal / match / stored-run / nop) into the token
     buffer at the uniform step index.

The per-lane state machine mirrors the reference's streaming states
(`infl_stream_state_t`, src/common.h:86-97): ZHDR, DICTID, BHDR,
STORED_HDR/LEN/BODY, CLEN_HDR, CLEN_LENS, LENS, WAIT_BUILD, SYM, DIST,
DONE/ERR/FULL.  Huffman table *builds* (the expensive, rarely-needed
vectorised argsort pass) run between scan chunks, amortised over all lanes
that flagged `need_build` during the chunk.

Pass 2 (`ops.resolve`) turns the token stream into output bytes with
cumsum + pointer-doubling gathers — the two-pass replacement for the
reference's sequential sliding-window copies (infl.c:269-376).

The whole decoder is shape-static and jit-compatible; the same carry
pytree doubles as the resumable streaming state (SURVEY §5 "checkpoint /
resume": the reference's `unz__stream_t` is exactly this carry).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from defl_tpu import constants as C
from defl_tpu.core import huffman
from defl_tpu.errors import Result
from defl_tpu.ops import tables
from defl_tpu.ops.bitio import I32, U32, bitrev16, extract, peek32

# ---- lane states -----------------------------------------------------------
S_ZHDR = 0
S_DICTID = 1
S_BHDR = 2
S_STORED_HDR = 3    # byte-align after BTYPE
S_STORED_LEN = 4    # read LEN/NLEN
S_STORED = 5        # emit stored-run tokens
S_CLEN_HDR = 6      # HLIT/HDIST/HCLEN
S_CLEN_LENS = 7     # 3-bit codelen code lengths
S_LENS = 8          # codelen-coded litlen+dist lengths
S_WAIT = 9          # stalled until the between-chunk table build
S_SYM = 10          # litlen symbol decode
S_DIST = 11         # distance symbol decode
S_DONE = 12
S_ERR = 13
S_FULL = 14

STATUS_RUNNING = 127

# ---- token encoding (u32) --------------------------------------------------
# kind in bits [31:30]: 0 NOP | 1 LIT | 2 MATCH | 3 STORED
# LIT:    byte in [7:0]
# MATCH:  (len-3) in [29:21], (dist-1) in [14:0]
# STORED: (run-1) in [29:22], input byte offset in [21:0]  (=> streams <4MiB)
TOK_NOP = 0
TOK_LIT = 1
TOK_MATCH = 2
TOK_STORED = 3
STORED_MAX_RUN = 256

# ---- constant tables -------------------------------------------------------
# Kept as NumPy arrays on purpose: module-level jax.Arrays embed into MLIR
# via a device fetch at lowering time, which serialises against backend
# init; NumPy constants lower without touching any device.
_LBASE = C.LENGTH_BASE_NP
_LEXTRA = C.LENGTH_EXTRA_NP
_DBASE = C.DIST_BASE_NP
_DEXTRA = C.DIST_EXTRA_NP
_ORD = C.CODELEN_ORDER_NP

_fx_lit = huffman.build_decode(C.FIXED_LITLEN_LENGTHS)
_fx_dist = huffman.build_decode(C.FIXED_DIST_LENGTHS)


def _fixed_syms_padded():
    lit = np.zeros(288, np.int32)
    lit[: _fx_lit.sorted_syms.size] = _fx_lit.sorted_syms
    dst = np.zeros(32, np.int32)
    dst[: _fx_dist.sorted_syms.size] = _fx_dist.sorted_syms
    return lit, dst


_FX_LIT_SYMS, _FX_DIST_SYMS = _fixed_syms_padded()
_FX_LIT_COUNT = _fx_lit.count
_FX_LIT_FIRST = _fx_lit.first_code
_FX_LIT_OFFS = _fx_lit.offset + tables.LIT_BASE
_FX_DIST_COUNT = _fx_dist.count
_FX_DIST_FIRST = _fx_dist.first_code
_FX_DIST_OFFS = _fx_dist.offset + tables.DIST_BASE_


def _init_state(N):
    z16 = jnp.zeros((N, 16), I32)
    return dict(
        state=jnp.zeros((N,), I32),
        bitpos=jnp.zeros((N,), I32),
        final=jnp.zeros((N,), I32),
        hlit=jnp.zeros((N,), I32),
        hdist=jnp.zeros((N,), I32),
        hclen=jnp.zeros((N,), I32),
        idx=jnp.zeros((N,), I32),
        prev=jnp.zeros((N,), I32),
        len_val=jnp.zeros((N,), I32),
        resume_state=jnp.zeros((N,), I32),
        dst_pos=jnp.zeros((N,), I32),
        status=jnp.full((N,), STATUS_RUNNING, I32),
        need_build=jnp.zeros((N,), I32),
        cl_lens=jnp.zeros((N, 19), I32),
        lens=jnp.zeros((N, 320), I32),
        count=jnp.stack([z16, z16, z16], axis=1),   # [N, 3, 16] CL/LIT/DIST
        first=jnp.stack([z16, z16, z16], axis=1),
        offs=jnp.stack([z16, z16, z16], axis=1),
        syms=jnp.zeros((N, tables.SYMS_BANK), I32),
    )


# ---------------------------------------------------------------------------
# between-chunk table builds
# ---------------------------------------------------------------------------

def _apply_builds(st):
    """Convert lanes waiting on a Huffman build; vectorised and masked."""
    nb = st["need_build"]

    def set_table(st, tbl, mask, count, first, offs, syms_region, syms_base):
        m = mask[:, None]
        st["count"] = st["count"].at[:, tbl, :].set(
            jnp.where(m, count, st["count"][:, tbl, :]))
        st["first"] = st["first"].at[:, tbl, :].set(
            jnp.where(m, first, st["first"][:, tbl, :]))
        st["offs"] = st["offs"].at[:, tbl, :].set(
            jnp.where(m, offs, st["offs"][:, tbl, :]))
        w = syms_region.shape[1]
        st["syms"] = st["syms"].at[:, syms_base : syms_base + w].set(
            jnp.where(m, syms_region, st["syms"][:, syms_base : syms_base + w]))
        return st

    def build_cl(st):
        mask = nb == 1
        cnt, first, offs, syms, oversub = tables.build_canonical(st["cl_lens"])
        st = set_table(st, 0, mask, cnt, first, offs + tables.CL_BASE,
                       syms, tables.CL_BASE)
        bad = mask & oversub
        ok = mask & ~oversub
        st["status"] = jnp.where(bad, Result.ERR, st["status"])
        st["state"] = jnp.where(bad, S_ERR,
                                jnp.where(ok, S_LENS, st["state"]))
        st["idx"] = jnp.where(ok, 0, st["idx"])
        st["prev"] = jnp.where(ok, 0, st["prev"])
        st["lens"] = jnp.where(mask[:, None], 0, st["lens"])
        return st

    def build_litdist(st):
        mask = nb == 2
        pos288 = jnp.arange(288, dtype=I32)[None, :]
        lit_lens = jnp.where(pos288 < st["hlit"][:, None],
                             st["lens"][:, :288], 0)
        cnt, first, offs, syms, over_l = tables.build_canonical(lit_lens)
        st = set_table(st, 1, mask, cnt, first, offs + tables.LIT_BASE,
                       syms, tables.LIT_BASE)

        k32 = jnp.arange(32, dtype=I32)[None, :]
        didx = st["hlit"][:, None] + k32
        dist_lens = jnp.where(
            k32 < st["hdist"][:, None],
            jnp.take_along_axis(st["lens"], jnp.clip(didx, 0, 319), axis=1),
            0,
        )
        cntd, firstd, offsd, symsd, over_d = tables.build_canonical(dist_lens)
        st = set_table(st, 2, mask, cntd, firstd, offsd + tables.DIST_BASE_,
                       symsd, tables.DIST_BASE_)

        no_eob = st["lens"][:, 256] == 0  # a block needs a real EOB code
        bad = mask & (over_l | over_d | no_eob)
        ok = mask & ~bad
        st["status"] = jnp.where(bad, Result.ERR, st["status"])
        st["state"] = jnp.where(bad, S_ERR,
                                jnp.where(ok, S_SYM, st["state"]))
        return st

    def build_fixed(st):
        mask = nb == 3
        st = set_table(st, 1, mask,
                       _FX_LIT_COUNT[None, :], _FX_LIT_FIRST[None, :],
                       _FX_LIT_OFFS[None, :], _FX_LIT_SYMS[None, :],
                       tables.LIT_BASE)
        st = set_table(st, 2, mask,
                       _FX_DIST_COUNT[None, :], _FX_DIST_FIRST[None, :],
                       _FX_DIST_OFFS[None, :], _FX_DIST_SYMS[None, :],
                       tables.DIST_BASE_)
        st["state"] = jnp.where(mask, S_SYM, st["state"])
        return st

    def run(st):
        st = jax.lax.cond(jnp.any(nb == 1), build_cl, lambda s: s, st)
        st = jax.lax.cond(jnp.any(nb == 2), build_litdist, lambda s: s, st)
        st = jax.lax.cond(jnp.any(nb == 3), build_fixed, lambda s: s, st)
        st["need_build"] = jnp.zeros_like(nb)
        return st

    return jax.lax.cond(jnp.any(nb > 0), run, lambda s: s, st)


# ---------------------------------------------------------------------------
# one lockstep step
# ---------------------------------------------------------------------------

def _canonical_decode(st, peek):
    """Tableless canonical decode for lanes in S_LENS/S_SYM/S_DIST.

    Returns (sym, clen, found).  The per-length compare/select rounds are
    the vectorised form of the oracle's `_decode_symbol` and replace the
    reference's flat-table gather (infl.c:730-745) with VPU arithmetic.
    """
    s = st["state"]
    is_cl = s == S_LENS
    is_dist = s == S_DIST

    rev = bitrev16(peek & U32(0x7FFF)) >> U32(1)  # 15-bit reversal
    found = jnp.zeros(s.shape, bool)
    symidx = jnp.zeros(s.shape, I32)
    clen = jnp.zeros(s.shape, I32)
    for l in range(1, C.MAX_CODE_LENGTH + 1):
        cand = (rev >> U32(15 - l)).astype(I32)
        first = jnp.where(is_cl, st["first"][:, 0, l],
                          jnp.where(is_dist, st["first"][:, 2, l],
                                    st["first"][:, 1, l]))
        cnt = jnp.where(is_cl, st["count"][:, 0, l],
                        jnp.where(is_dist, st["count"][:, 2, l],
                                  st["count"][:, 1, l]))
        offs = jnp.where(is_cl, st["offs"][:, 0, l],
                         jnp.where(is_dist, st["offs"][:, 2, l],
                                   st["offs"][:, 1, l]))
        off = cand - first
        hit = (~found) & (off >= 0) & (off < cnt)
        symidx = jnp.where(hit, offs + off, symidx)
        clen = jnp.where(hit, l, clen)
        found = found | hit
    sym = jnp.take_along_axis(st["syms"], symidx[:, None], axis=1)[:, 0]
    return sym, clen, found


def _step(st, words, nbits, cap, dict_len, has_dict):
    s = st["state"]
    peek = peek32(words, st["bitpos"])
    peek_i = peek.astype(I32)  # low 31 bits as signed-safe view
    avail = nbits - st["bitpos"]

    consume = jnp.zeros_like(s)
    nstate = s
    token = jnp.zeros(s.shape, U32)
    status = st["status"]
    final = st["final"]
    hlit, hdist, hclen = st["hlit"], st["hdist"], st["hclen"]
    idx, prev, len_val = st["idx"], st["prev"], st["len_val"]
    dst_pos = st["dst_pos"]
    need_build = st["need_build"]
    cl_lens = st["cl_lens"]
    resume_state = st["resume_state"]

    stalled = jnp.zeros(s.shape, bool)

    # ---- S_ZHDR ----
    m = s == S_ZHDR
    cmf = peek_i & 0xFF
    flg = (peek_i >> 8) & 0xFF
    zok = ((cmf & 0xF) == C.ZLIB_CM_DEFLATE) & ((cmf >> 4) <= C.ZLIB_MAX_CINFO) \
        & ((((cmf << 8) + flg) % 31) == 0)
    fdict = (flg & C.ZLIB_FLAG_FDICT) != 0
    zh_next = jnp.where(~zok, S_ERR,
                        jnp.where(fdict,
                                  S_DICTID if has_dict else S_ERR,
                                  S_BHDR))
    enough = avail >= 16
    nstate = jnp.where(m & enough, zh_next, nstate)
    consume = jnp.where(m & enough & zok, 16, consume)
    stalled = stalled | (m & ~enough)

    # ---- S_DICTID ----
    m = s == S_DICTID
    enough = avail >= 32
    nstate = jnp.where(m & enough, S_BHDR, nstate)
    consume = jnp.where(m & enough, 32, consume)
    stalled = stalled | (m & ~enough)

    # ---- S_BHDR ----
    m = s == S_BHDR
    enough = avail >= 3
    bf = peek_i & 1
    bt = (peek_i >> 1) & 3
    bh_next = jnp.where(bt == 0, S_STORED_HDR,
                        jnp.where(bt == 1, S_WAIT,
                                  jnp.where(bt == 2, S_CLEN_HDR, S_ERR)))
    ok = m & enough
    nstate = jnp.where(ok, bh_next, nstate)
    consume = jnp.where(ok & (bt != 3), 3, consume)
    final = jnp.where(ok, bf, final)
    need_build = jnp.where(ok & (bt == 1), 3, need_build)
    stalled = stalled | (m & ~enough)

    # ---- S_STORED_HDR: byte-align ----
    m = s == S_STORED_HDR
    pad = (-st["bitpos"]) & 7
    nstate = jnp.where(m, S_STORED_LEN, nstate)
    consume = jnp.where(m, pad, consume)

    # ---- S_STORED_LEN ----
    m = s == S_STORED_LEN
    enough = avail >= 32
    slen = peek_i & 0xFFFF
    snlen = (peek_i >> 16) & 0xFFFF
    lok = slen == (~snlen & 0xFFFF)  # ≙ LEN==~NLEN check (infl.c:118)
    end_next = jnp.where(final > 0, S_DONE, S_BHDR)
    nstate = jnp.where(m & enough,
                       jnp.where(~lok, S_ERR,
                                 jnp.where(slen == 0, end_next, S_STORED)),
                       nstate)
    consume = jnp.where(m & enough & lok, 32, consume)
    idx = jnp.where(m & enough & lok, slen, idx)
    stalled = stalled | (m & ~enough)

    # ---- S_STORED: emit stored-run tokens ----
    m = s == S_STORED
    space = cap - dst_pos
    run = jnp.minimum(jnp.minimum(idx, STORED_MAX_RUN), space)
    run_avail = jnp.minimum(run, avail >> 3)
    is_full = m & (space == 0)
    can = m & (space > 0) & (run_avail > 0)
    starv = m & (space > 0) & (run_avail == 0)
    off_bytes = (st["bitpos"] >> 3).astype(U32)
    token = jnp.where(can,
                      (U32(TOK_STORED) << U32(30))
                      | ((run_avail.astype(U32) - U32(1)) << U32(22))
                      | off_bytes,
                      token)
    consume = jnp.where(can, run_avail << 3, consume)
    dst_pos = jnp.where(can, dst_pos + run_avail, dst_pos)
    idx = jnp.where(can, idx - run_avail, idx)
    done_run = can & (idx == 0)  # idx is post-decrement here
    nstate = jnp.where(done_run, end_next, nstate)
    nstate = jnp.where(is_full, S_FULL, nstate)
    status = jnp.where(is_full, Result.EFULL, status)
    resume_state = jnp.where(is_full, s, resume_state)
    stalled = stalled | starv

    # ---- S_CLEN_HDR ----
    m = s == S_CLEN_HDR
    enough = avail >= 14
    h_lit = 257 + (peek_i & 31)
    h_dist = 1 + ((peek_i >> 5) & 31)
    h_clen = 4 + ((peek_i >> 10) & 15)
    hok = (h_lit <= 286) & (h_dist <= 30)
    ok = m & enough
    nstate = jnp.where(ok, jnp.where(hok, S_CLEN_LENS, S_ERR), nstate)
    consume = jnp.where(ok & hok, 14, consume)
    hlit = jnp.where(ok & hok, h_lit, hlit)
    hdist = jnp.where(ok & hok, h_dist, hdist)
    hclen = jnp.where(ok & hok, h_clen, hclen)
    idx = jnp.where(ok & hok, 0, idx)
    cl_lens = jnp.where((ok & hok)[:, None], 0, cl_lens)
    stalled = stalled | (m & ~enough)

    # ---- S_CLEN_LENS ----
    m = s == S_CLEN_LENS
    enough = avail >= 3
    ok = m & enough
    col = jnp.take(_ORD, jnp.clip(idx, 0, 18))
    v3 = peek_i & 7
    cl_lens = jnp.where(
        ok[:, None] & (jnp.arange(19, dtype=I32)[None, :] == col[:, None]),
        v3[:, None], cl_lens)
    idx2 = idx + 1
    fin_cl = ok & (idx2 >= hclen)
    consume = jnp.where(ok, 3, consume)
    idx = jnp.where(ok, idx2, idx)
    need_build = jnp.where(fin_cl, 1, need_build)
    nstate = jnp.where(fin_cl, S_WAIT, nstate)
    stalled = stalled | (m & ~enough)

    # ---- canonical decode for S_LENS / S_SYM / S_DIST ----
    dec_mask = (s == S_LENS) | (s == S_SYM) | (s == S_DIST)
    sym, clen, found = _canonical_decode(st, peek)
    # insufficient bits vs invalid code (see module doc): if not found and
    # fewer than 15 bits remain, more input could change the outcome.
    dec_stall = dec_mask & ((~found & (avail < 15)) | (found & (clen > avail)))
    dec_err = dec_mask & ~found & (avail >= 15)
    dec_ok = dec_mask & found & (clen <= avail) & ~dec_err
    stalled = stalled | dec_stall
    nstate = jnp.where(dec_err, S_ERR, nstate)

    # ---- S_LENS ----
    m = (s == S_LENS) & dec_ok
    is_lit_len = sym < 16
    is16 = sym == 16
    is17 = sym == 17
    is18 = sym == 18
    ebits = jnp.where(is16, 2, jnp.where(is17, 3, jnp.where(is18, 7, 0)))
    # stall if extra bits exceed what's available
    lens_stall = m & (clen + ebits > avail)
    stalled = stalled | lens_stall
    m = m & ~lens_stall
    ev = extract(peek, clen, ebits).astype(I32)
    rep = jnp.where(is_lit_len, 1,
                    jnp.where(is16, 3 + ev, jnp.where(is17, 3 + ev, 11 + ev)))
    wval = jnp.where(is_lit_len, sym, jnp.where(is16, prev, 0))
    total = hlit + hdist
    bad16 = is16 & (idx == 0)
    over = idx + rep > total
    lerr = m & (bad16 | over)
    lok2 = m & ~(bad16 | over)
    nstate = jnp.where(lerr, S_ERR, nstate)
    status = jnp.where(lerr, Result.ERR, status)

    def write_lens(lens):
        pos = jnp.arange(320, dtype=I32)[None, :]
        wmask = lok2[:, None] & (pos >= idx[:, None]) \
            & (pos < (idx + rep)[:, None]) & (wval[:, None] != 0)
        return jnp.where(wmask, wval[:, None], lens)

    lens_arr = jax.lax.cond(jnp.any(lok2), write_lens, lambda x: x, st["lens"])
    consume = jnp.where(lok2, clen + ebits, consume)
    prev = jnp.where(lok2 & is_lit_len, sym, jnp.where(lok2, 0, prev))
    prev = jnp.where(lok2 & is16, st["prev"], prev)  # 16 keeps prev
    idx = jnp.where(lok2, idx + rep, idx)
    fin_lens = lok2 & (idx == total)
    need_build = jnp.where(fin_lens, 2, need_build)
    nstate = jnp.where(fin_lens, S_WAIT, nstate)

    # ---- S_SYM ----
    m = (s == S_SYM) & dec_ok
    is_litrl = sym < 256
    is_eob = sym == 256
    is_len = (sym > 256) & (sym <= 285)
    sym_err = m & (sym > 285)
    # literal
    lit_full = m & is_litrl & (dst_pos >= cap)
    lit_ok = m & is_litrl & (dst_pos < cap)
    token = jnp.where(lit_ok, (U32(TOK_LIT) << U32(30)) | sym.astype(U32), token)
    consume = jnp.where(lit_ok, clen, consume)
    dst_pos = jnp.where(lit_ok, dst_pos + 1, dst_pos)
    nstate = jnp.where(lit_full, S_FULL, nstate)
    status = jnp.where(lit_full, Result.EFULL, status)
    resume_state = jnp.where(lit_full, s, resume_state)
    # end of block
    consume = jnp.where(m & is_eob, clen, consume)
    nstate = jnp.where(m & is_eob, jnp.where(final > 0, S_DONE, S_BHDR), nstate)
    # length symbol
    lidx = jnp.clip(sym - 257, 0, 28)
    leb = jnp.take(_LEXTRA, lidx)
    len_stall = m & is_len & (clen + leb > avail)
    stalled = stalled | len_stall
    mlen_ok = m & is_len & ~len_stall
    lv = jnp.take(_LBASE, lidx) + extract(peek, clen, leb).astype(I32)
    len_val = jnp.where(mlen_ok, lv, len_val)
    consume = jnp.where(mlen_ok, clen + leb, consume)
    nstate = jnp.where(mlen_ok, S_DIST, nstate)
    nstate = jnp.where(sym_err, S_ERR, nstate)
    status = jnp.where(sym_err, Result.ERR, status)

    # ---- S_DIST ----
    m = (s == S_DIST) & dec_ok
    dsym_err = m & (sym > 29)
    didx2 = jnp.clip(sym, 0, 29)
    deb = jnp.take(_DEXTRA, didx2)
    dist_stall = m & ~(sym > 29) & (clen + deb > avail)
    stalled = stalled | dist_stall
    md = m & ~(sym > 29) & ~dist_stall
    dv = jnp.take(_DBASE, didx2) + extract(peek, clen, deb).astype(I32)
    too_far = md & (dv > dst_pos + dict_len)  # ≙ infl.c:1286
    d_full = md & ~too_far & (dst_pos + len_val > cap)
    d_ok = md & ~too_far & ~(dst_pos + len_val > cap)
    token = jnp.where(
        d_ok,
        (U32(TOK_MATCH) << U32(30))
        | ((len_val - 3).astype(U32) << U32(21))
        | (dv - 1).astype(U32),
        token)
    consume = jnp.where(d_ok, clen + deb, consume)
    dst_pos = jnp.where(d_ok, dst_pos + len_val, dst_pos)
    nstate = jnp.where(d_ok, S_SYM, nstate)
    nstate = jnp.where(d_full, S_FULL, nstate)
    status = jnp.where(d_full, Result.EFULL, status)
    resume_state = jnp.where(d_full, s, resume_state)
    nstate = jnp.where(dsym_err | too_far, S_ERR, nstate)

    # ---- stalls & terminals -------------------------------------------------
    # stalls: input exhausted mid-field; resumable with more input
    status = jnp.where(stalled, Result.UNFINISHED, status)
    status = jnp.where(nstate == S_ERR, Result.ERR, status)
    status = jnp.where(nstate == S_DONE, Result.OK, status)

    st = dict(st)
    st["state"] = nstate
    # `consume` is only nonzero on branches that fully succeeded, so the
    # cursor never moves on a stall, error, or EFULL halt.
    st["bitpos"] = st["bitpos"] + consume
    st["final"] = final
    st["hlit"], st["hdist"], st["hclen"] = hlit, hdist, hclen
    st["idx"], st["prev"], st["len_val"] = idx, prev, len_val
    st["resume_state"] = resume_state
    st["dst_pos"] = dst_pos
    st["status"] = status
    st["need_build"] = need_build
    st["cl_lens"] = cl_lens
    st["lens"] = lens_arr
    return st, token


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("T", "K", "dict_len", "has_dict"))
def decode_tokens(words, nbits, zflag, cap, *, T: int, K: int = 256,
                  dict_len: int = 0, has_dict: bool = False):
    """Run the lockstep decoder for up to T steps.

    words: uint32 [N, W] packed streams;  nbits/zflag/cap: int32 [N].
    Returns (tokens [T, N] uint32, final_state dict).
    """
    N = words.shape[0]
    st = _init_state(N)
    st["state"] = jnp.where(zflag > 0, S_ZHDR, S_BHDR)

    n_chunks = (T + K - 1) // K
    tokbuf = jnp.zeros((n_chunks * K, N), U32)

    def chunk_active(carry):
        ci, st, tokbuf = carry
        return (ci < n_chunks) & jnp.any(st["status"] == STATUS_RUNNING)

    def chunk_body(carry):
        ci, st, tokbuf = carry
        st = _apply_builds(st)

        def sbody(st, _):
            return _step(st, words, nbits, cap, dict_len, has_dict)

        st, toks = jax.lax.scan(sbody, st, None, length=K)
        tokbuf = jax.lax.dynamic_update_slice(tokbuf, toks, (ci * K, 0))
        return ci + 1, st, tokbuf

    _, st, tokbuf = jax.lax.while_loop(
        chunk_active, chunk_body, (jnp.asarray(0, I32), st, tokbuf))
    # one final build application so WAIT lanes don't leak out mid-build
    st = _apply_builds(st)
    return tokbuf[:T], st
