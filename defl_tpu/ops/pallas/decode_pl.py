"""Pallas TPU kernel: the lockstep decode scan body.

This is the "native tier" of the decoder — the TPU answer to the
reference's hand-tuned C hot loop (`/root/reference/src/infl/infl.c:717-901`).
The XLA formulation in ``ops.inflate_batch`` pays a fused-kernel *launch*
(~3µs) for every handful of elementwise ops, ~15-20 launches per lockstep
step; this kernel runs a whole K-step chunk in ONE launch with every
per-lane structure VMEM-resident.

Layout: lanes live in the (sublane, lane) = (8, 128) vector shape — each
grid program owns a block of 1024 lanes, and every per-lane scalar is an
(8, 128) tile, so the VPU runs at full width.  All wide per-lane arrays
(input window, Huffman tables, symbol bank, packed code lengths) are
word-major ``[words, R, 128]`` so a static word index is free addressing;
rank->symbol and window selects are where-chains (Mosaic has no per-lane
dynamic gather), kept narrow by the statically-known alphabet of each
decode site.

Bit delivery is a per-lane 128-bit FIFO (``bb[0..3]``) refilled from a
16-word aligned mini-window re-extracted from the chunk window every
UNROLL steps.  Effective availability is ``min(nbits - bitpos, bb_n)``;
a lane whose FIFO is "dry" (fewer buffered bits than min(avail, 48))
simply idles for a step without touching its status — the
consume-only-on-success invariant makes every deferral safe — so results
are bit-identical to the XLA path even though stall *timing* is not.

Header-parse states, the CL-table decode, stored-run emission, and the
packed-lens writes are all gated behind ``lax.cond``/``pl.when`` on
"any lane needs it": during bulk symbol decode (the overwhelming
majority of steps) only the S_SYM fast path executes — the lockstep
analog of the reference keeping its hot loop free of header code.

The chunk driver (`decode_tokens_pl`) keeps the XLA path's carry format,
chunk-boundary window refills and batched table builds
(ops.inflate_batch), so the two backends are interchangeable and are
cross-checked by tests/test_decode_pl.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from defl_tpu import constants as C
from defl_tpu.errors import Result
from defl_tpu.ops import tables
from defl_tpu.ops.bitio import I32, U32, bitrev16, extract
from defl_tpu.ops.inflate_batch import (
    LENS_WORDS, S_BHDR, S_CLEN_HDR, S_CLEN_LENS, S_DICTID, S_DONE, S_ERR,
    S_FULL, S_LENS, S_STORED, S_STORED_HDR, S_STORED_LEN, S_SYM, S_WAIT,
    S_ZHDR, STATUS_RUNNING, STORED_MAX_RUN, TOK_LIT, TOK_LIT_PAIR_BIT,
    TOK_MATCH, TOK_STORED, WIN, _dist_from_sym, _length_from_sym, _ord_arith,
)

# the axon PJRT plugin compiles Mosaic kernels remotely
os.environ.setdefault("PALLAS_AXON_REMOTE_COMPILE", "1")

UNROLL = 4
LANE_SUB = 8                 # sublane rows per grid program (8*128 lanes)
MINI = 16                    # FIFO refill mini-window (words, 8-aligned)

# state-pack row indices (i32 [NROWS, R, 128])
(R_STATE, R_BITPOS, R_FINAL, R_HLIT, R_HDIST, R_HCLEN, R_IDX, R_PREV,
 R_DSTPOS, R_NEEDB, R_RESUME, R_STATUS, R_CLLO, R_CLHI, R_NBITS, R_CAP,
 R_WINWORD, R_LIMIT, R_REACH, R_INBASE) = range(20)
NROWS = 20

ST_KEYS = ("state", "bitpos", "final", "hlit", "hdist", "hclen", "idx",
           "prev", "dst_pos", "need_build", "resume_state", "status",
           "cl_lo", "cl_hi")


def _bc(x, dt):
    return jax.lax.bitcast_convert_type(x, dt)


def _mux_ref(ref, idx, base, count, as_u32=False, group=16):
    """ref[base + idx] for per-lane (8,128) idx in [0, count): where-chain
    over static rows, two-level when the bank is wide."""
    rd = (lambda k: _bc(ref[k], U32)) if as_u32 else (lambda k: ref[k])
    if count <= 24:
        acc = rd(base)
        for k in range(1, count):
            acc = jnp.where(idx == k, rd(base + k), acc)
        return acc
    ng = -(-count // group)
    g = idx // group
    lo = idx - g * group
    slab = [rd(base + min(k, count - 1)) for k in range(group)]
    for j in range(1, ng):
        m = g == j
        for k in range(group):
            kk = j * group + k
            if kk < count:
                slab[k] = jnp.where(m, rd(base + kk), slab[k])
    acc = slab[0]
    for k in range(1, group):
        acc = jnp.where(lo == k, slab[k], acc)
    return acc


def _mux_list(ws, idx):
    """ws[idx] for a python list of (8,128) u32 words; 0 past the end."""
    acc = ws[0]
    for k in range(1, len(ws)):
        acc = jnp.where(idx == k, ws[k], acc)
    return jnp.where(idx >= len(ws), jnp.zeros_like(acc), acc)


def _peek_at(bb, o):
    """32-bit LSB-first window at bit offset o (per-lane, 0..96) within
    the 128-bit FIFO word list bb[0..3] (zeros beyond)."""
    w = o >> 5
    lo = _mux_list(bb, w)
    hi = _mux_list(bb, w + 1)
    s = (o & 31).astype(U32)
    return jnp.where(s == 0, lo,
                     (lo >> s) | (hi << ((U32(32) - s) & U32(31))))


def _shift_fifo(bb, bb_n, c):
    """Drop c bits (per-lane, any size) from the FIFO; clamps at empty
    (an over-consumed FIFO realigns from bitpos at the next refill)."""
    wsh = c >> 5
    s = (c & 31).astype(U32)
    z = jnp.zeros_like(bb[0])
    t = [_mux_list(bb, wsh + k) for k in range(4)] + [z]
    out = []
    for k in range(4):
        out.append(jnp.where(s == 0, t[k],
                             (t[k] >> s)
                             | (t[k + 1] << ((U32(32) - s) & U32(31)))))
    return out, jnp.maximum(bb_n - c, 0)


def _canon_pl(tabs, kind, peek):
    """Canonical decode against one statically-chosen table kind
    (0 CL, 1 LIT, 2 DIST).  Returns (sym, clen, found, maxlen).

    Boundary-sum form: canonical codes of length l occupy exactly
    [first[l] << (15-l), bound[l]) of the left-justified 15-bit code
    space, where bound[l] = (first[l]+count[l]) << (15-l), and bound is
    non-decreasing in l (first[l+1] = (first[l]+count[l]) << 1) — so the
    code length is simply 1 + #{l : rev15 >= bound[l]} and "found" is
    rev15 < bound[15].  15 independent compares + a sum replace the
    serial first-hit where-chain (the per-step hot cost: this runs up to
    5x per step), and offs-first folds into one premixed adjoff row
    (symidx = adjoff[clen] + (rev15 >> (15-clen))).  bound/adjoff are
    derived from the canonical build's (count, first, offs) by the chunk
    driver — same build, different kernel-facing layout."""
    bound_ref, adjoff_ref, maxlen_ref, syms_ref = tabs
    rev = bitrev16(peek & U32(0x7FFF)) >> U32(1)
    rv = rev.astype(I32)
    nge = jnp.zeros(peek.shape, I32)
    for l in range(1, C.MAX_CODE_LENGTH + 1):
        nge = nge + (rv >= bound_ref[kind * 16 + l]).astype(I32)
    found = nge < C.MAX_CODE_LENGTH
    clen = jnp.where(found, nge + 1, 0)
    adjoff = _mux_ref(adjoff_ref, nge, kind * 16 + 1, C.MAX_CODE_LENGTH)
    symidx = jnp.where(found, adjoff + (rv >> (15 - clen)), 0)
    base, width = {0: (tables.CL_BASE, 24),
                   1: (tables.LIT_BASE, 288),
                   2: (tables.DIST_BASE_, 36)}[kind]
    q = symidx // 3
    rem = symidx - 3 * q
    word = _mux_ref(syms_ref, q - base // 3, base // 3, width // 3,
                    as_u32=True)
    sym = ((word >> (U32(10) * rem.astype(U32))) & U32(0x3FF)).astype(I32)
    return sym, clen, found, maxlen_ref[kind]


def _make_kernel(K: int, dict_len: int, has_dict: bool):
    def kernel(st_ref, lens_ref, win_ref, bound_ref, adjoff_ref,
               maxlen_ref, syms_ref, tok_ref, st_out_ref, lens_out_ref):
        nbits = st_ref[R_NBITS]
        cap = st_ref[R_CAP]
        win_word = st_ref[R_WINWORD]
        limit = st_ref[R_LIMIT]
        dict_reach = st_ref[R_REACH]
        in_base = st_ref[R_INBASE]
        zero = jnp.zeros_like(nbits)
        zu = _bc(zero, U32)
        tabs = (bound_ref, adjoff_ref, maxlen_ref, syms_ref)

        # lens is write-only inside the kernel (read by the between-chunk
        # builds): seed the output ref, then RMW it under the header gate.
        for w in range(LENS_WORDS):
            lens_out_ref[w] = lens_ref[w]

        st0 = {k: st_ref[r] for k, r in zip(ST_KEYS, range(14))}
        st0["cl_lo"] = _bc(st0["cl_lo"], U32)
        st0["cl_hi"] = _bc(st0["cl_hi"], U32)
        fifo0 = dict(bb=[zu, zu, zu, zu], bb_n=zero, wcur=zero)

        def refill_round(fifo, bitpos, mini, mini_base):
            bb, bb_n, wcur = fifo["bb"], fifo["bb_n"], fifo["wcur"]
            empty = bb_n == 0
            wc = jnp.where(empty, (bitpos >> 5) - win_word, wcur)
            mi = wc - mini_base
            # wc < WIN: a lane whose cursor crosses the window end must
            # starve (idle until the chunk driver recenters its window) —
            # without this gate the clipped slab pick would replay the
            # window's last row as fresh bits and corrupt the stream
            do = (bb_n <= 96) & (mi >= 0) & (mi < MINI) \
                & (wc < WIN) & (wc + win_word < (nbits + 31) >> 5)
            w = _mux_list(mini, jnp.where(do, mi, 0))
            sh = jnp.where(empty, bitpos & 31, 0).astype(U32)
            wsh = w >> sh
            s = (bb_n & 31).astype(U32)
            seg = bb_n >> 5
            lo_part = wsh << s
            hi_part = jnp.where(s == 0, zu, wsh >> ((U32(32) - s) & U32(31)))
            nbb = list(bb)
            for k in range(4):
                add = jnp.where(do & (seg == k), lo_part, zu)
                if k > 0:
                    add = add | jnp.where(do & (seg == k - 1), hi_part, zu)
                nbb[k] = bb[k] | add
            return dict(
                bb=nbb,
                bb_n=jnp.where(do, bb_n + 32 - sh.astype(I32), bb_n),
                wcur=jnp.where(do, wc + 1, jnp.where(empty, wc, wcur)))

        def step(st, fifo):
            s = st["state"]
            bb = fifo["bb"]
            bb_n = fifo["bb_n"]
            avail = nbits - st["bitpos"]          # true stream availability
            # a lane is "dry" when the FIFO holds fewer bits than the
            # primary decode chain might examine (48 = 15+5+15+13) and
            # more exist in the stream; it idles, status untouched (≙ the
            # XLA path's window-miss `blocked`)
            dry = bb_n < jnp.minimum(avail, 48)
            availF = jnp.minimum(avail, bb_n)
            peek = bb[0]
            peek_i = peek.astype(I32)

            consume = zero
            nstate = s
            token = zu
            token2 = zu
            status = st["status"]
            final = st["final"]
            hlit, hdist, hclen = st["hlit"], st["hdist"], st["hclen"]
            idx, prev = st["idx"], st["prev"]
            dst_pos = st["dst_pos"]
            need_build = st["need_build"]
            cl_lo, cl_hi = st["cl_lo"], st["cl_hi"]
            resume_state = st["resume_state"]
            stalled = jnp.zeros_like(s, bool)

            is_lens_state = s == S_LENS
            hdr_mask = (s <= S_LENS) & (s != S_STORED) & (s != S_SYM)
            any_hdr = jnp.max(hdr_mask.astype(I32)) > 0
            any_stored = jnp.max((s == S_STORED).astype(I32)) > 0

            # primary canonical decode: LIT always, CL merged under the
            # header branch for S_LENS lanes
            dec_mask = ((s == S_LENS) | (s == S_SYM)) & ~dry
            sym, clen, found, ml1 = _canon_pl(tabs, 1, peek)

            def hdr_branch(args):
                (consume, nstate, final, hlit, hdist, hclen, idx,
                 need_build, cl_lo, cl_hi, stalled_i, sym, clen, found_i,
                 ml1) = args
                stalled = stalled_i != 0   # vector<i1> cannot cross the
                found = found_i != 0       # cond boundary in Mosaic

                symC, clenC, foundC, mlC = _canon_pl(tabs, 0, peek)
                sym = jnp.where(is_lens_state, symC, sym)
                clen = jnp.where(is_lens_state, clenC, clen)
                # bool-valued select: logical form (Mosaic cannot lower an
                # i8->i1 truncating select)
                found = (is_lens_state & foundC) | (~is_lens_state & found)
                ml1 = jnp.where(is_lens_state, mlC, ml1)

                # ---- S_ZHDR ----
                m = (s == S_ZHDR) & ~dry
                cmf = peek_i & 0xFF
                flg = (peek_i >> 8) & 0xFF
                zok = ((cmf & 0xF) == C.ZLIB_CM_DEFLATE) \
                    & ((cmf >> 4) <= C.ZLIB_MAX_CINFO) \
                    & ((((cmf << 8) + flg) % 31) == 0)
                fdict = (flg & C.ZLIB_FLAG_FDICT) != 0
                zh_next = jnp.where(~zok, S_ERR,
                                    jnp.where(fdict,
                                              S_DICTID if has_dict else S_ERR,
                                              S_BHDR))
                enough = availF >= 16
                nstate = jnp.where(m & enough, zh_next, nstate)
                consume = jnp.where(m & enough & zok, 16, consume)
                stalled = stalled | (m & ~enough)

                # ---- S_DICTID ----
                m = (s == S_DICTID) & ~dry
                enough = availF >= 32
                nstate = jnp.where(m & enough, S_BHDR, nstate)
                consume = jnp.where(m & enough, 32, consume)
                stalled = stalled | (m & ~enough)

                # ---- S_BHDR ----
                m = (s == S_BHDR) & ~dry
                # split decode: reaching the bit limit at a block
                # boundary completes the lane's segment (runtime/large.py)
                at_lim = (s == S_BHDR) & (st["bitpos"] >= limit)
                m = m & ~at_lim
                nstate = jnp.where(at_lim, S_DONE, nstate)
                enough = availF >= 3
                bf = peek_i & 1
                bt = (peek_i >> 1) & 3
                bh_next = jnp.where(bt == 0, S_STORED_HDR,
                                    jnp.where(bt == 1, S_WAIT,
                                              jnp.where(bt == 2, S_CLEN_HDR,
                                                        S_ERR)))
                ok = m & enough
                nstate = jnp.where(ok, bh_next, nstate)
                consume = jnp.where(ok & (bt != 3), 3, consume)
                final = jnp.where(ok, bf, final)
                need_build = jnp.where(ok & (bt == 1), 3, need_build)
                stalled = stalled | (m & ~enough)

                # ---- S_STORED_HDR: byte-align (reads no content) ----
                m = s == S_STORED_HDR
                pad = (-st["bitpos"]) & 7
                nstate = jnp.where(m, S_STORED_LEN, nstate)
                consume = jnp.where(m, pad, consume)

                # ---- S_STORED_LEN ----
                m = (s == S_STORED_LEN) & ~dry
                enough = availF >= 32
                slen = peek_i & 0xFFFF
                snlen = (peek_i >> 16) & 0xFFFF
                lok = slen == (~snlen & 0xFFFF)   # ≙ infl.c:118
                end_nx = jnp.where(final > 0, S_DONE, S_BHDR)
                nstate = jnp.where(
                    m & enough,
                    jnp.where(~lok, S_ERR,
                              jnp.where(slen == 0, end_nx, S_STORED)),
                    nstate)
                consume = jnp.where(m & enough & lok, 32, consume)
                idx = jnp.where(m & enough & lok, slen, idx)
                stalled = stalled | (m & ~enough)

                # ---- S_CLEN_HDR ----
                m = (s == S_CLEN_HDR) & ~dry
                enough = availF >= 14
                h_lit = 257 + (peek_i & 31)
                h_dist = 1 + ((peek_i >> 5) & 31)
                h_clen = 4 + ((peek_i >> 10) & 15)
                hok = (h_lit <= 286) & (h_dist <= 30)
                ok = m & enough
                nstate = jnp.where(ok, jnp.where(hok, S_CLEN_LENS, S_ERR),
                                   nstate)
                consume = jnp.where(ok & hok, 14, consume)
                hlit = jnp.where(ok & hok, h_lit, hlit)
                hdist = jnp.where(ok & hok, h_dist, hdist)
                hclen = jnp.where(ok & hok, h_clen, hclen)
                idx = jnp.where(ok & hok, 0, idx)
                cl_lo = jnp.where(ok & hok, U32(0), cl_lo)
                cl_hi = jnp.where(ok & hok, U32(0), cl_hi)
                stalled = stalled | (m & ~enough)

                # ---- S_CLEN_LENS ----
                m = (s == S_CLEN_LENS) & ~dry
                enough = availF >= 3
                ok = m & enough
                ordi = _ord_arith(jnp.clip(idx, 0, 18))
                v3 = peek & U32(7)
                sh3 = (3 * ordi).astype(U32)
                cl_lo = jnp.where(ok & (ordi < 10),
                                  cl_lo | (v3 << (sh3 & U32(31))), cl_lo)
                cl_hi = jnp.where(ok & (ordi >= 10),
                                  cl_hi | (v3 << ((sh3 - U32(30)) & U32(31))),
                                  cl_hi)
                idx2 = idx + 1
                fin_cl = ok & (idx2 >= hclen)
                consume = jnp.where(ok, 3, consume)
                idx = jnp.where(ok, idx2, idx)
                need_build = jnp.where(fin_cl, 1, need_build)
                nstate = jnp.where(fin_cl, S_WAIT, nstate)
                stalled = stalled | (m & ~enough)

                return (consume, nstate, final, hlit, hdist, hclen, idx,
                        need_build, cl_lo, cl_hi, stalled.astype(I32), sym,
                        clen, found.astype(I32), ml1)

            (consume, nstate, final, hlit, hdist, hclen, idx, need_build,
             cl_lo, cl_hi, stalled_i, sym, clen, found_i, ml1) = jax.lax.cond(
                any_hdr, hdr_branch, lambda a: a,
                (consume, nstate, final, hlit, hdist, hclen, idx,
                 need_build, cl_lo, cl_hi, stalled.astype(I32), sym, clen,
                 found.astype(I32), ml1))
            stalled = stalled_i != 0
            found = found_i != 0

            # shared decode gates (needs <= 48 bits, so availF-gating is
            # exactly avail-gating for non-dry lanes)
            dec_stall = dec_mask & ((~found & (availF < ml1))
                                    | (found & (clen > availF)))
            dec_err = dec_mask & ~found & (availF >= ml1)
            dec_ok = dec_mask & found & (clen <= availF) & ~dec_err
            stalled = stalled | dec_stall
            nstate = jnp.where(dec_err, S_ERR, nstate)
            end_next = jnp.where(final > 0, S_DONE, S_BHDR)

            # ---- S_STORED (gated; emits input-offset tokens) ----
            def stored_branch(args):
                (consume, nstate, status, idx, dst_pos, resume_state,
                 stalled_i, token) = args
                stalled = stalled_i != 0
                m = s == S_STORED
                space = cap - dst_pos
                run = jnp.minimum(jnp.minimum(idx, STORED_MAX_RUN), space)
                run_avail = jnp.minimum(run, avail >> 3)
                is_full = m & (space == 0)
                can = m & (space > 0) & (run_avail > 0)
                starv = m & (space > 0) & (run_avail <= 0)
                # segment-relative offsets (≙ inflate_batch S_STORED)
                off_bytes = ((st["bitpos"] >> 3) - in_base).astype(U32)
                token = jnp.where(
                    can,
                    (U32(TOK_STORED) << U32(30))
                    | ((run_avail.astype(U32) - U32(1)) << U32(22))
                    | off_bytes, token)
                consume = jnp.where(can, run_avail << 3, consume)
                dst_pos = jnp.where(can, dst_pos + run_avail, dst_pos)
                idx = jnp.where(can, idx - run_avail, idx)
                done_run = can & (idx == 0)
                nstate = jnp.where(done_run, end_next, nstate)
                nstate = jnp.where(is_full, S_FULL, nstate)
                status = jnp.where(is_full, Result.EFULL, status)
                resume_state = jnp.where(is_full, s, resume_state)
                stalled = stalled | starv
                return (consume, nstate, status, idx, dst_pos, resume_state,
                        stalled.astype(I32), token)

            (consume, nstate, status, idx, dst_pos, resume_state, stalled_i,
             token) = jax.lax.cond(
                any_stored, stored_branch, lambda a: a,
                (consume, nstate, status, idx, dst_pos, resume_state,
                 stalled.astype(I32), token))
            stalled = stalled_i != 0

            # ---- S_LENS consumption (write set returned to caller) ----
            m = is_lens_state & dec_ok
            is_lit_len = sym < 16
            is16 = sym == 16
            is17 = sym == 17
            is18 = sym == 18
            ebits = jnp.where(is16, 2, jnp.where(is17, 3,
                                                 jnp.where(is18, 7, 0)))
            lens_stall = m & (clen + ebits > availF)
            stalled = stalled | lens_stall
            m = m & ~lens_stall
            ev = extract(peek, clen, ebits).astype(I32)
            rep = jnp.where(is_lit_len, 1,
                            jnp.where(is16, 3 + ev,
                                      jnp.where(is17, 3 + ev, 11 + ev)))
            wval = jnp.where(is_lit_len, sym, jnp.where(is16, prev, 0))
            total = hlit + hdist
            bad16 = is16 & (idx == 0)
            over = idx + rep > total
            lerr = m & (bad16 | over)
            lok2 = m & ~(bad16 | over)
            nstate = jnp.where(lerr, S_ERR, nstate)
            lens_wr = (lok2 & (wval > 0), idx, idx + rep, wval)
            consume = jnp.where(lok2, clen + ebits, consume)
            prev = jnp.where(lok2 & is_lit_len, sym,
                             jnp.where(lok2 & (is17 | is18), 0, prev))
            idx = jnp.where(lok2, idx + rep, idx)
            fin_lens = lok2 & (idx == total)
            need_build = jnp.where(fin_lens, 2, need_build)
            nstate = jnp.where(fin_lens, S_WAIT, nstate)

            # ---- S_SYM: literal / EOB / whole match ----
            m = (s == S_SYM) & dec_ok
            is_lit1 = m & (sym < 256)
            is_eob = m & (sym == 256)
            is_len = m & (sym > 256) & (sym <= 285)
            sym_err = m & (sym > 285)

            len_v, leb = _length_from_sym(sym, peek, clen)
            consumed1 = clen + jnp.where(is_len, leb, 0)
            peek2 = _peek_at(bb, consumed1)
            avail2 = availF - consumed1
            sym2, clen2, found2, ml2 = _canon_pl(tabs, 2, peek2)
            symL2, clenL2, foundL2, _ = _canon_pl(tabs, 1, peek2)

            dv, deb = _dist_from_sym(sym2, peek2, clen2)
            consumed2 = clen2 + deb
            d_stall = is_len & ((~found2 & (avail2 < ml2))
                                | (found2 & (consumed2 > avail2)))
            d_err = is_len & ~d_stall & (
                (found2 & (sym2 > 29)) | (~found2 & (avail2 >= ml2)))
            md = is_len & ~d_stall & ~d_err
            too_far = md & (dv > dst_pos + dict_reach)   # ≙ infl.c:1286
            m_full = md & ~too_far & (dst_pos + len_v > cap)
            m_ok = md & ~too_far & ~m_full
            stalled = stalled | d_stall
            token = jnp.where(
                m_ok,
                (U32(TOK_MATCH) << U32(30))
                | ((len_v - 3).astype(U32) << U32(21))
                | (dv - 1).astype(U32),
                token)
            consume = jnp.where(m_ok, consumed1 + consumed2, consume)
            dst_pos = jnp.where(m_ok, dst_pos + len_v, dst_pos)
            nstate = jnp.where(m_full, S_FULL, nstate)
            status = jnp.where(m_full, Result.EFULL, status)
            resume_state = jnp.where(m_full, s, resume_state)
            nstate = jnp.where(sym_err | d_err | too_far, S_ERR, nstate)

            lit_full = is_lit1 & (dst_pos >= cap)
            lit1_ok = is_lit1 & ~lit_full
            lit2_ok = lit1_ok & foundL2 & (symL2 < 256) \
                & (clenL2 <= avail2) & (dst_pos + 1 < cap)
            token = jnp.where(
                lit1_ok,
                (U32(TOK_LIT) << U32(30)) | sym.astype(U32)
                | jnp.where(lit2_ok,
                            U32(TOK_LIT_PAIR_BIT)
                            | (symL2.astype(U32) << U32(8)),
                            U32(0)),
                token)
            consume = jnp.where(lit1_ok,
                                clen + jnp.where(lit2_ok, clenL2, 0), consume)
            dst_pos = jnp.where(lit1_ok, dst_pos + 1 + lit2_ok.astype(I32),
                                dst_pos)
            nstate = jnp.where(lit_full, S_FULL, nstate)
            status = jnp.where(lit_full, Result.EFULL, status)
            resume_state = jnp.where(lit_full, s, resume_state)

            consume = jnp.where(is_eob, clen, consume)
            nstate = jnp.where(is_eob, end_next, nstate)

            # ---- opportunistic second token (defer-only: no new error
            # paths; anything that doesn't fit re-decodes next step) ----
            t2 = m_ok | lit1_ok
            b3 = consume
            peek3 = _peek_at(bb, b3)
            avail3 = availF - consume
            sym3, clen3, found3, _ = _canon_pl(tabs, 1, peek3)
            t2v = t2 & found3 & (clen3 <= avail3)
            is_lit3 = t2v & (sym3 < 256)
            is_eob3 = t2v & (sym3 == 256)
            is_len3 = t2v & (sym3 > 256) & (sym3 <= 285)

            lit3_ok = is_lit3 & (dst_pos < cap)
            token2 = jnp.where(
                lit3_ok, (U32(TOK_LIT) << U32(30)) | sym3.astype(U32),
                token2)
            consume = jnp.where(lit3_ok, consume + clen3, consume)
            dst_pos = jnp.where(lit3_ok, dst_pos + 1, dst_pos)

            consume = jnp.where(is_eob3, consume + clen3, consume)
            nstate = jnp.where(is_eob3, end_next, nstate)

            len3, leb3 = _length_from_sym(sym3, peek3, clen3)
            c31 = clen3 + jnp.where(is_len3, leb3, 0)
            peek4 = _peek_at(bb, b3 + c31)
            avail4 = avail3 - c31
            sym4, clen4, found4, _ = _canon_pl(tabs, 2, peek4)
            dv4, deb4 = _dist_from_sym(sym4, peek4, clen4)
            c42 = clen4 + deb4
            m4_ok = (is_len3 & found4 & (c42 <= avail4) & (sym4 <= 29)
                     & (dv4 <= dst_pos + dict_reach)
                     & (dst_pos + len3 <= cap))
            token2 = jnp.where(
                m4_ok,
                (U32(TOK_MATCH) << U32(30))
                | ((len3 - 3).astype(U32) << U32(21))
                | (dv4 - 1).astype(U32),
                token2)
            consume = jnp.where(m4_ok, consume + c31 + c42, consume)
            dst_pos = jnp.where(m4_ok, dst_pos + len3, dst_pos)

            # ---- terminals ----
            status = jnp.where(stalled, Result.UNFINISHED, status)
            status = jnp.where(nstate == S_ERR, Result.ERR, status)
            status = jnp.where(nstate == S_DONE, Result.OK, status)

            nst = dict(
                state=nstate, bitpos=st["bitpos"] + consume, final=final,
                hlit=hlit, hdist=hdist, hclen=hclen, idx=idx, prev=prev,
                dst_pos=dst_pos, need_build=need_build,
                resume_state=resume_state, status=status,
                cl_lo=cl_lo, cl_hi=cl_hi)
            nbb, nbb_n = _shift_fifo(bb, bb_n, consume)
            nfifo = dict(bb=nbb, bb_n=nbb_n, wcur=fifo["wcur"])
            return nst, nfifo, token, token2, any_hdr, lens_wr

        def group(g, carry):
            st, fifo = carry
            # aligned 16-word mini-window: two 8-word slab picks (empty
            # FIFOs realign their cursor from bitpos first)
            wc = jnp.where(fifo["bb_n"] == 0,
                           (st["bitpos"] >> 5) - win_word, fifo["wcur"])
            g8 = jnp.clip(wc >> 3, 0, WIN // 8 - 1)
            mini_base = g8 * 8
            g8b = jnp.clip(g8 + 1, 0, WIN // 8 - 1)
            slab0 = [_bc(win_ref[k], U32) for k in range(8)]
            slab1 = list(slab0)
            for j in range(1, WIN // 8):
                m0 = g8 == j
                m1 = g8b == j
                for k in range(8):
                    wv = _bc(win_ref[j * 8 + k], U32)
                    slab0[k] = jnp.where(m0, wv, slab0[k])
                    slab1[k] = jnp.where(m1, wv, slab1[k])
            mini = slab0 + slab1

            toks = []
            for _u in range(UNROLL):
                fifo = refill_round(fifo, st["bitpos"], mini, mini_base)
                fifo = refill_round(fifo, st["bitpos"], mini, mini_base)
                st, fifo, tok, tok2, any_hdr, lens_wr = step(st, fifo)

                @pl.when(any_hdr)
                def _():
                    mask, wr_lo, wr_hi, wval = lens_wr
                    splat = wval.astype(U32) * U32(0x11111111)
                    for wi in range(LENS_WORDS):
                        lo = jnp.clip(wr_lo - 8 * wi, 0, 8)
                        hi = jnp.clip(wr_hi - 8 * wi, 0, 8)
                        n = (hi - lo).astype(U32)
                        mw = jnp.where(
                            n >= 8, U32(0xFFFFFFFF),
                            ((U32(1) << ((U32(4) * n) & U32(31))) - U32(1))
                            << (U32(4) * lo.astype(U32)))
                        mw = jnp.where(mask & (n > 0), mw, U32(0))
                        lens_out_ref[wi] = _bc(
                            _bc(lens_out_ref[wi], U32) | (splat & mw), I32)

                toks.append(_bc(tok, I32))
                toks.append(_bc(tok2, I32))
            tok_ref[pl.ds(g * 2 * UNROLL, 2 * UNROLL)] = jnp.stack(toks)
            return st, fifo

        stf, _ = jax.lax.fori_loop(0, K // UNROLL, group, (st0, fifo0))

        for k, r in zip(ST_KEYS, range(14)):
            v = stf[k]
            if k in ("cl_lo", "cl_hi"):
                v = _bc(v, I32)
            st_out_ref[r] = v
        st_out_ref[R_NBITS] = nbits
        st_out_ref[R_CAP] = cap
        st_out_ref[R_WINWORD] = win_word
        st_out_ref[R_LIMIT] = limit
        st_out_ref[R_REACH] = dict_reach
        st_out_ref[R_INBASE] = in_base

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("K", "dict_len", "has_dict", "interpret"))
def decode_chunk_pl(st_pk, lens_pk3, win3, bound3, adjoff3, maxlen3,
                    syms3, *, K: int, dict_len: int, has_dict: bool,
                    interpret: bool = False):
    """One K-step chunk over all lanes; grid over 1024-lane blocks.

    st_pk [NROWS, R, 128] i32; lens_pk3 [40, R, 128] i32 (u32 bits);
    win3 [WIN, R, 128]; bound3/adjoff3 [48, R, 128] (kind*16+len, the
    left-justified code-space boundaries / offs-first rows _canon_pl
    consumes); maxlen3 [3, R, 128]; syms3 [SYMS_WORDS, R, 128].
    Returns (tokens [2K, R, 128] i32 (u32 bits), st_out, lens_out).
    """
    R = st_pk.shape[1]
    assert R % LANE_SUB == 0, R
    grid = (R // LANE_SUB,)
    bs = lambda rows: pl.BlockSpec((rows, LANE_SUB, 128),
                                   lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_kernel(K, dict_len, has_dict),
        grid=grid,
        in_specs=[bs(NROWS), bs(LENS_WORDS), bs(WIN), bs(48), bs(48),
                  bs(3), bs(tables.SYMS_WORDS)],
        out_specs=(bs(2 * K), bs(NROWS), bs(LENS_WORDS)),
        out_shape=(
            jax.ShapeDtypeStruct((2 * K, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((NROWS, R, 128), jnp.int32),
            jax.ShapeDtypeStruct((LENS_WORDS, R, 128), jnp.int32),
        ),
        interpret=interpret,
    )(st_pk, lens_pk3, win3, bound3, adjoff3, maxlen3, syms3)


# ---------------------------------------------------------------------------
# chunk driver: same carry format / refills / builds as the XLA path
# ---------------------------------------------------------------------------

LANE_PAD = LANE_SUB * 128    # lane count granularity of the kernel grid


def _to3(x):
    """[N, X] -> [X, R, 128] word-major (lane n = (n // 128, n % 128))."""
    N = x.shape[0]
    return x.T.reshape(x.shape[1], N // 128, 128)


def _i3(x):
    return _bc(_to3(x), I32) if x.dtype == jnp.uint32 else _to3(x)


@functools.partial(jax.jit, static_argnames=("T", "K", "dict_len",
                                             "has_dict", "shared_input",
                                             "interpret"))
def decode_tokens_pl(words, nbits, zflag, cap, *, T: int, K: int = 128,
                     dict_len: int = 0, has_dict: bool = False, carry=None,
                     limit=None, start_bit=None, dict_reach=None,
                     shared_input: bool = False, in_base=None,
                     interpret: bool = False):
    """Pallas-backed twin of ``inflate_batch.decode_tokens``.

    Same signature, same carry pytree, same token buffer format — the
    scan body runs as one Mosaic kernel per chunk instead of ~15 fused
    XLA kernels per step.  N is padded up to the 1024-lane kernel grid;
    padded lanes carry empty streams and are dropped by the caller
    (token buffer lanes beyond the real N are zero/NOP).
    """
    from defl_tpu.ops import inflate_batch as ib

    N0 = nbits.shape[0]
    N = -(-N0 // LANE_PAD) * LANE_PAD
    if carry is not None:
        carry = {k: v for k, v in carry.items() if k != "tok_rows"}
    if limit is None:
        limit = jnp.full((N0,), 1 << 30, I32)  # never reached
    if dict_reach is None:
        dict_reach = jnp.full((N0,), dict_len, I32)
    if in_base is None:
        in_base = jnp.zeros((N0,), I32)
    if N != N0:
        if not shared_input:
            words = jnp.pad(words, ((0, N - N0), (0, 0)))
        nbits = jnp.pad(nbits, (0, N - N0))
        zflag = jnp.pad(zflag, (0, N - N0))
        cap = jnp.pad(cap, (0, N - N0))
        limit = jnp.pad(limit, (0, N - N0), constant_values=1 << 30)
        dict_reach = jnp.pad(dict_reach, (0, N - N0))
        in_base = jnp.pad(in_base, (0, N - N0))
        if carry is not None:
            pad_st = ib._init_scan_state(N - N0)
            pad_ck = ib._init_chunk_state(N - N0)
            pad_st["status"] = jnp.full((N - N0,), int(Result.ERR), I32)
            pad = {**pad_st, **pad_ck}
            carry = {k: jnp.concatenate(
                [carry[k], pad[k]], axis=1 if k == "lens_pk" else 0)
                for k in carry}

    if carry is None:
        st = ib._init_scan_state(N)
        ck = ib._init_chunk_state(N)
        st["state"] = jnp.where(zflag > 0, S_ZHDR, S_BHDR)
        if start_bit is not None:
            st["bitpos"] = jnp.pad(jnp.asarray(start_bit, I32),
                                   (0, N - N0))
    else:
        st = {k: carry[k] for k in ib._init_scan_state(1)}
        ck = {k: carry[k] for k in ib._init_chunk_state(1)}
        ck = dict(ck)
        ck["win_word"] = jnp.full((N,), -(10 * WIN), I32)

    SEG = ib.SEG
    if shared_input:
        body = words.reshape(-1)
        S = (body.shape[0] + SEG - 1) // SEG
        bpad = jnp.pad(body, (0, S * SEG - body.shape[0]))
        words_p = tuple(p.reshape(S, SEG) for p in ib._split_planes(bpad))
        refill_windows = ib._refill_windows_shared
    else:
        W = words.shape[1]
        S = (W + SEG - 1) // SEG
        wpad = jnp.pad(words, ((0, 0), (0, S * SEG - W)))
        words_p = tuple(p.reshape(N, S, SEG)
                        for p in ib._split_planes(wpad))
        refill_windows = ib._refill_windows

    n_steps = max(K, T // 2)
    n_chunks = (n_steps + K - 1) // K
    tokbuf = jnp.zeros((n_chunks * K * 2, N), U32)
    R = N // 128

    def chunk_active(c):
        ci, st, ck, tokbuf = c
        return (ci < n_chunks) & jnp.any(st["status"] == STATUS_RUNNING)

    def chunk_body(c):
        ci, st, ck, tokbuf = c
        ck = refill_windows(ck, st, words_p)
        ck, st = ib._apply_builds(ck, st)

        rows = [st["state"], st["bitpos"], st["final"], st["hlit"],
                st["hdist"], st["hclen"], st["idx"], st["prev"],
                st["dst_pos"], st["need_build"], st["resume_state"],
                st["status"], _bc(st["cl_lo"], I32), _bc(st["cl_hi"], I32),
                nbits, cap, ck["win_word"], limit, dict_reach, in_base]
        st_pk = jnp.stack(rows).reshape(NROWS, R, 128)
        lens3 = _bc(st["lens_pk"], I32).reshape(LENS_WORDS, R, 128)
        win3 = _i3(ck["win"])
        # kernel-facing table layout (see _canon_pl): left-justified
        # code-space boundaries bound[l] = (first[l]+count[l]) << (15-l)
        # and premixed adjoff[l] = offs[l] - first[l]
        sh = (15 - jnp.arange(16, dtype=I32))[None, None, :]
        bound = (ck["first"] + ck["count"]) << sh
        adjoff = ck["offs"] - ck["first"]
        bound3 = jnp.transpose(bound, (1, 2, 0)).reshape(48, R, 128)
        adjoff3 = jnp.transpose(adjoff, (1, 2, 0)).reshape(48, R, 128)
        maxlen3 = _to3(ck["maxlen"])
        syms3 = _i3(ck["syms"])

        toks3, st_out, lens_out = decode_chunk_pl(
            st_pk, lens3, win3, bound3, adjoff3, maxlen3, syms3,
            K=K, dict_len=dict_len, has_dict=has_dict, interpret=interpret)

        st = dict(st)
        flat = st_out.reshape(NROWS, N)
        for k, r in zip(ST_KEYS, range(14)):
            v = flat[r]
            if k in ("cl_lo", "cl_hi"):
                v = _bc(v, U32)
            st[k] = v
        st["lens_pk"] = _bc(lens_out.reshape(LENS_WORDS, N), U32)
        toks = _bc(toks3.reshape(2 * K, N), U32)
        tokbuf = jax.lax.dynamic_update_slice(tokbuf, toks, (ci * 2 * K, 0))
        return ci + 1, st, ck, tokbuf

    ci, st, ck, tokbuf = jax.lax.while_loop(
        chunk_active, chunk_body, (jnp.asarray(0, I32), st, ck, tokbuf))
    if N != N0:
        tokbuf = tokbuf[:, :N0]
        st = {k: v[:N0] if v.ndim == 1 else v[:, :N0] for k, v in st.items()}
        ck = {k: v[:N0] for k, v in ck.items()}
    return tokbuf, {**st, **ck, "tok_rows": ci * 2 * K}
