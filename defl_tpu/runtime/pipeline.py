"""Overlapped batch pipeline: device decode ‖ host LZ77 resolve.

The production shape of the hybrid inflate (SURVEY §7.3): the TPU runs
pass 1 (bitstream → token stream) for batch i+1 while the host's
multithreaded C++ resolver (native/defl_host.cc) runs pass 2 for batch i.
JAX async dispatch gives the device-side overlap for free — a jitted
decode call returns immediately and queues on the device — so the
pipeline is a simple depth-2 double buffer:

    dispatch decode(i+1)  →  fetch tokens(i)  →  resolve(i) on threads

The reference's equivalent "number" is a single wall-clock over the whole
decode (`/root/reference/test/test_files.c:242-250`); `pipeline_inflate`
returns per-batch results plus one wall-clock measurement over all
batches, which bench.py reports.

The token fetch is a real pipeline stage (its own thread).  On real
hosts it rides PCIe/DMA at tens of GB/s; this dev environment tunnels
device↔host at ~14 MB/s (axon relay artifact), so bench.py also times a
prefetched variant to expose the decode‖resolve overlap itself.
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from defl_tpu.errors import FLAG_ZLIB, Result
from defl_tpu.runtime.pack import pack_streams


def pipeline_inflate(stream_batches, dst_capacity: int, flags=FLAG_ZLIB,
                     chunk_steps: int | None = None,
                     n_threads: int | None = None,
                     as_bytes: bool = False, sink=None, _fetch=None):
    """Decode a sequence of equal-shaped stream batches, overlapped.

    stream_batches: list of lists of compressed streams (each inner list
    is one device batch; equal lane counts keep one compiled shape).
    dst_capacity: per-stream output capacity (one bucket for the run).
    as_bytes: materialise per-stream ``bytes`` objects (copies every
    output once more; the zero-copy default returns the resolved
    ``[N, C]`` array directly).
    sink: optional ``f(i, status, out, dst_pos) -> value`` consuming each
    batch as it resolves (per_batch then holds the sink's return values).
    Use it to stream outputs to their destination instead of retaining
    every batch's arrays in memory.  Sinks normally run in batch order
    on one thread; a batch that needs a host retry (pathological lanes)
    has its sink called from the retry worker instead — possibly out of
    order and concurrent with the next batch's sink — so sinks must not
    assume ordering across batches.
    _fetch: test/bench hook — ``f(tokens, st) -> (toks_nt, dst_pos,
    status, bitpos)`` replacing the device→host fetch.

    Returns (per_batch, wall_seconds); per_batch entries are
    (results, outputs) with ``outputs = list[bytes]`` under ``as_bytes``,
    else (status int32 [N], out uint8 [N, C], dst_pos int32 [N]).
    """
    import jax.numpy as jnp

    from defl_tpu.ops.inflate_batch import step_budget
    from defl_tpu.runtime.native import native_resolve_tokens
    from defl_tpu.runtime.session import _pick_decoder

    decode_tokens = _pick_decoder()
    if chunk_steps is None:
        chunk_steps = 256 if "pl" in decode_tokens.__name__ else 128
    zf = flags & FLAG_ZLIB
    C = int(dst_capacity)
    T = step_budget(C)

    def default_fetch(tokens, st):
        # fetch only the occupied token rows (tok_rows = chunks actually
        # run x slots/chunk; finished batches leave the tail all-NOP),
        # bucketed so the slice/transpose reuses a few compiled shapes.
        # Per-lane metadata crosses in ONE transfer: each device->host
        # round trip costs tens of ms on tunneled links and the sync
        # sits on the pipeline's critical path.
        rows = min(tokens.shape[0], -(-int(st["tok_rows"]) // 4096) * 4096)
        meta = np.asarray(jnp.stack([st["dst_pos"], st["status"],
                                     st["bitpos"]]))
        return (np.asarray(jnp.transpose(tokens[:rows])),
                meta[0], meta[1], meta[2])

    fetch = _fetch or default_fetch

    if n_threads is None:
        import os

        # leave one core for the thread that feeds the device: resolve
        # saturating every host core starves the device driver and
        # serialises the stages this pipeline exists to overlap
        n_threads = max(1, (os.cpu_count() or 2) - 1)

    # pack each distinct batch once (repeated list objects — benchmarks,
    # replayed batches — share one packing and one device upload)
    packed_cache = {}
    packed = []
    dev_in = []
    for b in stream_batches:
        key = id(b)
        if key not in packed_cache:
            p = pack_streams(b, zf, C)
            packed_cache[key] = (p, (jnp.asarray(p.words),
                                     jnp.asarray(p.nbits),
                                     jnp.asarray(p.zflag),
                                     jnp.asarray(p.dst_cap)))
        p, d = packed_cache[key]
        packed.append(p)
        dev_in.append(d)
    for _, d in packed_cache.values():  # sync uploads before the timed
        for a in d:                     # loop (host->device transfers are
            np.asarray(a.ravel()[0])    # slow on tunneled dev envs)

    # One resolve runs at a time (single-worker executor) and sink /
    # as_bytes modes consume the array before returning, so one
    # pre-faulted output buffer serves every batch — a fresh 512MB
    # np.zeros per batch costs ~0.2s of page faults inside the timed loop.
    reuse_out = sink is not None or as_bytes
    out_buf = None
    if reuse_out:
        out_buf = np.empty((max(p.n for p in packed), C), np.uint8)
        out_buf[:] = 0  # pre-fault outside the timed loop

    _RETRY = object()  # per_batch marker: (_RETRY, future)

    def finish_one(i, n, status, dst_pos, out):
        if sink is not None:
            return sink(i, status[:n], out[:n], dst_pos[:n])
        if as_bytes:
            return ([Result(int(s)) for s in status[:n]],
                    [out[k, : int(dst_pos[k])].tobytes() for k in range(n)])
        return status[:n], out[:n], dst_pos[:n]

    def resolve_one(i, toks_nt, dst_pos, status):
        t0 = time.perf_counter()
        out = native_resolve_tokens(
            toks_nt, packed[i].words, dst_pos, C, n_threads=n_threads,
            out=None if out_buf is None else out_buf[: toks_nt.shape[0]])
        n = len(stream_batches[i])
        # step-budget-exhausted lanes (status 127: adversarial block
        # floods or banded-refill starvation) retry on the host engine —
        # valid input must never surface as UNFINISHED.  The retry can
        # take seconds per pathological lane, so it runs on its own
        # worker: holding the resolve worker here would bubble the WHOLE
        # pipeline instead of just this batch's slot.  Cost when a retry
        # fires and the output buffer is shared: one copy of this batch's
        # rows (the next resolve reuses the buffer immediately).
        rerun = [k for k in range(n) if int(status[k]) == 127]
        if dbg:
            print(f"  resolve[{i}] {time.perf_counter()-t0:.3f}"
                  + (f" retry={rerun}" if rerun else ""), flush=True)
        if not rerun:
            return finish_one(i, n, status, dst_pos, out)
        out_r = np.array(out[:n], copy=True) if reuse_out else out
        status = np.array(status, copy=True)
        dst_pos = np.array(dst_pos, copy=True)

        def retry():
            from defl_tpu.runtime.native import native_inflate_batch

            # single-threaded: this runs concurrently with the next
            # batches' resolves — don't steal their cores for a
            # containment path
            rs, os_ = native_inflate_batch(
                [stream_batches[i][k] if isinstance(
                    stream_batches[i][k], (bytes, bytearray))
                 else b"".join(bytes(c) for c in stream_batches[i][k])
                 for k in rerun], C, flags, n_threads=1)
            for j, k in enumerate(rerun):
                status[k] = int(rs[j])
                dst_pos[k] = len(os_[j])
                out_r[k, : len(os_[j])] = np.frombuffer(os_[j], np.uint8)
            return finish_one(i, n, status, dst_pos, out_r)

        return _RETRY, retry_ex.submit(retry)

    # Warm the decode executable outside the timed region (compile is a
    # build-time cost; the reference's analog is compiled ahead of time).
    w, nb, zfl, cp = dev_in[0]
    _, st_w = decode_tokens(w, nb, zfl, cp, T=T, K=chunk_steps)
    np.asarray(st_w["status"].ravel()[0])

    per_batch = [None] * len(stream_batches)
    retry_ex = ThreadPoolExecutor(max_workers=1)
    t0 = time.perf_counter()
    # Depth-2 double buffer.  Order per iteration:
    #   fetch(i) -> dispatch decode(i+1) -> wait resolve(i-1) -> submit
    #   resolve(i)
    # The fetch must complete before decode(i+1) is queued (device->host
    # reads interleave poorly with a queued kernel on this runtime), but
    # decode(i+1) must be queued BEFORE waiting on resolve(i-1) — the
    # device would otherwise idle for the resolve remainder every batch.
    # Alternatives measured and rejected on the tunneled dev link
    # (single-thread fetch+resolve worker; separate fetch and resolve
    # threads with main-thread dispatch only): the transport serialises
    # device->host reads against compute, so moving the sync off the
    # critical path bought nothing and cost pipeline depth — see NOTES.
    import os

    dbg = os.environ.get("DEFL_PIPE_DEBUG") == "1"
    B = len(dev_in)
    with ThreadPoolExecutor(max_workers=1) as ex:
        pending = None  # (index, resolve future)
        w, nb, zfl, cp = dev_in[0]
        tokens, st = decode_tokens(w, nb, zfl, cp, T=T, K=chunk_steps)
        for i in range(B):
            t1 = time.perf_counter()
            toks_nt, dst_pos, status, _ = fetch(tokens, st)
            t2 = time.perf_counter()
            if i + 1 < B:
                w, nb, zfl, cp = dev_in[i + 1]
                tokens, st = decode_tokens(w, nb, zfl, cp, T=T,
                                           K=chunk_steps)
            t3 = time.perf_counter()
            if pending is not None:
                j, fut = pending
                per_batch[j] = fut.result()
            t4 = time.perf_counter()
            pending = (i, ex.submit(resolve_one, i, toks_nt, dst_pos,
                                    status))
            if dbg:
                print(f"pipe[{i}] fetch {t2-t1:.3f} dispatch {t3-t2:.3f} "
                      f"wait {t4-t3:.3f}", flush=True)
        j, fut = pending
        per_batch[j] = fut.result()
    # join deferred retries (rare; confined to their batch slots)
    for j, v in enumerate(per_batch):
        if isinstance(v, tuple) and len(v) == 2 and v[0] is _RETRY:
            per_batch[j] = v[1].result()
    retry_ex.shutdown()
    wall = time.perf_counter() - t0
    return per_batch, wall
