"""Incremental batched device decode with an explicit carry.

The device analog of the reference's byte-granular streaming API
(`infl_stream`, /root/reference/src/infl/stream.c:468-794): the decoder
carry pytree (ops.inflate_batch) is the `unz__stream_t` of the TPU path —
bit cursors, Huffman structures, block micro-state — and survives across
`feed()` calls at byte granularity.  Each feed appends per-lane input,
revives UNFINISHED lanes, resumes the lockstep decode, and accumulates the
emitted token segments; `outputs()` resolves everything decoded so far.

EFULL works like the reference's resize-then-continue protocol
(infl_resize_output, mem.c:277-288): `resize_output` raises per-lane
budgets and revives EFULL lanes through their saved resume state.
"""

from __future__ import annotations

import numpy as np

from defl_tpu.errors import FLAG_ZLIB, Result


class DeviceInflateSession:
    def __init__(self, n_lanes: int, dst_capacity: int,
                 flags: int = FLAG_ZLIB, dictionary: bytes | None = None,
                 chunk_steps: int = 128, feed_step_budget: int = 8192):
        self.n = n_lanes
        self.flags = flags
        self.dictionary = bytes(dictionary) if dictionary else None
        self.chunk_steps = chunk_steps
        self.feed_step_budget = feed_step_budget
        self.caps = np.full(n_lanes, int(dst_capacity), np.int32)
        self.bufs = [bytearray() for _ in range(n_lanes)]
        self.carry = None
        self.token_segments = []
        self._c_bucket = None

    # -- input ---------------------------------------------------------------
    def feed(self, new_data) -> list[Result]:
        """Append per-lane compressed chunks (None/b'' = no new data for
        that lane) and run the decoder as far as it can go."""
        import jax.numpy as jnp

        from defl_tpu.ops.inflate_batch import decode_tokens, revive_carry

        for i, d in enumerate(new_data):
            if d:
                self.bufs[i] += bytes(d)

        w_bytes = max(8, max(len(b) for b in self.bufs))
        w_pad = 256        # generous minimum: one compile bucket (see
        while w_pad * 4 < w_bytes + 8:   # session.py bucket rationale)
            w_pad *= 2
        words = np.zeros((self.n, w_pad), np.uint32)
        nbits = np.zeros(self.n, np.int32)
        for i, b in enumerate(self.bufs):
            arr = np.frombuffer(bytes(b) + b"\x00" * ((-len(b)) % 4), "<u4")
            words[i, : arr.size] = arr
            nbits[i] = 8 * len(b)

        dict_len = len(self.dictionary) if self.dictionary else 0
        carry = None
        if self.carry is not None:
            carry = revive_carry(self.carry)

        tokens, carry = decode_tokens(
            jnp.asarray(words), jnp.asarray(nbits),
            jnp.asarray(np.full(self.n, self.flags & FLAG_ZLIB, np.int32)),
            jnp.asarray(self.caps),
            T=self.feed_step_budget, K=self.chunk_steps,
            dict_len=dict_len, has_dict=self.dictionary is not None,
            carry=carry)
        self.carry = carry
        self._last_words = words
        self.token_segments.append(np.asarray(tokens))
        return self.statuses()

    def resize_output(self, new_capacity) -> None:
        """Raise per-lane output budgets and revive EFULL lanes."""
        from defl_tpu.ops.inflate_batch import revive_carry

        self.caps = (np.full(self.n, int(new_capacity), np.int32)
                     if np.isscalar(new_capacity)
                     else np.asarray(new_capacity, np.int32))
        if self.carry is not None:
            self.carry = revive_carry(self.carry, new_cap=self.caps)

    # -- results -------------------------------------------------------------
    def statuses(self) -> list[Result]:
        from defl_tpu.ops.inflate_batch import STATUS_RUNNING

        s = np.asarray(self.carry["status"])
        return [Result(int(v)) if int(v) != STATUS_RUNNING
                else Result.UNFINISHED for v in s]

    def outputs(self):
        """Resolve all tokens decoded so far -> (statuses, list[bytes])."""
        dst_pos = np.asarray(self.carry["dst_pos"])
        toks = np.concatenate(self.token_segments, axis=0)  # [sumT, N]
        C = int(self.caps.max())

        from defl_tpu.runtime.native import available, native_resolve_tokens

        if available():
            out = native_resolve_tokens(
                np.ascontiguousarray(toks.T), self._last_words, dst_pos, C,
                self.dictionary)
        else:
            import jax.numpy as jnp

            from defl_tpu.ops.resolve import resolve_tokens
            from defl_tpu.runtime.pack import pack_dictionary

            dw = None
            dl = 0
            if self.dictionary:
                dw_np, dl = pack_dictionary(self.dictionary)
                dw = jnp.asarray(dw_np)
            out = np.asarray(resolve_tokens(
                jnp.asarray(toks), jnp.asarray(self._last_words),
                jnp.asarray(dst_pos), C=C, dict_len=dl, dict_words=dw))
        return self.statuses(), [out[i, : int(dst_pos[i])].tobytes()
                                 for i in range(self.n)]
