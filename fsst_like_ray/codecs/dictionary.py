"""Dictionary codec: block-level sorted value dictionary + bit-packed indices.

State blob: ``width:uint8 | n_dict:uint32le | dict values:int32le[n_dict]``.
Per-row payload: indices packed at ``width`` bits (byte-aligned per row).
The dictionary is trained on the whole block (cheap ``np.unique``), matching
the reference's block-local compression context (src/BenchmarkDriver.cpp:100-101).
"""

from __future__ import annotations

import numpy as np

from . import Codec
from .bitutil import pack_rows, unpack_rows, packed_row_nbytes


def _parse_state(state: bytes):
    width = state[0]
    n = int(np.frombuffer(state, dtype="<u4", count=1, offset=1)[0])
    dict_values = np.frombuffer(state, dtype="<i4", count=n, offset=5)
    return width, dict_values


class DictCodec(Codec):
    name = "dict"

    def train(self, values, offsets):
        uniq = np.unique(np.ascontiguousarray(values, dtype=np.int32))
        width = max(int(len(uniq) - 1).bit_length(), 0) if len(uniq) else 0
        return (
            bytes([width])
            + np.uint32(len(uniq)).tobytes()
            + uniq.astype("<i4").tobytes()
        )

    def encode(self, values, offsets, state):
        width, dict_values = _parse_state(state)
        values = np.ascontiguousarray(values, dtype=np.int32)
        idx = np.searchsorted(dict_values, values)
        if values.size and not np.array_equal(dict_values[idx], values):
            raise ValueError("dict codec: value missing from trained dictionary")
        return pack_rows(idx.astype(np.uint32), offsets, width)

    def train_encode(self, values, offsets):
        """Fused path: unique+inverse in ONE pass — the C hash kernel
        (native.dict_unique_inverse, O(n) + a u·log u sort of the SMALL
        unique array) when a compiler is present, else NumPy's
        ``np.unique(return_inverse=True)`` (one full O(n log n) sort).
        Both produce the identical sorted dictionary and codes (parity
        pinned in tests/test_native.py); this fused kernel was the
        hottest dict stage once auto started picking dict on merits."""
        from .. import native

        v = np.ascontiguousarray(values, dtype=np.int32)
        if native.lib is not None:
            uniq, inv = native.dict_unique_inverse(v)
        else:
            uniq, inv = np.unique(v, return_inverse=True)
        width = max(int(len(uniq) - 1).bit_length(), 0) if len(uniq) else 0
        state = (
            bytes([width])
            + np.uint32(len(uniq)).tobytes()
            + uniq.astype("<i4").tobytes()
        )
        buf, po = pack_rows(inv.astype(np.uint32, copy=False), offsets, width)
        return state, buf, po

    def decode(self, buf, payload_offsets, counts, state):
        width, dict_values = _parse_state(state)
        idx = unpack_rows(buf, payload_offsets, counts, width)
        if idx.size == 0:
            return np.zeros(0, dtype=np.int32)
        return dict_values[idx].astype(np.int32)

    def estimate_size(self, values, offsets):
        uniq = np.unique(np.ascontiguousarray(values, dtype=np.int32))
        width = max(int(len(uniq) - 1).bit_length(), 0) if len(uniq) else 0
        counts = np.diff(offsets)
        return int(packed_row_nbytes(counts, width).sum()) + 5 + 4 * len(uniq)

    def estimate(self, values, offsets, full_tokens=None, full_rows=None):
        """Full-block estimate with sublinear dictionary growth: the unique
        count follows a power law in sample size for heavy-tailed token
        streams (Heaps' law), so u(full) is extrapolated from the unique
        counts of the half- and whole-sample, clamped to [u_sample,
        full_tokens]. Naive linear scaling penalized dict by charging the
        sample's full dictionary against half a block's tokens — auto then
        picked fsst on blocks where dict actually compresses better."""
        n = int(offsets[-1] - offsets[0])
        if full_tokens is None or n == 0 or full_tokens <= n:
            return self.estimate_size(values, offsets), None
        v = np.ascontiguousarray(values, dtype=np.int32)
        u_s = len(np.unique(v))
        u_h = len(np.unique(v[: n // 2])) if n // 2 else u_s
        u_q = len(np.unique(v[: n // 4])) if n // 4 else u_h
        # growth exponent per doubling DECAYS as the heavy tail thins out —
        # a straight power-law fit over-extrapolated u by ~8% (enough to tip
        # the packed width by a bit); three sample points give the decay
        # rate, and the exponent is geometrically damped per extrapolated
        # doubling (measured 3.7% mean error, 0/16 wrong widths, vs 7.9%
        # and 3/16 for the two-point power law on the fixture corpus)
        a12 = np.log(max(u_h, 1) / max(u_q, 1)) / np.log(2)
        a23 = np.log(max(u_s, 1) / max(u_h, 1)) / np.log(2)
        # unique growth can only decelerate with scale under any stationary
        # distribution — clamp the decay at 1 so a pathological sample order
        # (flat first half, all-new second half) cannot amplify the exponent
        # geometrically and overflow 2**exp_sum to inf (which would saturate
        # u_est and wrongly disqualify dict)
        decay = min(a23 / a12, 1.0) if a12 > 0 else 1.0
        d = np.log2(full_tokens / n)
        a, exp_sum = a23, 0.0
        while d > 0:
            step = min(1.0, d)
            a *= decay
            exp_sum += a * step
            d -= step
        u_est = int(np.clip(u_s * 2.0 ** min(exp_sum, 62), u_s, full_tokens))
        width = max(int(u_est - 1).bit_length(), 0) if u_est else 0
        rows = full_rows if full_rows is not None else len(offsets) - 1
        # per-row payloads are byte-aligned: expected padding ≈ 0.5 B/row
        payload = (full_tokens * width + 7) // 8 + rows // 2
        return int(payload) + 5 + 4 * u_est, None
