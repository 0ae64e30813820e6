"""FSST codec over token arrays: the int32 token stream is viewed as its
little-endian byte string (4 bytes/token) and compressed with the from-scratch
FSST symbol table in :mod:`fsst_like_ray.fsstlib`.

State = serialized symbol table. Training samples at most TRAIN_SAMPLE_BYTES
of the block (deterministic prefix stride), mirroring FSST's bounded sample.
Encode chunks the batch into ≤CHUNK_BYTES slices of whole rows to bound
temporary memory (rows are independently decodable, so chunking is free).
"""

from __future__ import annotations

import numpy as np

from . import Codec
from .. import fsstlib

TRAIN_SAMPLE_BYTES = 1 << 16
CHUNK_BYTES = 8 << 20


def _byte_view(values: np.ndarray, offsets: np.ndarray):
    data = np.ascontiguousarray(values, dtype=np.int32).view(np.uint8)
    return data, offsets.astype(np.int64) * 4


def _sample_rows(byte_offsets: np.ndarray, target: int) -> np.ndarray:
    """Deterministic row subset whose bytes total ≈ target: stride over rows."""
    n_rows = len(byte_offsets) - 1
    total = int(byte_offsets[-1])
    if total <= target or n_rows <= 1:
        return np.arange(n_rows)
    stride = max(1, int(np.ceil(total / target)))
    return np.arange(0, n_rows, stride)


class FsstCodec(Codec):
    name = "fsst"

    def train(self, values, offsets):
        data, bo = _byte_view(values, offsets)
        rows = _sample_rows(bo, TRAIN_SAMPLE_BYTES)
        counts = np.diff(bo)[rows]
        so = np.zeros(len(rows) + 1, dtype=np.int64)
        np.cumsum(counts, out=so[1:])
        sample = np.empty(int(so[-1]), dtype=np.uint8)
        for k, r in enumerate(rows):  # bounded by sample size, not block size
            sample[so[k] : so[k + 1]] = data[bo[r] : bo[r + 1]]
        table = fsstlib.train(sample, so)
        return table.serialize()

    def encode(self, values, offsets, state):
        table = fsstlib.SymbolTable.deserialize(state)
        data, bo = _byte_view(values, offsets)
        n_rows = len(bo) - 1
        bufs, pos = [], [np.zeros(1, dtype=np.int64)]
        start = 0
        while start < n_rows:
            end = int(
                np.searchsorted(bo, bo[start] + CHUNK_BYTES, side="left")
            )
            end = max(end, start + 1)
            end = min(end, n_rows)
            chunk_off = bo[start : end + 1] - bo[start]
            buf, po = fsstlib.encode(data[bo[start] : bo[end]], chunk_off, table)
            bufs.append(buf)
            pos.append(po[1:] + (pos[-1][-1] if pos else 0))
            start = end
        buf = np.concatenate(bufs) if bufs else np.zeros(0, dtype=np.uint8)
        po = np.concatenate(pos)
        return buf, po

    def decode(self, buf, payload_offsets, counts, state):
        table = fsstlib.SymbolTable.deserialize(state)
        out, ro = fsstlib.decode(
            buf, payload_offsets, table,
            out_nbytes=int(counts.astype(np.int64).sum()) * 4,
        )
        expected = counts.astype(np.int64) * 4
        if not np.array_equal(np.diff(ro), expected):
            raise ValueError("fsst decode: row size mismatch")
        return np.ascontiguousarray(out).view(np.int32)

    def estimate_size(self, values, offsets):
        return self.estimate(values, offsets)[0]

    def estimate(self, values, offsets):
        """Returns the trained state for reuse: an fsst table trained on the
        selection sample encodes any block (unseen bytes escape), so the
        auto path need not train twice."""
        state = self.train(values, offsets)
        # encode only a bounded sample for the estimate, extrapolate linearly
        data, bo = _byte_view(values, offsets)
        rows = _sample_rows(bo, TRAIN_SAMPLE_BYTES * 4)
        counts = np.diff(bo)[rows]
        so = np.zeros(len(rows) + 1, dtype=np.int64)
        np.cumsum(counts, out=so[1:])
        sample = np.empty(int(so[-1]), dtype=np.uint8)
        for k, r in enumerate(rows):
            sample[so[k] : so[k + 1]] = data[bo[r] : bo[r + 1]]
        table = fsstlib.SymbolTable.deserialize(state)
        buf, _ = fsstlib.encode(sample, so, table)
        sampled = int(so[-1])
        total = int(bo[-1])
        ratio = buf.size / sampled if sampled else 1.0
        return int(total * ratio) + len(state), state
