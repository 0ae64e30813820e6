"""Delta-of-delta codec: per-row first value + delta-coded first-difference
stream — the Gorilla timestamp idea (Pelkonen et al., VLDB'15 §4.1.1)
re-expressed in this registry's block-packed layout.

Where :mod:`delta` wins on smooth sequences, delta2 wins when the first
differences are themselves near-constant (arithmetic progressions: ids from
a sequence counter, fixed-rate timestamps, row numbers): the second
differences concentrate at 0 and pack at width 0-2 regardless of stride.

Layout per non-empty row: ``v0:int32le`` (4 bytes) + the row's first-delta
stream encoded by :class:`DeltaCodec`'s own row format (its first delta raw,
remaining ``c-2`` values as zigzag(second difference) packed at the block
width). Empty rows take 0 bytes. State = 1 byte (second-difference width) —
identical contract to delta, including the loud overflow guard when a
sample-trained width is narrower than a block's true second differences.

All arithmetic mod 2^32 (uint32 wraparound), so decode is exact for any
int32 input; composition keeps the proof local — each layer is the already
pinned delta inverse.
"""

from __future__ import annotations

import numpy as np

from . import Codec, _as_u32
from .bitutil import bit_width_for, packed_row_nbytes
from .delta import DeltaCodec, _delta_stream


def _unzigzag(zz: np.ndarray) -> np.ndarray:
    return (zz >> np.uint32(1)) ^ (np.uint32(0) - (zz & np.uint32(1)))


class Delta2Codec(Codec):
    name = "delta2"

    _inner = DeltaCodec()

    def train(self, values, offsets):
        zz, doff, _, _ = _delta_stream(values, offsets)
        return self._inner.train(_unzigzag(zz).view(np.int32), doff)

    def encode(self, values, offsets, state):
        zz, doff, counts, nz = _delta_stream(values, offsets)
        inner_buf, inner_po = self._inner.encode(
            _unzigzag(zz).view(np.int32), doff, state
        )
        inner_nbytes = np.diff(inner_po)
        nbytes = np.where(nz, inner_nbytes + 4, 0).astype(np.int64)
        out_offsets = np.zeros(len(counts) + 1, dtype=np.int64)
        np.cumsum(nbytes, out=out_offsets[1:])
        buf = np.zeros(int(out_offsets[-1]), dtype=np.uint8)

        firsts = _as_u32(values)[offsets[:-1][nz]]
        ref_pos = (
            out_offsets[:-1][nz, None] + np.arange(4, dtype=np.int64)[None, :]
        )
        buf[ref_pos.ravel()] = firsts.view(np.uint8).reshape(-1, 4).ravel()
        total = int(inner_nbytes.sum())
        if total:
            row_of_byte = np.repeat(np.arange(len(counts)), inner_nbytes)
            within = np.arange(total, dtype=np.int64) - np.repeat(
                inner_po[:-1], inner_nbytes
            )
            dst = out_offsets[:-1][row_of_byte] + 4 + within
            buf[dst] = inner_buf
        return buf, out_offsets

    def decode(self, buf, payload_offsets, counts, state):
        n_rows = len(counts)
        counts = np.asarray(counts, dtype=np.int64)
        nz = counts > 0
        n = int(counts.sum())

        firsts = np.zeros(int(nz.sum()), dtype=np.uint32)
        if firsts.size:
            ref_pos = (
                payload_offsets[:-1][nz, None]
                + np.arange(4, dtype=np.int64)[None, :]
            )
            firsts = (
                np.ascontiguousarray(buf[ref_pos.ravel()])
                .view(np.uint32)
                .copy()
            )
        inner_nbytes = np.where(
            nz, np.diff(payload_offsets) - 4, 0
        ).astype(np.int64)
        inner_po = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(inner_nbytes, out=inner_po[1:])
        total = int(inner_po[-1])
        inner_buf = np.zeros(total, dtype=np.uint8)
        if total:
            row_of_byte = np.repeat(np.arange(n_rows), inner_nbytes)
            within = np.arange(total, dtype=np.int64) - np.repeat(
                inner_po[:-1], inner_nbytes
            )
            src = payload_offsets[:-1][row_of_byte] + 4 + within
            inner_buf = np.ascontiguousarray(buf[src])
        dcounts = np.maximum(counts - 1, 0)
        du = _as_u32(
            self._inner.decode(inner_buf, inner_po, dcounts, state)
        )

        # firsts at row starts + wrapped deltas elsewhere → cumsum per row
        # (the same exact-inverse reconstruction delta.decode pins)
        offsets = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        starts_nz = offsets[:-1][nz]
        full = np.empty(n, dtype=np.uint64)
        mask = np.ones(n, dtype=bool)
        mask[starts_nz] = False
        full[starts_nz] = firsts
        full[mask] = du
        g = np.cumsum(full)
        base = g[starts_nz] - firsts
        vals = (g - np.repeat(base, counts[nz])).astype(np.uint32)
        return vals.view(np.int32)

    def estimate_size(self, values, offsets):
        zz, doff, counts, nz = _delta_stream(values, offsets)
        zz2, _, _, _ = _delta_stream(_unzigzag(zz).view(np.int32), doff)
        width = bit_width_for(zz2)
        ddcounts = np.maximum(counts - 2, 0)
        return int(
            (
                packed_row_nbytes(ddcounts, width)
                + np.where(nz, 4, 0)
                + np.where(counts > 1, 4, 0)
            ).sum()
        ) + 1
