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
