"""Encode stage: a stateful callable class for ``ds.map_batches``.

One Ray Data block ≅ one reference 64Ki-row block (src/BenchmarkDriver.hpp:12):
codec state (symbol table / dictionary / width) is trained per batch on that
batch's own rows (reference: src/BenchmarkDriver.cpp:100-101), then every row
is encoded into an independently decodable payload. The state travels WITH the
data as a dictionary-encoded binary column, so decode needs no side channel
(SURVEY.md §4 "state sharing").

Used as ``ds.map_batches(EncoderActor, fn_constructor_kwargs=..., batch_format
="pyarrow", concurrency=N)`` — actor pool so per-codec setup happens once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..codecs import CODECS, select_codec

ENCODED_SCHEMA_FIELDS = [
    "doc_id",
    "n_tok",
    "source",
    "codec",
    "state",
    "payload",
    "payload_nbytes",
]


def list_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Zero-copy extraction of (values:int32, offsets:int64) from a
    list<int32> array, handling chunk slices."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    off = arr.offsets.to_numpy().astype(np.int64)
    base = off[0]
    values = arr.values.to_numpy(zero_copy_only=False)[base : off[-1]]
    return np.ascontiguousarray(values, dtype=np.int32), off - base


def payload_array(buf: np.ndarray, payload_offsets: np.ndarray) -> pa.Array:
    """Zero-copy large_binary array from (buffer, offsets)."""
    n = len(payload_offsets) - 1
    return pa.Array.from_buffers(
        pa.large_binary(),
        n,
        [None, pa.py_buffer(payload_offsets.astype(np.int64)), pa.py_buffer(buf)],
    )


def encode_table(batch: pa.Table, codec: str = "auto", codec_names=None) -> pa.Table:
    values, offsets = list_buffers(batch["tokens"])
    if codec == "auto":
        name, _est = select_codec(values, offsets, codec_names)
    else:
        name = codec
    c = CODECS[name]
    state = c.train(values, offsets)
    buf, po = c.encode(values, offsets, state)
    n = batch.num_rows
    state_col = pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, dtype=np.int32)), pa.array([state], type=pa.binary())
    )
    codec_col = pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, dtype=np.int32)), pa.array([name], type=pa.string())
    )
    n_tok = batch["n_tok"] if "n_tok" in batch.column_names else pa.array(
        np.diff(offsets).astype(np.int32), type=pa.int32()
    )
    source = (
        batch["source"]
        if "source" in batch.column_names
        else pa.nulls(n, type=pa.string())
    )
    out = {
        "doc_id": batch["doc_id"],
        "n_tok": n_tok,
        "source": source,
        "codec": codec_col,
        "state": state_col,
        "payload": payload_array(buf, po),
        "payload_nbytes": pa.array(np.diff(po), type=pa.int64()),
    }
    # pass through any extra columns (e.g. the lineage fragment key)
    for name in batch.column_names:
        if name not in out and name != "tokens":
            out[name] = batch[name]
    return pa.table(out)


class EncoderActor:
    """Stateful map_batches callable: holds the codec registry + selection
    config; one instance per actor, reused across that actor's batches."""

    def __init__(self, codec: str = "auto", codec_names: list[str] | None = None):
        self.codec = codec
        self.codec_names = codec_names
        if codec != "auto" and codec not in CODECS:
            raise ValueError(f"unknown codec {codec!r}")

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        return encode_table(batch, self.codec, self.codec_names)
