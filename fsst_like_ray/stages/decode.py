"""Decode stage: stateless ``map_batches`` function (the state travels with
the data). Handles batches that mix rows from different encode blocks (e.g.
after Parquet rewrite/shuffle) by grouping rows on (codec, state).

Reference analog: decompressRows (sketch.cc:770-785) — rows are independently
decodable, so any subset in any order round-trips.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..codecs import CODECS
from .encode import list_buffers  # noqa: F401  (re-export for pipelines)


def _binary_buffers(arr) -> tuple[np.ndarray, np.ndarray]:
    """(bytes buffer, int64 offsets) of a binary/large_binary array —
    zero-copy on the DATA buffer (a ``cast(large_binary)`` of a binary
    column copies the payload bytes; only the small offsets are widened)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        arr = arr.cast(arr.type.value_type)
    if pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    off = arr.buffers()[1]
    dat = arr.buffers()[2]
    offsets = np.frombuffer(
        off, dtype=off_dtype, count=len(arr) + 1 + arr.offset
    )[arr.offset :].astype(np.int64)
    base = offsets[0]
    data = np.frombuffer(dat, dtype=np.uint8)[base : offsets[-1]]
    return data, offsets - base


def _group_indices(col) -> tuple[np.ndarray, list]:
    """(per-row group index, group values) for a possibly dictionary-encoded
    column — reuses parquet's existing dictionary instead of re-hashing
    every row's value bytes."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_dictionary(col.type):
        return (
            col.indices.to_numpy(zero_copy_only=False).astype(np.int64),
            col.dictionary.to_pylist(),
        )
    enc = pc.dictionary_encode(col)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    return (
        enc.indices.to_numpy(zero_copy_only=False).astype(np.int64),
        enc.dictionary.to_pylist(),
    )


def encoded_segment_runs(batch: pa.Table):
    """Segment an encoded batch into contiguous same-(codec, state) row
    runs. Returns ``(segments, pay_buf, pay_off, counts)`` where each
    segment is ``(lo, hi, codec_name, state_bytes)``. Rows sharing a
    (codec, state) form contiguous runs in practice (encode chunks are row
    ranges; Parquet rewrites preserve within-file order), so this is
    run-length segmentation, not a shuffle."""
    n = batch.num_rows
    counts = batch["n_tok"].to_numpy().astype(np.int64)
    pay_buf, pay_off = _binary_buffers(batch["payload"])
    ci, codec_vals = _group_indices(batch["codec"])
    si, state_vals = _group_indices(batch["state"])
    key = ci * (int(si.max()) + 1 if n else 1) + si
    seg = np.concatenate(
        ([0], np.flatnonzero(np.diff(key)) + 1, [n])
    ) if n else np.array([0, 0])
    segments = []
    for k in range(len(seg) - 1):
        lo, hi = int(seg[k]), int(seg[k + 1])
        if lo == hi:
            continue
        segments.append(
            (lo, hi, codec_vals[int(ci[lo])], state_vals[int(si[lo])] or b"")
        )
    return segments, pay_buf, pay_off, counts


def decode_batch(batch: pa.Table) -> pa.Table:
    """Encoded table → ``(doc_id, tokens:list<int32>, n_tok, source)``.

    Rows sharing a (codec, state) form CONTIGUOUS runs in practice (encode
    chunks are row ranges; Parquet rewrites preserve within-file order), so
    grouping is run-length segmentation and every payload/group access is a
    zero-copy slice — no per-byte gather/scatter. The decode path is
    memory-bandwidth-bound at full-node concurrency, so index-array traffic
    matters more than instruction count here."""
    n = batch.num_rows
    segments, pay_buf, pay_off, counts = encoded_segment_runs(batch)
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offsets[1:])
    values = np.empty(int(out_offsets[-1]), dtype=np.int32)

    for lo, hi, codec_name, state in segments:
        c = CODECS[codec_name]
        sub = pay_buf[pay_off[lo] : pay_off[hi]]
        so = pay_off[lo : hi + 1] - pay_off[lo]
        dec = c.decode(sub, so, counts[lo:hi], state)
        values[out_offsets[lo] : out_offsets[hi]] = dec

    if int(out_offsets[-1]) >= 2**31:
        # list<int32> offsets are int32; crossing 2 GiB of tokens in ONE
        # batch would silently wrap — fail loudly instead (callers control
        # batch_size; the encode pipeline's token-budget chunking keeps
        # batches far below this)
        raise ValueError(
            f"decode_batch: {int(out_offsets[-1])} tokens in one batch "
            "overflows list<int32> offsets; reduce batch_size"
        )
    tok_arr = pa.ListArray.from_arrays(
        pa.array(out_offsets.astype(np.int32), type=pa.int32()),
        pa.array(values, type=pa.int32()),
    )
    out = {
        "doc_id": batch["doc_id"],
        "tokens": tok_arr,
        "n_tok": batch["n_tok"],
        "source": batch["source"],
    }
    # user columns that rode through the encode (encode_table passes extras
    # along) come back out — only the codec machinery columns are internal
    internal = {"codec", "state", "payload", "payload_nbytes", "row_hash",
                "used_chars", "frag"}
    for name in batch.column_names:
        if name not in out and name not in internal:
            out[name] = batch[name]
    return pa.table(out)
