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
    """(bytes buffer, int64 offsets) of a binary/large_binary array."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_dictionary(arr.type):
        arr = arr.cast(arr.type.value_type)
    arr = arr.cast(pa.large_binary())
    off = arr.buffers()[1]
    dat = arr.buffers()[2]
    offsets = np.frombuffer(off, dtype=np.int64, count=len(arr) + 1 + arr.offset)[
        arr.offset :
    ]
    base = offsets[0]
    data = np.frombuffer(dat, dtype=np.uint8)[base : offsets[-1]]
    return data, (offsets - base).astype(np.int64)


def decode_batch(batch: pa.Table) -> pa.Table:
    """Encoded table → ``(doc_id, tokens:list<int32>, n_tok, source)``."""
    n = batch.num_rows
    counts = batch["n_tok"].to_numpy().astype(np.int64)
    out_offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=out_offsets[1:])
    values = np.zeros(int(out_offsets[-1]), dtype=np.int32)

    pay_buf, pay_off = _binary_buffers(batch["payload"])

    # group rows by (codec, state) — dictionary-encode to find the groups
    codec_d = pc.dictionary_encode(
        batch["codec"].combine_chunks()
        if isinstance(batch["codec"], pa.ChunkedArray)
        else batch["codec"]
    )
    state_d = pc.dictionary_encode(
        batch["state"].cast(pa.binary()).combine_chunks()
        if isinstance(batch["state"], pa.ChunkedArray)
        else batch["state"].cast(pa.binary())
    )
    if isinstance(codec_d, pa.ChunkedArray):
        codec_d = codec_d.combine_chunks()
    if isinstance(state_d, pa.ChunkedArray):
        state_d = state_d.combine_chunks()
    ci = codec_d.indices.to_numpy().astype(np.int64)
    si = state_d.indices.to_numpy().astype(np.int64)
    group_key = ci * (si.max() + 1 if n else 1) + si
    for key in np.unique(group_key):
        rows = np.flatnonzero(group_key == key)
        codec_name = codec_d.dictionary[int(ci[rows[0]])].as_py()
        state = state_d.dictionary[int(si[rows[0]])].as_py() or b""
        c = CODECS[codec_name]
        # gather this group's payload bytes into a contiguous sub-buffer
        nbytes = (pay_off[rows + 1] - pay_off[rows]).astype(np.int64)
        so = np.zeros(len(rows) + 1, dtype=np.int64)
        np.cumsum(nbytes, out=so[1:])
        tot = int(so[-1])
        sub = np.empty(tot, dtype=np.uint8)
        if tot:
            wi = np.arange(tot, dtype=np.int64) - np.repeat(so[:-1], nbytes)
            src = np.repeat(pay_off[rows], nbytes) + wi
            sub = pay_buf[src]
        dec = c.decode(sub, so, counts[rows], state)
        # scatter decoded tokens into the output slices
        g_counts = counts[rows]
        tot_v = int(g_counts.sum())
        if tot_v:
            wi = np.arange(tot_v, dtype=np.int64) - np.repeat(
                np.cumsum(g_counts) - g_counts, g_counts
            )
            dst = np.repeat(out_offsets[rows], g_counts) + wi
            values[dst] = dec

    tok_arr = pa.ListArray.from_arrays(
        pa.array(out_offsets.astype(np.int32), type=pa.int32()),
        pa.array(values, type=pa.int32()),
    )
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "tokens": tok_arr,
            "n_tok": batch["n_tok"],
            "source": batch["source"],
        }
    )
