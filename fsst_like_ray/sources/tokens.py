"""Deterministic generator for the north-rule input table
``(doc_id:string, tokens:list<int32>, n_tok:int32, source:string)``.

Row content depends only on (seed, global row id): generation happens in
fixed 8192-row chunks, each driven by a Philox stream keyed on
(seed, chunk id), so any partitioning / retry produces identical rows
(FIXTURES.md §1; SURVEY.md §7.4 determinism requirement).

Planted regularities so every codec wins somewhere:
- source=="code" rows draw from a 256-value vocabulary (dict/FSST win);
- 5% of rows are long runs of a repeated token (RLE wins);
- 5% of rows sit in the narrow band [1000, 1255] (FOR+bitpack wins);
- 1% of rows are uniform over the full vocab (incompressible → plain);
- the rest are Zipfian (s≈1.1) over vocab 50_257.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50_257
CHUNK = 8192
SOURCES = np.array(["web", "books", "code", "wiki"])
SOURCE_P = np.array([0.70, 0.15, 0.10, 0.05])


def _gen_chunk(seed: int, chunk_id: int, n_rows: int, max_tok: int = 8192):
    rng = np.random.Generator(np.random.Philox(key=[seed, chunk_id]))
    n_tok = np.clip(
        np.rint(rng.lognormal(5.5, 1.2, n_rows)).astype(np.int64), 1, max_tok
    )
    src_idx = rng.choice(len(SOURCES), size=n_rows, p=SOURCE_P)
    cls_draw = rng.random(n_rows)
    # class: 0=zipf, 1=rle, 2=band, 3=uniform; source=="code" forces small vocab
    cls = np.zeros(n_rows, dtype=np.int8)
    cls[cls_draw < 0.05] = 1
    cls[(cls_draw >= 0.05) & (cls_draw < 0.10)] = 2
    cls[(cls_draw >= 0.10) & (cls_draw < 0.11)] = 3

    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    total = int(offsets[-1])
    values = ((rng.zipf(1.1, total) - 1) % VOCAB).astype(np.int32)

    code_rows = np.flatnonzero((src_idx == 2) & (cls == 0))
    for r in code_rows:
        s, e = offsets[r], offsets[r + 1]
        values[s:e] = values[s:e] % 256
    for r in np.flatnonzero(cls == 1):  # long runs of a repeated token
        s, e = offsets[r], offsets[r + 1]
        n = int(e - s)
        n_runs = max(1, n // 64)
        run_vals = rng.integers(0, VOCAB, n_runs).astype(np.int32)
        reps = np.full(n_runs, n // n_runs, dtype=np.int64)
        reps[: n - int(reps.sum())] += 1
        values[s:e] = np.repeat(run_vals, reps)
    for r in np.flatnonzero(cls == 2):  # narrow band
        s, e = offsets[r], offsets[r + 1]
        values[s:e] = rng.integers(1000, 1256, int(e - s)).astype(np.int32)
    for r in np.flatnonzero(cls == 3):  # incompressible
        s, e = offsets[r], offsets[r + 1]
        values[s:e] = rng.integers(0, 2**31 - 1, int(e - s)).astype(np.int32)

    return values, offsets, n_tok, SOURCES[src_idx]


def tokens_table(
    n_rows: int, seed: int = 42, start_row: int = 0, max_tok: int = 8192
) -> pa.Table:
    """Rows [start_row, start_row + n_rows) of the deterministic corpus."""
    parts = []
    row = start_row
    end = start_row + n_rows
    while row < end:
        cid = row // CHUNK
        c0 = cid * CHUNK
        take_lo = row - c0
        take_hi = min(end - c0, CHUNK)
        values, offsets, n_tok, src = _gen_chunk(seed, cid, CHUNK, max_tok)
        sl = slice(take_lo, take_hi)
        v = values[offsets[take_lo] : offsets[take_hi]]
        o = (offsets[take_lo : take_hi + 1] - offsets[take_lo]).astype(np.int32)
        ids = [f"doc-{i:08d}" for i in range(c0 + take_lo, c0 + take_hi)]
        tok_arr = pa.ListArray.from_arrays(
            pa.array(o, type=pa.int32()), pa.array(v, type=pa.int32())
        )
        parts.append(
            pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.string()),
                    "tokens": tok_arr,
                    "n_tok": pa.array(n_tok[sl].astype(np.int32), type=pa.int32()),
                    "source": pa.array(src[sl], type=pa.string()),
                }
            )
        )
        row = c0 + take_hi
    return pa.concat_tables(parts)


def write_tokens_parquet(
    path: str,
    n_rows: int,
    seed: int = 42,
    rows_per_file: int = 65536,
    max_tok: int = 8192,
    row_group_size: int = 2048,
) -> str:
    """Write the corpus as a directory of Parquet shards (resumable layout:
    one file per fixed row range; existing shards are kept)."""
    os.makedirs(path, exist_ok=True)
    for start in range(0, n_rows, rows_per_file):
        n = min(rows_per_file, n_rows - start)
        fp = os.path.join(path, f"part-{start:010d}-{n}.parquet")
        if os.path.exists(fp):
            continue
        pq.write_table(
            tokens_table(n, seed=seed, start_row=start, max_tok=max_tok),
            fp,
            row_group_size=row_group_size,
        )
    return path


def derive_tokens_from_documents(batch: pa.Table) -> pa.Table:
    """Deterministically derive a tokens table from the testdata ``documents``
    table: tokens = Unicode code points of ``text`` (SQL-mirrorable, see
    __ray_entry__.oracle_sql). Output schema = the north-rule input shape."""
    texts = batch["text"].to_pylist()
    ids = batch["doc_id"].to_pylist()
    src = batch["source"].to_pylist() if "source" in batch.column_names else ["?"] * len(ids)
    offsets = np.zeros(len(texts) + 1, dtype=np.int64)
    arrs = [np.frombuffer(t.encode("utf-32-le"), dtype="<u4") for t in texts]
    offsets[1:] = np.cumsum([len(a) for a in arrs])
    values = (
        np.concatenate(arrs).astype(np.int32)
        if arrs
        else np.zeros(0, dtype=np.int32)
    )
    tok_arr = pa.ListArray.from_arrays(
        pa.array(offsets.astype(np.int32), type=pa.int32()),
        pa.array(values, type=pa.int32()),
    )
    return pa.table(
        {
            "doc_id": pa.array([str(i) for i in ids], type=pa.string()),
            "tokens": tok_arr,
            "n_tok": pa.array(np.diff(offsets).astype(np.int32), type=pa.int32()),
            "source": pa.array([str(s) for s in src], type=pa.string()),
        }
    )
