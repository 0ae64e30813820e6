"""Persisted per-file token ZONE INDEX over an encoded corpus.

The reference prunes with per-block ``used_chars`` INSIDE a scan
(Fsst.hpp's escaped-literal bitmap; our ``engines.py`` block prune); this
module lifts the same idea to the FILE level and PERSISTS it, so a
membership query skips whole partition files without opening them — at
100 TB the win is not CPU but I/O: candidate files are the only bytes
that leave storage.

Index build = one streaming pass over the encoded corpus (indexes cost a
build scan — standard). Per file: token min/max plus an EXACT presence
bitmap for token ids < 2^16 (8 KB/file) and a bloom (functions/bloom) for
larger ids. Per-batch partials (one row per file touched) merge by
min/max/OR DISTRIBUTED in a per-path groupby — commutative, so block
order and retries are safe — and stream batch-by-batch into
``<out_dir>/index/zones.parquet`` via atomic rename (driver memory is
bounded by the write batch; rebuildable any time, same contract as the
IVF index).

Query: ``contains_token_indexed`` reads the tiny zones table, selects
candidate files (exact bitmap for small ids — no false positives at all;
bloom for large ids — no false negatives ever), and runs the
compressed-domain ``contains_token_scan`` over ONLY those files.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from ..codecs import CODECS
from ..functions.bloom import bloom_contains, bloom_insert
from ..stages.decode import encoded_segment_runs
from .numscan import contains_token_scan

ZONE_EXACT_IDS = 1 << 16  # exact presence bitmap covers ids [0, 2^16)
BLOOM_BYTES = 1 << 12  # 4 KB bloom for ids >= 2^16
_BLOOM_K = 4
ZONE_SCHEMA = pa.schema(
    [
        ("path", pa.string()),
        ("tok_min", pa.int64()),
        ("tok_max", pa.int64()),
        ("presence", pa.binary()),
        ("bloom", pa.binary()),
    ]
)


def _zone_partial(batch: pa.Table) -> pa.Table:
    """One (path, tok_min, tok_max, presence, bloom) row per file touched
    by this batch. Values come from a segment-wise decode (the build pass
    pays one decode; every future query skips files for free)."""
    n = batch.num_rows
    segments, pay_buf, pay_off, counts = encoded_segment_runs(batch)
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=out_off[1:])
    values = np.empty(int(out_off[-1]), dtype=np.int32)
    for lo, hi, name, state in segments:
        c = CODECS[name]
        sub = pay_buf[pay_off[lo] : pay_off[hi]]
        so = pay_off[lo : hi + 1] - pay_off[lo]
        values[out_off[lo] : out_off[hi]] = c.decode(
            sub, so, counts[lo:hi], state
        )

    path_col = batch["path"]
    if isinstance(path_col, pa.ChunkedArray):
        path_col = path_col.combine_chunks()
    enc = path_col.dictionary_encode()
    fi = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    paths = enc.dictionary.to_pylist()
    # token → owning file, one vectorized repeat (a batch is usually one
    # file — one read task per file — but reordered/multi-file batches
    # stay correct); never a per-row Python gather
    tok_file = np.repeat(fi, counts)
    rows = {"path": [], "tok_min": [], "tok_max": [], "presence": [], "bloom": []}
    for gi, p in enumerate(paths):
        if not (fi == gi).any():
            continue
        v = values[tok_file == gi]
        pres = np.zeros(ZONE_EXACT_IDS // 8, dtype=np.uint8)
        bloom = np.zeros(BLOOM_BYTES, dtype=np.uint8)
        if len(v):
            u = np.unique(v)
            small = u[(u >= 0) & (u < ZONE_EXACT_IDS)]
            pres_idx = small.astype(np.int64)
            np.bitwise_or.at(
                pres,
                pres_idx >> 3,
                np.uint8(1) << (pres_idx & 7).astype(np.uint8),
            )
            big = u[(u < 0) | (u >= ZONE_EXACT_IDS)]
            if len(big):
                bloom_insert(bloom, big.astype(np.int64), _BLOOM_K)
            tmin, tmax = int(u[0]), int(u[-1])
        else:
            tmin, tmax = 0, -1  # empty marker (min > max)
        rows["path"].append(p)
        rows["tok_min"].append(tmin)
        rows["tok_max"].append(tmax)
        rows["presence"].append(pres.tobytes())
        rows["bloom"].append(bloom.tobytes())
    return pa.table(
        {
            "path": pa.array(rows["path"], type=pa.string()),
            "tok_min": pa.array(rows["tok_min"], type=pa.int64()),
            "tok_max": pa.array(rows["tok_max"], type=pa.int64()),
            "presence": pa.array(rows["presence"], type=pa.binary()),
            "bloom": pa.array(rows["bloom"], type=pa.binary()),
        }
    )


def stream_index_write(
    merged_ds,
    index_path: str,
    schema: pa.Schema,
    head: "pa.Table | None" = None,
) -> int:
    """Stream a merged index Dataset into ``index_path`` batch-by-batch
    (driver holds one write batch, never the whole index), atomically via
    tmp + rename. The schema is passed EXPLICITLY so an empty stream still
    produces a valid empty index file; on any failure the tmp file is
    removed. ``head`` rows (e.g. an incremental build's carried block) are
    written first. Returns the row count. Shared by the token zone and
    text trigram index builders."""
    tmp = f"{index_path}.tmp{os.getpid()}"
    n_rows = 0
    writer = pq.ParquetWriter(tmp, schema)
    try:
        if head is not None and head.num_rows:
            writer.write_table(head.select([f.name for f in schema]))
            n_rows += head.num_rows
        for b in merged_ds.iter_batches(
            batch_size=512, batch_format="pyarrow"
        ):
            if b.num_rows == 0:
                continue
            writer.write_table(
                b.select([f.name for f in schema]).cast(schema)
            )
            n_rows += b.num_rows
    except BaseException:
        writer.close()
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    writer.close()
    os.replace(tmp, index_path)
    return n_rows


def _data_files(out_dir: str) -> list[str]:
    # same listing contract as the compress/read path (skips '_'-prefixed
    # artifacts) so the index can never see files the readers don't
    from .compress import discover_fragments

    return discover_fragments(os.path.join(out_dir, "data"))


def build_token_zone_index(out_dir: str, incremental: bool = False) -> dict:
    """Scan ``<out_dir>/data`` and write the per-file zone table to
    ``<out_dir>/index/zones.parquet`` (atomic; rebuild overwrites).

    ``incremental=True`` scans ONLY files absent from the existing index
    and drops index rows whose file vanished (compaction) — appending a
    day's fragments to a 100 TB corpus costs one pass over the NEW bytes,
    not a full re-index. Per-file rows make this sound: an existing row
    is complete (its file was fully scanned when written) and immutable
    files never change under it (the sinks write-once via atomic rename).
    """
    files = _data_files(out_dir)
    idx_path = os.path.join(out_dir, "index", "zones.parquet")
    carried: "pa.Table | None" = None
    if incremental and os.path.exists(idx_path):
        prev = pq.read_table(idx_path)
        fset = set(files)
        keep = [p in fset for p in prev["path"].to_pylist()]
        carried = prev.filter(pa.array(keep))
        done = set(carried["path"].to_pylist())
        files = [f for f in files if f not in done]
        if not files:
            tmp = f"{idx_path}.tmp{os.getpid()}"
            pq.write_table(carried, tmp)
            os.replace(tmp, idx_path)
            return {"files": carried.num_rows, "scanned": 0,
                    "index_path": idx_path}
    if not files:
        raise FileNotFoundError(f"no parquet files under {out_dir}/data")
    ds = ray.data.read_parquet(files, include_paths=True)

    def or_merge(g: pa.Table) -> pa.Table:
        """All partials of ONE file → its final index row (min/max fold +
        bitmap OR). Runs DISTRIBUTED in the per-path groupby, so the
        driver never holds more than the streaming write batch — at 100k
        fragments the ~12 KB/file bitmaps total ~1.2 GB, which the old
        driver-side dict merge kept resident."""
        tmin, tmax = None, None
        pres = np.zeros(ZONE_EXACT_IDS // 8, dtype=np.uint8)
        bloom = np.zeros(BLOOM_BYTES, dtype=np.uint8)
        for r in g.to_pylist():
            if r["tok_max"] >= r["tok_min"]:
                tmin = r["tok_min"] if tmin is None else min(tmin, r["tok_min"])
                tmax = r["tok_max"] if tmax is None else max(tmax, r["tok_max"])
            np.bitwise_or(
                pres, np.frombuffer(r["presence"], dtype=np.uint8), out=pres
            )
            np.bitwise_or(
                bloom, np.frombuffer(r["bloom"], dtype=np.uint8), out=bloom
            )
        return pa.table(
            {
                "path": pa.array([g["path"][0].as_py()], type=pa.string()),
                "tok_min": pa.array(
                    [0 if tmin is None else tmin], type=pa.int64()
                ),
                "tok_max": pa.array(
                    [-1 if tmax is None else tmax], type=pa.int64()
                ),
                "presence": pa.array([pres.tobytes()], type=pa.binary()),
                "bloom": pa.array([bloom.tobytes()], type=pa.binary()),
            }
        )

    merged_ds = (
        ds.map_batches(
            _zone_partial, batch_format="pyarrow", zero_copy_batch=True
        )
        .groupby("path")
        .map_groups(or_merge, batch_format="pyarrow")
        .sort("path")
    )
    idx_dir = os.path.join(out_dir, "index")
    os.makedirs(idx_dir, exist_ok=True)
    path = os.path.join(idx_dir, "zones.parquet")
    n_rows = stream_index_write(merged_ds, path, ZONE_SCHEMA, head=carried)
    return {
        "files": n_rows,
        "scanned": len(files),
        "index_path": path,
    }


def zone_candidate_files(out_dir: str, tid: int) -> tuple[list[str], int]:
    """(candidate file list, total files). Exact for ids < 2^16; bloom
    (no false negatives) above.

    Two-phase read so per-query I/O scales with the SURVIVOR set, not the
    index: phase 1 reads only (path, tok_min, tok_max) — a few bytes per
    file via parquet column projection; phase 2 fetches the ~12 KB/file
    presence/bloom blobs only from ROW GROUPS containing min/max
    survivors. Both phases read through ONE open ParquetFile handle, so a
    concurrent atomic rebuild (os.replace) cannot swap index versions
    between the phases — the lookup always sees a single snapshot. At
    100k fragments the heavy columns are ~1.2 GB; a miss outside every
    [min,max] touches none of them."""
    idx_path = os.path.join(out_dir, "index", "zones.parquet")
    pf = pq.ParquetFile(idx_path)
    lite = pf.read(columns=["path", "tok_min", "tok_max"])
    paths = lite["path"].to_pylist()
    tmin = lite["tok_min"].to_numpy(zero_copy_only=False)
    tmax = lite["tok_max"].to_numpy(zero_copy_only=False)
    keep = (tmin <= tid) & (tid <= tmax)
    surv_rows = np.flatnonzero(keep)
    if not surv_rows.size:
        return [], len(paths)
    survivors = {paths[i] for i in surv_rows}
    # map survivor row indices → row groups (the streaming writer emits
    # ≤512-row groups, so this prunes to the touched groups only)
    rg_bounds = np.cumsum(
        [pf.metadata.row_group(i).num_rows for i in range(pf.num_row_groups)]
    )
    rgs = sorted(set(int(np.searchsorted(rg_bounds, r, side="right"))
                     for r in surv_rows))
    col = "presence" if 0 <= tid < ZONE_EXACT_IDS else "bloom"
    heavy = pf.read_row_groups(rgs, columns=["path", col])
    out = []
    q = np.array([tid], dtype=np.int64)
    for p, blob in zip(heavy["path"].to_pylist(), heavy[col].to_pylist()):
        if p not in survivors:
            continue
        arr = np.frombuffer(blob, dtype=np.uint8)
        if col == "presence":
            hit = bool((arr[tid >> 3] >> (tid & 7)) & 1)
        else:
            hit = bool(bloom_contains(arr, q, _BLOOM_K)[0])
        if hit:
            out.append(p)
    return out, len(paths)


def contains_token_indexed(out_dir: str, tid: int):
    """Zone-pruned membership scan: returns (Dataset of matching doc_id
    rows, files_scanned, files_total). Only candidate files are read."""
    cand, total = zone_candidate_files(out_dir, tid)
    if not cand:
        empty = pa.table({"doc_id": pa.array([], type=pa.int64())})
        return ray.data.from_arrow(empty), 0, total
    from .compress import read_parquet_blocks

    enc = read_parquet_blocks(cand)
    return contains_token_scan(enc, tid), len(cand), total
