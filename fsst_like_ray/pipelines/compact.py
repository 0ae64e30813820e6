"""Encoded-corpus compaction — the small-file problem, solved in place.

A resumable 10^12-sequence encode run writes MANY partition files per
fragment (one per encode task batch); at 100 TB the file count itself
becomes the bottleneck — footer reads, scheduler metadata, object-store
listing. Compaction rewrites each fragment directory's files into
``target_bytes``-sized bins WITHOUT changing a single row: the manifest's
per-fragment content hashes (hash_sum / hash_xor over row_hash) must be
bit-identical before and after, and ``verify_roundtrip_manifest`` still
passes against the original inputs.

Crash safety (two-phase, idempotent):

1. a ``_compact_<tag>.json`` MARKER (compacted name + source list) is
   atomically renamed in FIRST;
2. the compacted bin is written to a tmp name and atomically renamed in;
3. sources are deleted, then the marker.

A kill in any window leaves a recoverable state for
``recover_compaction``: marker + compacted present → roll FORWARD
(delete sources, then marker); marker without the compacted file →
roll BACK (sources intact, drop the marker). No marker → directory is
consistent (untouched or fully compacted). Compaction is an OFFLINE
maintenance pass — don't run readers against a directory mid-compaction
(file-table semantics without a transaction log; same contract as
Parquet table compactors generally).

Each fragment compacts independently (one Ray task per fragment via the
same spec-shipping shape as the encode), so the pass streams and scales
with fragments. File paths change, so a zone index (zoneindex.py) must
be rebuilt afterwards — callers get ``index_stale`` in the stats.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data


def _frag_dirs(out_dir: str) -> list[str]:
    data = os.path.join(out_dir, "data")
    return sorted(
        os.path.join(data, d)
        for d in os.listdir(data)
        if d.startswith("frag=")
    )


def recover_compaction(frag_dir: str) -> int:
    """Replay pending compaction markers in one fragment dir. Returns the
    number of markers finished."""
    done = 0
    for name in sorted(os.listdir(frag_dir)):
        if not (name.startswith("_compact_") and name.endswith(".json")):
            continue
        mpath = os.path.join(frag_dir, name)
        with open(mpath) as f:
            marker = json.load(f)
        if os.path.exists(os.path.join(frag_dir, marker["compacted"])):
            # phase-2 completion: compacted file is in place → finish deletes
            for src in marker["sources"]:
                p = os.path.join(frag_dir, src)
                if os.path.exists(p):
                    os.remove(p)
            os.remove(mpath)
            done += 1
        else:
            # died before the rename: sources intact, drop the stale marker
            os.remove(mpath)
    return done


def _compact_one(frag_dir: str, target_bytes: int) -> dict:
    recover_compaction(frag_dir)
    files = sorted(
        f
        for f in os.listdir(frag_dir)
        if f.endswith(".parquet") and not f.startswith("_")
    )
    sizes = {f: os.path.getsize(os.path.join(frag_dir, f)) for f in files}
    # first-fit bins in name order (deterministic)
    bins: list[list[str]] = []
    cur: list[str] = []
    cur_sz = 0
    for f in files:
        if cur and cur_sz + sizes[f] > target_bytes:
            bins.append(cur)
            cur, cur_sz = [], 0
        cur.append(f)
        cur_sz += sizes[f]
    if cur:
        bins.append(cur)
    before, after = len(files), 0
    for bin_files in bins:
        if len(bin_files) == 1:
            after += 1
            continue
        tbl = pa.concat_tables(
            [pq.read_table(os.path.join(frag_dir, f)) for f in bin_files]
        )
        rh = tbl["row_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        with np.errstate(over="ignore"):
            tag = f"{int(rh.sum(dtype=np.uint64)):016x}"[:16]
        out_name = f"part-c{tag}-{tbl.num_rows}.parquet"
        out_path = os.path.join(frag_dir, out_name)
        # marker FIRST (before the compacted file becomes visible): a kill
        # in any window leaves either {marker, no compacted} → rollback
        # (sources intact) or {marker, compacted} → roll forward (delete
        # sources); without this order, a kill between rename and marker
        # would leave compacted + sources with no record = duplicate rows
        marker = {
            "compacted": out_name,
            "sources": [f for f in bin_files if f != out_name],
        }
        mpath = os.path.join(frag_dir, f"_compact_{tag}.json")
        mtmp = mpath + f".tmp{os.getpid()}"
        with open(mtmp, "w") as f:
            json.dump(marker, f)
        os.replace(mtmp, mpath)
        comp = {
            c: ("none" if c == "payload" else "snappy")
            for c in tbl.column_names
        }
        tmp = out_path + f".tmp{os.getpid()}"
        pq.write_table(tbl, tmp, compression=comp)
        os.replace(tmp, out_path)
        for src in marker["sources"]:
            os.remove(os.path.join(frag_dir, src))
        os.remove(mpath)
        after += 1
    return {"frag_dir": frag_dir, "files_before": before, "files_after": after}


def compact_fragments(
    out_dir: str, target_bytes: int = 64 << 20, concurrency=None
) -> dict:
    """Compact every fragment directory under ``<out_dir>/data``. One Ray
    task per fragment (spec-shipping, same shape as the encode pipeline);
    only tiny stat rows reach the driver."""
    frag_dirs = _frag_dirs(out_dir)
    if not frag_dirs:
        return {"fragments": 0, "files_before": 0, "files_after": 0,
                "index_stale": False}
    dirs_ref = ray.put(frag_dirs) if ray.is_initialized() else frag_dirs

    def run(ids: pa.Table) -> pa.Table:
        dirs = ray.get(dirs_ref) if isinstance(dirs_ref, ray.ObjectRef) else dirs_ref
        rows = [
            _compact_one(dirs[i], target_bytes)
            for i in ids["id"].to_pylist()
        ]
        return pa.table(
            {
                "files_before": pa.array(
                    [r["files_before"] for r in rows], type=pa.int64()
                ),
                "files_after": pa.array(
                    [r["files_after"] for r in rows], type=pa.int64()
                ),
            }
        )

    stats = (
        ray.data.range(len(frag_dirs), override_num_blocks=len(frag_dirs))
        .map_batches(
            run,
            batch_format="pyarrow",
            batch_size=None,
            **({"concurrency": concurrency} if concurrency else {}),
        )
        .take_all()
    )
    fb = sum(int(r["files_before"]) for r in stats)
    fa = sum(int(r["files_after"]) for r in stats)
    return {
        "fragments": len(frag_dirs),
        "files_before": fb,
        "files_after": fa,
        "index_stale": os.path.exists(
            os.path.join(out_dir, "index", "zones.parquet")
        ),
    }
