"""Per-file token zone index: pruning is real (rare token → few candidate
files), exact-bitmap and bloom paths both have no false negatives, and the
pruned scan equals the unpruned one."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pytest

import ray.data

RARE_SMALL = 777  # < 2^16 → exact presence bitmap path
RARE_BIG = 5_000_000  # >= 2^16 → bloom path


def _mk_corpus(tmp: str):
    """8 source files; the rare tokens appear ONLY in file 0's rows."""
    src = os.path.join(tmp, "src")
    os.makedirs(src, exist_ok=True)
    rng = np.random.default_rng(4)
    for f in range(8):
        rows = []
        for r in range(40):
            toks = rng.integers(0, 300, size=25).astype(np.int32).tolist()
            if f == 0 and r % 4 == 0:
                toks.append(RARE_SMALL)
                toks.append(RARE_BIG)
            rows.append(toks)
        tbl = pa.table(
            {
                "doc_id": pa.array(
                    [f * 1000 + r for r in range(40)], type=pa.int64()
                ),
                "tokens": pa.array(rows, type=pa.list_(pa.int32())),
                "n_tok": pa.array(
                    [len(t) for t in rows], type=pa.int32()
                ),
                "source": pa.array([f"s{f}"] * 40, type=pa.string()),
            }
        )
        import pyarrow.parquet as pq

        pq.write_table(tbl, os.path.join(src, f"frag{f}.parquet"))
    return src


def test_zone_index_prunes_and_matches(ray_session, tmp_path):
    from fsst_like_ray.pipelines.compress import compress_dataset
    from fsst_like_ray.pipelines.numscan import contains_token_scan
    from fsst_like_ray.pipelines.compress import read_encoded
    from fsst_like_ray.pipelines.zoneindex import (
        build_token_zone_index,
        contains_token_indexed,
        zone_candidate_files,
    )

    tmp = str(tmp_path)
    src = _mk_corpus(tmp)
    out = os.path.join(tmp, "enc")
    compress_dataset(src, out, codec="auto")
    stats = build_token_zone_index(out)
    assert stats["files"] >= 8

    for tid in (RARE_SMALL, RARE_BIG):
        cand, total = zone_candidate_files(out, tid)
        assert 1 <= len(cand) < total, (tid, len(cand), total)
        ds, scanned, tot = contains_token_indexed(out, tid)
        got = sorted(ds.to_pandas()["doc_id"])
        want = sorted(
            contains_token_scan(read_encoded(out), tid).to_pandas()["doc_id"]
        )
        assert got == want and len(got) == 10, tid

    # token in no file: zero candidates, empty result
    cand, total = zone_candidate_files(out, 999_999_999)
    assert cand == []
    ds, scanned, _ = contains_token_indexed(out, 999_999_999)
    assert scanned == 0 and ds.count() == 0

    # common token: all rows come back (no false pruning)
    ds, _, _ = contains_token_indexed(out, 0)
    want0 = sorted(
        contains_token_scan(read_encoded(out), 0).to_pandas()["doc_id"]
    )
    assert sorted(ds.to_pandas()["doc_id"]) == want0

    # rebuild overwrites cleanly
    stats2 = build_token_zone_index(out)
    assert stats2["files"] == stats["files"]


def test_zone_index_incremental_append(ray_session, tmp_path):
    """Appending fragments re-scans ONLY the new files; removed files drop
    out; the merged index equals a from-scratch rebuild."""
    import pyarrow.parquet as pq

    from fsst_like_ray.pipelines.compress import compress_dataset
    from fsst_like_ray.pipelines.zoneindex import (
        build_token_zone_index,
        zone_candidate_files,
    )

    tmp = str(tmp_path)
    src = _mk_corpus(tmp)
    out = os.path.join(tmp, "enc")
    compress_dataset(src, out, codec="auto")
    first = build_token_zone_index(out)

    # append one fragment holding a token no other file has
    extra_tok = 60_001
    rows = [[extra_tok, 1, 2, 3]] * 5
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(9000, 9005)), type=pa.int64()),
            "tokens": pa.array(rows, type=pa.list_(pa.int32())),
            "n_tok": pa.array([4] * 5, type=pa.int32()),
            "source": pa.array(["s9"] * 5, type=pa.string()),
        }
    )
    pq.write_table(tbl, os.path.join(src, "frag9.parquet"))
    compress_dataset(src, out, codec="auto")  # resume: encodes only frag9

    inc = build_token_zone_index(out, incremental=True)
    assert inc["files"] > first["files"]
    assert 0 < inc["scanned"] < inc["files"]  # only the new files scanned
    cand, total = zone_candidate_files(out, extra_tok)
    assert len(cand) >= 1 and total == inc["files"]

    # incremental result == full rebuild (same rows; the incremental file
    # appends new rows after the carried block, so compare sorted by path)
    inc_tbl = pq.read_table(
        os.path.join(out, "index", "zones.parquet")
    ).sort_by("path")
    build_token_zone_index(out)
    full_tbl = pq.read_table(
        os.path.join(out, "index", "zones.parquet")
    ).sort_by("path")
    assert inc_tbl.equals(full_tbl)

    # nothing new → zero scanned, index unchanged
    again = build_token_zone_index(out, incremental=True)
    assert again["scanned"] == 0 and again["files"] == inc["files"]
