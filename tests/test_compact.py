"""Fragment compaction: bit-identical row set, fewer files, byte-budget
bins, and the crash-safe marker protocol (roll forward / roll back)."""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data


def _corpus(tmp: str, n_rows: int = 1500) -> str:
    from fsst_like_ray.sources.tokens import tokens_table

    src = os.path.join(tmp, "src")
    os.makedirs(src, exist_ok=True)
    pq.write_table(
        tokens_table(n_rows, seed=3),
        os.path.join(src, "corpus.parquet"),
        row_group_size=64,
    )
    return src


def _encode(tmp: str) -> str:
    from fsst_like_ray.pipelines.compress import compress_dataset

    out = os.path.join(tmp, "enc")
    compress_dataset(_corpus(tmp), out, codec="auto", balance_tokens=10_000)
    return out


def test_compact_bit_identical_and_binned(ray_session, tmp_path):
    from fsst_like_ray.pipelines.compact import compact_fragments
    from fsst_like_ray.pipelines.compress import verify_roundtrip_manifest

    out = _encode(str(tmp_path))
    files0 = glob.glob(os.path.join(out, "data", "*", "*.parquet"))
    assert len(files0) > 3  # real work to do
    assert verify_roundtrip_manifest(out)["match"]

    # small byte budget → MULTIPLE bins (first-fit is exercised)
    budget = max(os.path.getsize(f) for f in files0) * 2
    stats = compact_fragments(out, target_bytes=budget)
    files1 = glob.glob(os.path.join(out, "data", "*", "*.parquet"))
    assert stats["files_after"] == len(files1) < stats["files_before"]
    for f in files1:
        # bins respect the budget within one original file's tolerance
        assert os.path.getsize(f) <= budget * 1.5
    assert verify_roundtrip_manifest(out)["match"]

    # idempotent: second pass with a huge budget merges to 1/frag and
    # still verifies
    compact_fragments(out, target_bytes=1 << 30)
    files2 = glob.glob(os.path.join(out, "data", "*", "*.parquet"))
    assert len(files2) == len(glob.glob(os.path.join(out, "data", "frag=*")))
    assert verify_roundtrip_manifest(out)["match"]


def test_compact_crash_recovery(ray_session, tmp_path):
    """Simulate both kill windows of the marker protocol and check
    recover_compaction restores a consistent directory."""
    from fsst_like_ray.pipelines.compact import (
        compact_fragments,
        recover_compaction,
    )
    from fsst_like_ray.pipelines.compress import verify_roundtrip_manifest

    out = _encode(str(tmp_path))
    frag_dir = glob.glob(os.path.join(out, "data", "frag=*"))[0]
    files = sorted(
        f for f in os.listdir(frag_dir) if f.endswith(".parquet")
    )
    assert len(files) >= 2

    # window A: marker written, compacted file NOT yet renamed → roll back
    marker = {"compacted": "part-cdeadbeef-9.parquet", "sources": files[:2]}
    mpath = os.path.join(frag_dir, "_compact_deadbeef.json")
    with open(mpath, "w") as f:
        json.dump(marker, f)
    recover_compaction(frag_dir)
    assert not os.path.exists(mpath)
    for s in files[:2]:
        assert os.path.exists(os.path.join(frag_dir, s))  # sources intact
    assert verify_roundtrip_manifest(out)["match"]

    # window B: marker + compacted present, sources not deleted → roll
    # forward. Build the compacted file for real from two sources.
    two = files[:2]
    tbl = pa.concat_tables(
        [pq.read_table(os.path.join(frag_dir, f)) for f in two]
    )
    cpath = os.path.join(frag_dir, "part-cfeedface-x.parquet")
    comp = {
        c: ("none" if c == "payload" else "snappy") for c in tbl.column_names
    }
    pq.write_table(tbl, cpath, compression=comp)
    marker = {"compacted": os.path.basename(cpath), "sources": two}
    with open(os.path.join(frag_dir, "_compact_feedface.json"), "w") as f:
        json.dump(marker, f)
    n = recover_compaction(frag_dir)
    assert n == 1
    for s in two:
        assert not os.path.exists(os.path.join(frag_dir, s))
    assert os.path.exists(cpath)
    assert verify_roundtrip_manifest(out)["match"]

    # and a full compact over the recovered state still verifies
    compact_fragments(out, target_bytes=1 << 30)
    assert verify_roundtrip_manifest(out)["match"]


def test_compress_append_only_new_fragments(ray_session, tmp_path):
    """Appending a fragment to the source and re-running compress_dataset
    encodes ONLY the new fragment (manifest skip), and the combined
    corpus verifies."""
    import time

    from fsst_like_ray.pipelines.compress import (
        compress_dataset,
        read_encoded,
        verify_roundtrip_manifest,
    )
    from fsst_like_ray.sources.tokens import tokens_table

    tmp = str(tmp_path)
    src = os.path.join(tmp, "src")
    out = os.path.join(tmp, "enc")
    os.makedirs(src, exist_ok=True)
    pq.write_table(tokens_table(800, seed=1), os.path.join(src, "a.parquet"))
    compress_dataset(src, out)
    assert verify_roundtrip_manifest(out)["match"]
    first = {
        f: os.path.getmtime(f)
        for f in glob.glob(os.path.join(out, "data", "*", "*.parquet"))
    }
    assert first

    # append a second fragment; rows must be disjoint (unique doc ids)
    t2 = tokens_table(300, seed=2)
    t2 = t2.set_column(
        t2.column_names.index("doc_id"),
        "doc_id",
        pa.array([f"b-{i}" for i in range(t2.num_rows)], type=pa.string())
        if pa.types.is_string(t2["doc_id"].type)
        else pa.array(
            np.arange(10_000_000, 10_000_000 + t2.num_rows), type=t2["doc_id"].type
        ),
    )
    pq.write_table(t2, os.path.join(src, "b.parquet"))
    stats = compress_dataset(src, out)
    assert stats["fragments"] == 2
    # original fragment's files untouched (no rewrite)
    for f, mt in first.items():
        assert os.path.getmtime(f) == mt, f
    assert verify_roundtrip_manifest(out)["match"]
    assert read_encoded(out).count() == 1100
