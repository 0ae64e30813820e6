"""Resumable whole-table encoded store — the north rule's lineage/resume
contract (reference benchmark loop: src/BenchmarkDriver.cpp:12-52 loads and
encodes once in RAM; at 10^12-sequence scale the encode is a restartable
job) applied to the per-column engine in pipelines/columnar.py, the same
way pipelines/compress.py applies it to the tokens pipeline.

Layout under ``out_dir``:

- ``data/frag=<key>/part-0.parquet`` — the fragment's per-column-encoded
  rows (columnar.encode_columns_batch layout), one directory per INPUT
  fragment so a resumed run skips finished partitions wholesale.
- ``_manifest/<key>.json`` — lineage: input fragment, rows, per-column
  plain/encoded bytes and the scheme histogram, committed atomically
  AFTER the fragment's data is fully written (state/manifest.py).

Each fragment encodes in row-group-sized batches through ONE streaming
ParquetFile reader and ONE ParquetWriter — peak memory per task is a
single batch, never the fragment.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..state.manifest import Manifest, fragment_key
from .columnar import (
    assert_bit_equal,
    columnar_stats_batch,
    decode_columns_dataset,
    encode_columns_batch,
)
from .compress import discover_fragments

DEFAULT_BATCH_ROWS = 8192


def _encode_fragment(
    path: str, fdir: str, codec_names=None, batch_rows: int = DEFAULT_BATCH_ROWS
) -> dict:
    """Stream one source fragment → one encoded part file + a stats dict."""
    os.makedirs(fdir, exist_ok=True)
    pf = pq.ParquetFile(path)
    writer = None
    out_path = os.path.join(fdir, "part-0.parquet")
    acc: dict[str, list] = {}  # column -> [plain, encoded, set(schemes)]
    n_rows = 0
    try:
        batches = pf.iter_batches(batch_size=batch_rows)
        for rb in batches:
            t = pa.Table.from_batches([rb])
            enc = encode_columns_batch(t, codec_names)
            if writer is None:
                writer = pq.ParquetWriter(out_path, enc.schema)
            writer.write_table(enc)
            n_rows += t.num_rows
            for r in columnar_stats_batch(enc).to_pylist():
                a = acc.setdefault(r["column"], [0, 0, set()])
                a[0] += int(r["plain_nbytes"])
                a[1] += int(r["encoded_nbytes"])
                a[2].add(r["scheme"])
        if writer is None:  # zero-row fragment: keep the (encoded) schema
            enc = encode_columns_batch(
                pf.schema_arrow.empty_table(), codec_names
            )
            writer = pq.ParquetWriter(out_path, enc.schema)
            writer.write_table(enc)
    finally:
        if writer is not None:
            writer.close()
    return {
        "rows": n_rows,
        "plain_bytes": sum(a[0] for a in acc.values()),
        "encoded_bytes": sum(a[1] for a in acc.values()),
        "columns": {
            c: {"plain": a[0], "encoded": a[1], "schemes": sorted(a[2])}
            for c, a in sorted(acc.items())
        },
    }


class _EncodeFragmentsTask:
    """Actor-pool stage: each task encodes a GROUP of fragments
    sequentially (peak memory = one batch) and returns one stats row per
    fragment. Fragment paths ride the object store once via ray.put."""

    def __init__(self, data_dir: str, paths_ref, codec_names, batch_rows: int):
        self.data_dir = data_dir
        self.paths_ref = paths_ref  # ray.put ONCE; workers read shared memory
        self.codec_names = codec_names
        self.batch_rows = batch_rows

    def __call__(self, ids: pa.Table) -> pa.Table:
        import json

        import ray

        paths = ray.get(self.paths_ref)
        rows = []
        for i in ids["id"].to_pylist():
            path = paths[i]
            key = fragment_key(path)
            stats = _encode_fragment(
                path,
                os.path.join(self.data_dir, f"frag={key}"),
                self.codec_names,
                self.batch_rows,
            )
            rows.append(
                {
                    "fragment": path,
                    "frag_key": key,
                    "rows": stats["rows"],
                    "plain_bytes": stats["plain_bytes"],
                    "encoded_bytes": stats["encoded_bytes"],
                    "columns_json": json.dumps(stats["columns"]),
                }
            )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [
                    ("fragment", pa.string()),
                    ("frag_key", pa.string()),
                    ("rows", pa.int64()),
                    ("plain_bytes", pa.int64()),
                    ("encoded_bytes", pa.int64()),
                    ("columns_json", pa.string()),
                ]
            ),
        )


def compress_table(
    input_path: str | list[str],
    out_dir: str,
    codec_names=None,
    resume: bool = True,
    batch_rows: int = DEFAULT_BATCH_ROWS,
    fragments_per_round: int = 64,
) -> dict:
    """Encode every column of a parquet corpus into a resumable store.

    Safe to re-run after a kill: committed fragments skip (their data dirs
    are never touched again); a fragment whose task died mid-write has no
    manifest record, its partial dir is cleared and rewritten. The rounds
    loop bounds driver-side state by fragments_per_round, never total job
    size — the same 10^12-scale contract as compress.compress_dataset."""
    import json

    import ray
    import ray.data

    fragments = discover_fragments(input_path)
    manifest = Manifest(out_dir)
    pending = manifest.pending(fragments) if resume else fragments
    data_dir = os.path.join(out_dir, "data")
    for start in range(0, len(pending), fragments_per_round):
        round_frags = pending[start : start + fragments_per_round]
        for f in round_frags:  # clear (by definition uncommitted) partials
            shutil.rmtree(
                os.path.join(data_dir, f"frag={fragment_key(f)}"),
                ignore_errors=True,
            )
        paths_ref = ray.put(round_frags)
        ncpu = (
            int(ray.cluster_resources().get("CPU", 4))
            if ray.is_initialized()
            else 4
        )
        n_groups = max(1, min(len(round_frags), 4 * ncpu))
        stat_rows = (
            ray.data.range(len(round_frags), override_num_blocks=n_groups)
            .map_batches(
                _EncodeFragmentsTask(
                    data_dir, paths_ref, codec_names, batch_rows
                ),
                batch_format="pyarrow",
                batch_size=None,
                zero_copy_batch=True,
            )
            .take_all()
        )
        for r in stat_rows:
            manifest.commit(
                {
                    "fragment": r["fragment"],
                    "frag_key": r["frag_key"],
                    "rows": int(r["rows"]),
                    "plain_bytes": int(r["plain_bytes"]),
                    "encoded_bytes": int(r["encoded_bytes"]),
                    "columns": json.loads(r["columns_json"]),
                }
            )
    return manifest.stats()


def read_table_store(out_dir: str):
    """Encoded store → decoded streaming Dataset."""
    import ray.data

    return decode_columns_dataset(
        ray.data.read_parquet(os.path.join(out_dir, "data"))
    )


def verify_table_store(input_path: str | list[str], out_dir: str) -> dict:
    """Distributed decode-verify: one task per fragment re-reads its source
    and asserts BIT-exact equality (columnar.assert_bit_equal) against the
    decoded store partition. Only manifest-committed fragments verify;
    raises on the first mismatch."""
    import ray
    import ray.data

    from .columnar import decode_columns_batch

    manifest = Manifest(out_dir)
    done = manifest.completed()
    fragments = [f for f in discover_fragments(input_path) if f in done]
    data_dir = os.path.join(out_dir, "data")
    paths_ref = ray.put(fragments)

    def check(ids: pa.Table) -> pa.Table:
        paths = ray.get(paths_ref)
        out = []
        for i in ids["id"].to_pylist():
            src = pq.read_table(paths[i])
            key = fragment_key(paths[i])
            enc = pq.read_table(
                os.path.join(data_dir, f"frag={key}", "part-0.parquet")
            ).combine_chunks()
            dec = decode_columns_batch(enc)
            assert_bit_equal(src, dec)
            out.append({"rows": src.num_rows, "ok": True})
        return pa.Table.from_pylist(
            out, schema=pa.schema([("rows", pa.int64()), ("ok", pa.bool_())])
        )

    rows = (
        ray.data.range(len(fragments), override_num_blocks=max(1, len(fragments)))
        .map_batches(check, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    return {
        "fragments": len(fragments),
        "rows": int(sum(r["rows"] for r in rows)),
        "ok": all(r["ok"] for r in rows),
    }
