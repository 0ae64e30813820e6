"""The flagship pipeline: streaming encode → partitioned Parquet sink →
lineage manifest → decode-verify. Everything is a lazy ``ray.data.Dataset``
(reference lifecycle analog: SURVEY.md §3.1, re-expressed as a stream).

Scale notes:
- the encode stage is a task-pool ``map_batches`` (state trained per batch,
  so no actor is needed; pass ``concurrency`` to pin an actor pool);
- fragments (input files) are the checkpoint unit; a killed job resumes by
  skipping fragments already committed to the manifest;
- output is hive-partitioned by fragment key → a failed run never corrupts
  finished fragments; rewrites are idempotent per fragment;
- nothing materializes the full dataset: stats come from a cheap column-pruned
  re-read of the encoded output (payload bytes stay on disk).
"""

from __future__ import annotations

import os

import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Sum

from ..stages.encode import EncoderActor
from ..stages.decode import decode_batch
from ..stages.verify import hash_summary
from ..stages.skew import plan_batch_rows
from ..state.manifest import Manifest, fragment_key

DEFAULT_BATCH_ROWS = 2048


def encode_dataset(
    ds: "ray.data.Dataset",
    codec: str = "auto",
    concurrency=None,
    batch_size: int | None = DEFAULT_BATCH_ROWS,
    max_tokens_per_state: int | None = None,
) -> "ray.data.Dataset":
    """Encode stage. Codec state is trained per batch (no cross-batch state),
    so the default is a stateless TASK pool — it autoscales to whatever CPUs
    the streaming executor has free, with no actor ramp-up or bundling
    stalls. Pass ``concurrency`` to pin an actor pool instead (useful when a
    future codec carries heavy per-process setup)."""
    if concurrency is None:
        fn = EncoderActor(codec=codec, max_tokens_per_state=max_tokens_per_state)
        return ds.map_batches(
            lambda b, _fn=fn: _fn(b),
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
    return ds.map_batches(
        EncoderActor,
        fn_constructor_kwargs={
            "codec": codec,
            "max_tokens_per_state": max_tokens_per_state,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def decode_dataset(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    return ds.map_batches(decode_batch, batch_format="pyarrow", zero_copy_batch=True)


def discover_fragments(path: str | list[str]) -> list[str]:
    if isinstance(path, list):
        return sorted(path)
    if os.path.isfile(path):
        return [path]
    return sorted(
        os.path.join(root, f)
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet") and not f.startswith("_")
    )


def read_parquet_blocks(
    path: str | list[str], min_blocks_per_cpu: int = 2, **kwargs
) -> "ray.data.Dataset":
    """``read_parquet`` with read parallelism pinned to
    ``max(#files, min_blocks_per_cpu × CPUs)``. Ray sizes read tasks by
    estimated bytes ÷ target block size, which collapses small inputs to ONE
    block and serializes every downstream stage; at 100 TB the auto sizing is
    fine, but per-fragment parallelism must never drop below the cluster
    width. Files with multiple row groups can split beyond file granularity."""
    import ray

    files = discover_fragments(path)
    ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    onb = max(len(files), min_blocks_per_cpu * ncpu)
    return ray.data.read_parquet(files, override_num_blocks=onb, **kwargs)


def compress_dataset(
    input_path: str | list[str],
    out_dir: str,
    codec: str = "auto",
    resume: bool = True,
    fragments_per_round: int = 64,
    balance_tokens: int | None = None,
    concurrency=None,
) -> dict:
    """Encode an input corpus to ``out_dir`` with per-fragment lineage.

    Returns the manifest stats after this run. Safe to re-run after a kill:
    completed fragments are skipped (FIXTURES.md §4 contract)."""
    fragments = discover_fragments(input_path)
    manifest = Manifest(out_dir)
    pending = manifest.pending(fragments) if resume else fragments
    data_dir = os.path.join(out_dir, "data")

    batch_rows = DEFAULT_BATCH_ROWS
    if balance_tokens and pending:
        # shuffle-free skew plan, ONCE per corpus: a column-pruned n_tok read
        # over (a sample of) the pending fragments picks the batch row count
        # that lands ~balance_tokens per encode task. Mean tokens/row is a
        # corpus-level statistic — re-planning every round only adds fixed
        # pipeline latency. Intra-batch skew is handled by token-budget state
        # chunking inside the encoder.
        plan_ds = read_parquet_blocks(pending[:64], columns=["n_tok"])
        batch_rows, _hist = plan_batch_rows(plan_ds, balance_tokens)

    for start in range(0, len(pending), fragments_per_round):
        round_frags = pending[start : start + fragments_per_round]
        path_to_key = {f: fragment_key(f) for f in round_frags}
        # a kill mid-round leaves PARTIAL files in these fragments' output
        # dirs, and write_parquet appends rather than replaces — clear the
        # (by definition uncommitted) dirs so the rewrite is exact
        import shutil

        for key in path_to_key.values():
            shutil.rmtree(os.path.join(data_dir, f"frag={key}"), ignore_errors=True)
        ds = read_parquet_blocks(round_frags, include_paths=True)

        def tag_fragment(batch: pa.Table, _map=path_to_key) -> pa.Table:
            paths = batch["path"].to_pylist()
            frag = pa.array([_map[p] for p in paths], type=pa.string())
            return batch.drop_columns(["path"]).append_column("frag", frag)

        ds = ds.map_batches(tag_fragment, batch_format="pyarrow")
        enc = encode_dataset(
            ds,
            codec=codec,
            concurrency=concurrency,
            batch_size=batch_rows,
            max_tokens_per_state=balance_tokens,
        )
        enc.write_parquet(data_dir, partition_cols=["frag"])

        # lineage stats from a column-pruned re-read of ONLY this round's
        # partition directories (payload bytes stay on disk; the hive key is
        # re-derived from the file path since the physical files omit it)
        round_dirs = [
            f
            for key in path_to_key.values()
            for f in discover_fragments(os.path.join(data_dir, f"frag={key}"))
        ]

        def tag_from_path(batch: pa.Table) -> pa.Table:
            keys = [
                p.split("frag=", 1)[1].split(os.sep, 1)[0]
                for p in batch["path"].to_pylist()
            ]
            return batch.drop_columns(["path"]).append_column(
                "frag", pa.array(keys, type=pa.string())
            )

        stats = (
            read_parquet_blocks(
                round_dirs,
                columns=["n_tok", "payload_nbytes"],
                include_paths=True,
            )
            .map_batches(tag_from_path, batch_format="pyarrow")
            .groupby("frag")
            .aggregate(
                Count(alias_name="rows"),
                Sum("n_tok", alias_name="tokens"),
                Sum("payload_nbytes", alias_name="encoded_bytes"),
            )
            .take_all()
        )
        by_key = {r["frag"]: r for r in stats}
        for f in round_frags:
            key = path_to_key[f]
            r = by_key.get(key)
            if r is None:
                continue
            manifest.commit(
                {
                    "fragment": f,
                    "frag_key": key,
                    "codec_mode": codec,
                    "rows": int(r["rows"]),
                    "tokens": int(r["tokens"] or 0),
                    "encoded_bytes": int(r["encoded_bytes"] or 0),
                    "plain_bytes": int(r["tokens"] or 0) * 4,
                }
            )
    return manifest.stats()


def read_encoded(out_dir: str) -> "ray.data.Dataset":
    return read_parquet_blocks(os.path.join(out_dir, "data"))


def _sum_hash_summaries(ds: "ray.data.Dataset") -> tuple[int, int, int]:
    rows = ds.map_batches(hash_summary, batch_format="pyarrow").take_all()
    s = x = n = 0
    for r in rows:
        s = (s + int(r["hash_sum"])) % (1 << 64)
        x ^= int(r["hash_xor"])
        n += int(r["rows"])
    return s, x, n


def verify_roundtrip(
    original: "ray.data.Dataset", decoded: "ray.data.Dataset"
) -> dict:
    """Order-insensitive bit-identity check: per-row (doc_id, tokens) hashes
    aggregated as wrapping sum + xor + count on both sides."""
    a = _sum_hash_summaries(original)
    b = _sum_hash_summaries(decoded)
    return {"match": a == b, "original": a, "decoded": b}
