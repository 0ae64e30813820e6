"""Skew-balancing partition planner (north-rule requirement).

Token payload sizes are log-normal — orders of magnitude apart — so blocks
sized by ROW count carry wildly different token counts. The plan:

1. one cheap shuffle: ``groupby(log2-bucket of n_tok).aggregate(Count, Sum)``
   → the n_tok histogram;
2. from the histogram, total tokens → the number of blocks that puts
   ~``target_tokens_per_block`` tokens in each;
3. ``ds.repartition(num_blocks)`` to that plan.

At 100 TB the same two steps hold: the histogram is a tiny aggregate (≤64
buckets regardless of input size) and repartition is the only data movement.
Giant single rows are bounded by max_tok << tokens_per_block, so hash-free
row-count splitting after the plan is balanced in expectation.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Sum

DEFAULT_TARGET_TOKENS = 2_000_000


def _bucketize(batch: pa.Table) -> pa.Table:
    n_tok = batch["n_tok"].to_numpy().astype(np.int64)
    bucket = np.zeros(len(n_tok), dtype=np.int32)
    nz = n_tok > 0
    bucket[nz] = np.floor(np.log2(n_tok[nz])).astype(np.int32) + 1
    return pa.table({"bucket": bucket, "n_tok": batch["n_tok"]})


def n_tok_histogram(ds: "ray.data.Dataset") -> dict[int, tuple[int, int]]:
    """{log2 bucket: (row count, token sum)} — a ≤64-row aggregate."""
    agg = (
        ds.select_columns(["n_tok"])
        .map_batches(_bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Count(alias_name="rows"), Sum("n_tok", alias_name="tokens"))
    )
    out = {}
    for row in agg.take_all():
        out[int(row["bucket"])] = (int(row["rows"]), int(row["tokens"] or 0))
    return out


def plan_partitions(
    ds: "ray.data.Dataset",
    target_tokens_per_block: int = DEFAULT_TARGET_TOKENS,
) -> tuple[int, dict[int, tuple[int, int]]]:
    hist = n_tok_histogram(ds)
    total_tokens = sum(t for _, t in hist.values())
    num_blocks = max(1, int(np.ceil(total_tokens / target_tokens_per_block)))
    return num_blocks, hist


def balance(
    ds: "ray.data.Dataset",
    target_tokens_per_block: int = DEFAULT_TARGET_TOKENS,
) -> "ray.data.Dataset":
    num_blocks, _hist = plan_partitions(ds, target_tokens_per_block)
    return ds.repartition(num_blocks)
