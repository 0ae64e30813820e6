"""Distributed GLOBAL ordered prefix scan (sweep-line primitive).

The keyed window operators (functions/window_fn.py) give per-KEY running
aggregates — one hash shuffle, vectorized in-group. A sweep-line
computation (peak concurrency, global running balance) needs the prefix
sum over the WHOLE dataset in one global order, which no groupby can
express. Classic two-phase scan, Ray-Data-shaped:

1. range-sort on the order columns and MATERIALIZE — block structure is
   now fixed and every block holds a contiguous key range;
2. phase 1 streams one tiny row per block — (first-row key, block
   subtotal) — and the driver turns the block-sized list into EXCLUSIVE
   prefix offsets (blocks, not rows, so driver state is partition-count
   sized);
3. phase 2 re-reads the same materialized blocks, adds each block's
   broadcast offset to its local vectorized cumsum, and reduces the
   extremes — rows never leave their block, nothing shuffles twice.

The order columns must make the FIRST ROW of every block unique (pass a
unique tiebreak column, e.g. an id) — that is how a phase-2 block finds
its own offset; enforced with an explicit check on the driver."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Max, Min

from .join import get_broadcast, put_broadcast


def global_prefix_extremes(
    ds: "ray.data.Dataset",
    order_cols: list[str],
    val_col: str,
) -> dict:
    """{'max': int, 'min': int, 'total': int} of the running sum of
    ``val_col`` over the global ``order_cols`` order."""
    sorted_ds = ds.sort(order_cols).materialize()

    def block_stat(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            cols = {
                "key": pa.array([], type=pa.string()),
                "sub": pa.array([], type=pa.int64()),
            }
            cols["rows"] = pa.array([], type=pa.int64())
            for c in order_cols:
                cols[f"k_{c}"] = pa.array([], type=b.schema.field(c).type)
            return pa.table(cols)
        key = "|".join(str(b[c][0].as_py()) for c in order_cols)
        sub = int(
            b[val_col].to_numpy(zero_copy_only=False).astype(np.int64).sum()
        )
        cols = {
            "key": pa.array([key], type=pa.string()),
            "sub": pa.array([sub], type=pa.int64()),
            "rows": pa.array([b.num_rows], type=pa.int64()),
        }
        for c in order_cols:  # native-typed first-row key (no float coerce)
            cols[f"k_{c}"] = pa.array([b[c][0].as_py()])
        return pa.table(cols)

    stats = [
        r
        for batch in sorted_ds.map_batches(
            block_stat, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True
        ).iter_batches(batch_size=4096, batch_format="pyarrow")
        for r in batch.to_pylist()
    ]
    # driver state: one row per BLOCK. Order blocks by their first-row
    # key (native-typed tuple), build exclusive offsets
    stats.sort(key=lambda r: tuple(r[f"k_{c}"] for c in order_cols))
    keys = [r["key"] for r in stats]
    if len(set(keys)) != len(keys):
        raise ValueError(
            "order_cols do not uniquely identify block starts — add a "
            "unique tiebreak column"
        )
    offsets = {}
    acc = 0
    for r in stats:
        offsets[r["key"]] = (acc, int(r["rows"]))
        acc += int(r["sub"])
    ref = put_broadcast(offsets)

    def block_scan(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "mx": pa.array([], type=pa.int64()),
                    "mn": pa.array([], type=pa.int64()),
                }
            )
        off, expect_rows = get_broadcast(ref)[
            "|".join(str(b[c][0].as_py()) for c in order_cols)
        ]
        if b.num_rows != expect_rows:
            # phase-2 blocks MUST be phase-1's blocks; any re-bundling
            # would silently mis-offset every row after the first block
            raise RuntimeError(
                f"block drift between scan phases: {b.num_rows} rows vs "
                f"{expect_rows} recorded"
            )
        run = off + np.cumsum(
            b[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        )
        return pa.table(
            {
                "mx": pa.array([int(run.max())], type=pa.int64()),
                "mn": pa.array([int(run.min())], type=pa.int64()),
            }
        )

    ext = sorted_ds.map_batches(
        block_scan, batch_size=None, batch_format="pyarrow",
        zero_copy_batch=True
    ).aggregate(Max("mx", alias_name="mx"), Min("mn", alias_name="mn"))
    return {
        "max": int(ext["mx"]) if ext["mx"] is not None else 0,
        "min": int(ext["mn"]) if ext["mn"] is not None else 0,
        "total": acc,
    }
