"""Broadcast hash join — the one join shape a 100 TB pipeline can afford
freely: the SMALL side is put in the object store ONCE (``ray.put``) and
each ``map_batches`` task reads it zero-copy from its node's plasma store;
the big side streams, nothing shuffles. (The reference has no joins —
SURVEY.md §2.5; this is the training-pipeline extension. Shuffle joins are
deliberately out of scope: every use in our query set has a small side.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def broadcast_hash_join(
    big: "ray.data.Dataset",
    small: pa.Table,
    big_key: str,
    small_key: str,
    how: str = "inner",
) -> "ray.data.Dataset":
    """Join ``big`` (streamed) against ``small`` (broadcast pa.Table).

    ``how``: "inner" or "left" (left = keep unmatched big rows with nulls).
    Small-side columns (minus its key) are appended to big-side batches."""
    if how not in ("inner", "left"):
        raise ValueError(how)
    small_df = small.to_pandas().set_index(small_key)
    ref = ray.put(small_df) if ray.is_initialized() else small_df

    def join_batch(batch: pa.Table) -> pa.Table:
        sdf = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        bdf = batch.to_pandas()
        out = bdf.join(sdf, on=big_key, how=how)
        return pa.Table.from_pandas(out, preserve_index=False)

    return big.map_batches(join_batch, batch_format="pyarrow")


def count_lookup(
    big: "ray.data.Dataset",
    counts: dict,
    key: str,
    out_col: str = "n",
) -> "ray.data.Dataset":
    """Append a broadcast count column (0 for missing keys) — the cheap half
    of a LEFT JOIN + GROUP BY count pattern (TPC-H Q13 shape)."""
    ref = ray.put(counts) if ray.is_initialized() else counts

    def add(batch: pa.Table) -> pa.Table:
        c = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        keys = batch[key].to_numpy(zero_copy_only=False)
        vals = np.fromiter((c.get(int(k), 0) for k in keys), dtype=np.int64,
                           count=len(keys))
        return batch.append_column(out_col, pa.array(vals))

    return big.map_batches(add, batch_format="pyarrow")
