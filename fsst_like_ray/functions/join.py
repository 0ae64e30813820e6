"""Broadcast hash join — the one join shape a 100 TB pipeline can afford
freely: the SMALL side is put in the object store ONCE (``ray.put``) and
each ``map_batches`` task reads it zero-copy from its node's plasma store;
the big side streams, nothing shuffles. (The reference has no joins —
SURVEY.md §2.5; this is the training-pipeline extension. Shuffle joins are
deliberately out of scope: every use in our query set has a small side.)

Kernels are Arrow/NumPy end to end: the small side is sorted by key once on
the driver; each batch probes it with ``np.searchsorted`` and appends the
matching small-side rows via ``pa.Table.take`` — no pandas conversion in
the streamed path.
"""

from __future__ import annotations

import numpy as np
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
    Small-side columns (minus its key) are appended to big-side batches.
    Small-side keys must be UNIQUE (dimension-table contract; checked)."""
    if how not in ("inner", "left"):
        raise ValueError(how)
    keys = small[small_key].to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    skeys = keys[order]
    if len(skeys) > 1 and (skeys[1:] == skeys[:-1]).any():
        raise ValueError(
            "broadcast_hash_join: small-side keys must be unique"
        )
    stbl = small.take(pa.array(order)).drop_columns([small_key])
    payload = (skeys, stbl)
    ref = ray.put(payload) if ray.is_initialized() else payload

    def join_batch(batch: pa.Table) -> pa.Table:
        sk, st = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        clash = set(st.column_names) & set(batch.column_names)
        if clash:
            # checked per batch (a dataset-level schema() probe can trigger
            # execution); append_column would otherwise silently create
            # duplicate names and make later tbl[name] lookups ambiguous
            raise ValueError(
                f"broadcast_hash_join: small-side columns {sorted(clash)} "
                "collide with big-side names — rename before joining"
            )
        bk = batch[big_key].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(sk, bk)
        np.minimum(idx, max(len(sk) - 1, 0), out=idx)
        found = sk[idx] == bk if len(sk) else np.zeros(len(bk), dtype=bool)
        if how == "inner":
            rows = np.flatnonzero(found)
            out = batch.take(pa.array(rows))
            picked = st.take(pa.array(idx[rows]))
        else:  # left: null small-side columns where unmatched
            out = batch
            picked = st.take(pa.array(idx.astype(np.int64), mask=~found))
        for name in picked.column_names:
            out = out.append_column(name, picked[name])
        return out

    return big.map_batches(join_batch, batch_format="pyarrow")


def count_lookup(
    big: "ray.data.Dataset",
    keys: np.ndarray,
    values: np.ndarray,
    key: str,
    out_col: str = "n",
) -> "ray.data.Dataset":
    """Append a broadcast count column (0 for missing keys) — the cheap half
    of a LEFT JOIN + GROUP BY count pattern (TPC-H Q13 shape). ``keys`` and
    ``values`` are parallel arrays (any order); probed with searchsorted —
    no per-row Python dict lookups."""
    keys = np.asarray(keys)
    values = np.asarray(values, dtype=np.int64)
    order = np.argsort(keys, kind="stable")
    payload = (keys[order], values[order])
    ref = ray.put(payload) if ray.is_initialized() else payload

    def add(batch: pa.Table) -> pa.Table:
        sk, sv = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        bk = batch[key].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(sk, bk)
        np.minimum(idx, max(len(sk) - 1, 0), out=idx)
        found = sk[idx] == bk if len(sk) else np.zeros(len(bk), dtype=bool)
        vals = np.where(found, sv[idx] if len(sk) else 0, 0)
        return batch.append_column(out_col, pa.array(vals, type=pa.int64()))

    return big.map_batches(add, batch_format="pyarrow")
