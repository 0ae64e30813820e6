"""Global ranking / NTILE over a Dataset — a TOTAL order without a total
sort of the data.

(The reference has no ranking — SURVEY.md §2.5 training-pipeline
extension; the per-KEY variant lives in window_fn.py.)

``ROW_NUMBER() OVER (ORDER BY v, id)`` at 100 TB does not need a global
sort: split the rank into

  rank(row) = (# rows with smaller v)  +  (row's position among its v-ties
                                           ordered by id)

The first term comes from an exact value HISTOGRAM (per-block partial
counts → one tiny groupby → driver prefix sums, broadcast once); the
second from ONE hash shuffle on v (``keyed_window`` row numbers). The
shuffle moves each row once and the driver state is |distinct v| —
the operator contract is a bounded order-value domain (lengths, scores,
bucketed floats); quantile-bucket first when v is unbounded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Sum

from .join import get_broadcast, put_broadcast
from .window_fn import keyed_window


def global_rank(
    ds: "object",
    order_col: str,
    id_col: str,
    ntile: int | None = None,
) -> "object":
    """Adds ``rank`` (1-based ROW_NUMBER over (order_col, id_col)) and,
    with ``ntile=k``, ``q{k}`` (SQL NTILE(k) in that order) to every row."""

    def hist_partial(b: pa.Table) -> pa.Table:
        v = b[order_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        u, c = np.unique(v, return_counts=True)
        return pa.table(
            {
                "v": pa.array(u, type=pa.int64()),
                "c": pa.array(c.astype(np.int64), type=pa.int64()),
            }
        )

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("c", alias_name="c"))
        .sort("v")
        .take_all()
    )
    vals = np.array([r["v"] for r in hist], dtype=np.int64)
    cnts = np.array([r["c"] for r in hist], dtype=np.int64)
    base = np.zeros(len(vals), dtype=np.int64)
    np.cumsum(cnts[:-1], out=base[1:])
    total = int(cnts.sum())
    ref = put_broadcast((vals, base))

    ranked = keyed_window(ds, key=order_col, order=id_col)

    def finish(b: pa.Table) -> pa.Table:
        vv, bb = get_broadcast(ref)
        v = b[order_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        rn = b["rn"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(vv, v)
        rank = bb[pos] + rn  # 1-based
        cols = {n: b[n] for n in b.column_names if n != "rn"}
        cols["rank"] = pa.array(rank, type=pa.int64())
        if ntile is not None:
            q, r = divmod(total, ntile)
            r0 = rank - 1
            head = r * (q + 1)
            tile = np.where(
                r0 < head,
                r0 // max(q + 1, 1) + 1,
                (r + (r0 - head) // max(q, 1) + 1) if q > 0 else ntile,
            )
            cols[f"q{ntile}"] = pa.array(
                tile.astype(np.int64), type=pa.int64()
            )
        return pa.table(cols)

    return ranked.map_batches(finish, batch_format="pyarrow")
