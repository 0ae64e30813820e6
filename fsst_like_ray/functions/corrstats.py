"""Grouped exact-integer covariance / correlation partials.

The (n, Σx, Σy, Σxy, Σx², Σy²) sufficient-statistic family behind
Pearson r, covariance and least-squares slopes, as a partial-then-merge
aggregate: each batch reduces to one row per group key (int64 sums over
quantized integer inputs), the shuffle moves only those tiny partial
rows, and a final groupby Sum merges them. Keeping every statistic in
exact integers makes the result independent of reduction order — the
same bit pattern on any cluster size — so it is hash-comparable against
a SQL oracle (float covariance would drift with partial ordering).

Derived floats (r, cov) are left to the CALLER from the exact sums;
this module never emits a float. Reference analog: the match-count
aggregation pattern (src/BenchmarkDriver.cpp:66-79) — per-block partial,
driver merge — generalized to the second-moment family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _quantize(col: pa.ChunkedArray, scale: int) -> np.ndarray:
    v = col.to_numpy(zero_copy_only=False).astype(np.float64)
    return np.rint(v * scale).astype(np.int64)


def grouped_corr_stats(
    ds,
    key: str,
    x: str,
    y: str,
    x_scale: int = 1,
    y_scale: int = 1,
):
    """Per-``key`` exact sufficient statistics for corr(x, y).

    ``x_scale`` / ``y_scale`` quantize float columns to integers
    (e.g. 100 → cents) BEFORE any sum, so all six statistics are exact
    int64 and merge deterministically. Rows where either input is null
    are dropped (SQL corr semantics). Returns a Dataset with columns
    ``(key, n, sum_x, sum_y, sum_xy, sum_xx, sum_yy)``.
    """
    import ray.data
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        mask = pa.compute.and_(
            b[x].combine_chunks().is_valid(), b[y].combine_chunks().is_valid()
        )
        if not pa.compute.all(mask).as_py():
            b = b.filter(mask)
        if b.num_rows == 0:
            return pa.table(
                {
                    key: pa.array([], b.schema.field(key).type),
                    "n": pa.array([], pa.int64()),
                    "sum_x": pa.array([], pa.int64()),
                    "sum_y": pa.array([], pa.int64()),
                    "sum_xy": pa.array([], pa.int64()),
                    "sum_xx": pa.array([], pa.int64()),
                    "sum_yy": pa.array([], pa.int64()),
                }
            )
        xs = _quantize(b[x], x_scale)
        ys = _quantize(b[y], y_scale)
        t = pa.table(
            {
                key: b[key],
                "n": pa.array(np.ones(b.num_rows, dtype=np.int64)),
                "sum_x": pa.array(xs),
                "sum_y": pa.array(ys),
                "sum_xy": pa.array(xs * ys),
                "sum_xx": pa.array(xs * xs),
                "sum_yy": pa.array(ys * ys),
            }
        )
        g = t.group_by(key).aggregate(
            [
                ("n", "sum"),
                ("sum_x", "sum"),
                ("sum_y", "sum"),
                ("sum_xy", "sum"),
                ("sum_xx", "sum"),
                ("sum_yy", "sum"),
            ]
        )
        cols = {key: g[key]}
        for c in ("n", "sum_x", "sum_y", "sum_xy", "sum_xx", "sum_yy"):
            cols[c] = g[f"{c}_sum"].cast(pa.int64())
        return pa.table(cols)

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_x", alias_name="sum_x"),
            Sum("sum_y", alias_name="sum_y"),
            Sum("sum_xy", alias_name="sum_xy"),
            Sum("sum_xx", alias_name="sum_xx"),
            Sum("sum_yy", alias_name="sum_yy"),
        )
    )

    def finalize(b: pa.Table) -> pa.Table:
        cols = {key: b[key]}
        for c in ("n", "sum_x", "sum_y", "sum_xy", "sum_xx", "sum_yy"):
            cols[c] = b[c].cast(pa.int64())
        return pa.table(cols)

    return merged.map_batches(finalize, batch_format="pyarrow")


def pearson_from_stats(row: dict) -> float:
    """Pearson r from one exact-stats row (driver-side convenience)."""
    n = row["n"]
    cov = n * row["sum_xy"] - row["sum_x"] * row["sum_y"]
    vx = n * row["sum_xx"] - row["sum_x"] ** 2
    vy = n * row["sum_yy"] - row["sum_y"] ** 2
    if vx <= 0 or vy <= 0:
        return float("nan")
    return cov / (vx**0.5 * vy**0.5)
