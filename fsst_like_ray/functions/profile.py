"""Table profiler — the standard "what's in this table" operator: per
column, row count, null count, EXACT distinct count, and (for integer
columns) min/max. TWO streaming aggregations over the input (counters,
then distincts — Ray Data executes each aggregate as its own read; at
whole-corpus scale prefer one pass with the approximate HLL profile and
accept ±2%). Partial shapes:

- counters (n, n_null, min, max): one tiny row per (batch, column),
  merged by sums / extrema — the shuffle moves O(columns) rows per block;
- distinct counts: per-batch DISTINCT (column, value-string) pairs
  deduplicated again by ONE groupby — the shuffle moves at most the
  table's distinct-value universe, never rows. Exactness costs that
  shuffle; at whole-corpus scale prefer the mergeable HLL sketch
  (functions/sketches.py) and accept ±2%.

Value strings use repr-faithful casts (Arrow cast to string), so two
values collide iff they are equal — distinct-of-strings == distinct-of-
values for the int/string/timestamp columns this profiles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def _counter_partial(batch: pa.Table, int_cols: set[str]) -> pa.Table:
    import pyarrow.compute as pc

    cols, ns, nulls, mins, maxs = [], [], [], [], []
    for name in batch.column_names:
        col = batch[name]
        cols.append(name)
        ns.append(batch.num_rows)
        nulls.append(int(col.null_count))
        if name in int_cols and batch.num_rows > col.null_count:
            mins.append(int(pc.min(col).as_py()))
            maxs.append(int(pc.max(col).as_py()))
        else:
            mins.append(None)
            maxs.append(None)
    return pa.table(
        {
            "column": pa.array(cols, type=pa.string()),
            "n_rows": pa.array(ns, type=pa.int64()),
            "n_null": pa.array(nulls, type=pa.int64()),
            "min_i": pa.array(mins, type=pa.int64()),
            "max_i": pa.array(maxs, type=pa.int64()),
        }
    )


def _distinct_partial(batch: pa.Table) -> pa.Table:
    cols, vals = [], []
    for name in batch.column_names:
        col = batch[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        u = col.drop_null().unique().cast(pa.string())
        cols.extend([name] * len(u))
        vals.append(u)
    return pa.table(
        {
            "column": pa.array(cols, type=pa.string()),
            "value": pa.concat_arrays(vals)
            if vals
            else pa.array([], type=pa.string()),
        }
    )


def profile_table(
    ds: "ray.data.Dataset", int_cols: list[str] | None = None
) -> pa.Table:
    """Profile every column of ``ds``: returns one row per column with
    (n_rows, n_null, n_distinct exact, min_i/max_i for ``int_cols``).
    Column order follows the dataset schema; the result is ~columns rows,
    driver-safe by construction."""
    schema = ds.schema()
    names = list(schema.names)
    ints = set(
        int_cols
        if int_cols is not None
        else [
            n
            for n, t in zip(schema.names, schema.types)
            if pa.types.is_integer(t)
        ]
    )
    counters = (
        ds.map_batches(
            lambda b: _counter_partial(b, ints), batch_format="pyarrow"
        )
        .groupby("column")
        .aggregate(
            Sum("n_rows", alias_name="n_rows"),
            Sum("n_null", alias_name="n_null"),
            Min("min_i", alias_name="min_i"),
            Max("max_i", alias_name="max_i"),
        )
        .to_pandas()
        .set_index("column")
    )
    distinct = (
        ds.map_batches(_distinct_partial, batch_format="pyarrow")
        .groupby(["column", "value"])
        .aggregate(Count(alias_name="_c"))
        .groupby("column")
        .aggregate(Count(alias_name="n_distinct"))
        .to_pandas()
        .set_index("column")
    )
    rows = {
        "column": [],
        "n_rows": [],
        "n_null": [],
        "n_distinct": [],
        "min_i": [],
        "max_i": [],
    }
    for n in names:
        c = counters.loc[n]
        rows["column"].append(n)
        rows["n_rows"].append(int(c["n_rows"]))
        rows["n_null"].append(int(c["n_null"]))
        rows["n_distinct"].append(
            int(distinct.loc[n]["n_distinct"]) if n in distinct.index else 0
        )
        is_int = n in ints and not (
            c["min_i"] is None or (isinstance(c["min_i"], float) and np.isnan(c["min_i"]))
        )
        rows["min_i"].append(int(c["min_i"]) if is_int else None)
        rows["max_i"].append(int(c["max_i"]) if is_int else None)
    return pa.table(
        {
            "col": pa.array(rows["column"], type=pa.string()),
            "n_rows": pa.array(rows["n_rows"], type=pa.int64()),
            "n_null": pa.array(rows["n_null"], type=pa.int64()),
            "n_distinct": pa.array(rows["n_distinct"], type=pa.int64()),
            "min_i": pa.array(rows["min_i"], type=pa.int64()),
            "max_i": pa.array(rows["max_i"], type=pa.int64()),
        }
    )
