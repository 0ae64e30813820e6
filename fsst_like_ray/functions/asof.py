"""As-of and range joins — time-ordered join operators Ray Data has no
built-in for, composed per SURVEY.md §2 "custom operators" guidance:
both sides are projected onto one unified schema, unioned, and
hash-partitioned by the key in ONE shuffle; the per-key sort-merge is a
vectorized ``np.searchsorted`` inside ``groupby(by).map_groups``.

``asof_join``: for every left row, the right row with the greatest
``on`` value that is ``<=`` the left's ``on`` (optionally within
``tolerance``) — the classic event-analytics "most recent prior
observation" join (pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
semantics, backward direction).

``range_agg_join``: for every left row, COUNT and SUM aggregates over
right rows whose ``on`` falls in ``[left.on + lo, left.on + hi)`` —
a windowed interval join that never materializes the pair blow-up:
within each key group the bounds are two searchsorted probes against
prefix sums.

Partitioning assumptions (documented for 100 TB):
- one hash shuffle on ``by``; each key's combined (left + right) rows
  must fit a worker — the same contract as ``sessionize``. For
  unbounded keys, time-slice with a per-(key, slice) boundary carry of
  the last right row before each slice start (the sessionize_sliced
  pattern); not needed for the keyed event streams this engine targets.
- ties on the right ``on`` are broken deterministically by
  ``right_tiebreak`` (highest wins), so retried tasks emit identical
  bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_SIDE = "__asof_side__"


def _arrow_fields(ds: "ray.data.Dataset") -> list[tuple[str, pa.DataType]]:
    s = ds.schema()
    return list(zip(s.names, s.types))


def _on_type(t: pa.DataType) -> pa.DataType:
    # timestamps join in integer microseconds; everything else as-is
    return pa.int64() if pa.types.is_timestamp(t) else t


def _project(fields, have: dict, side: int):
    """Batch fn mapping one side onto the unified schema (missing
    columns null-filled), vectorized column-at-a-time."""

    def fn(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {}
        for name, typ in fields:
            src = have.get(name)
            if src is None:
                cols[name] = pa.nulls(n, type=typ)
            else:
                c = b[src]
                cols[name] = c.cast(typ) if c.type != typ else c
        cols[_SIDE] = pa.array(np.full(n, side, dtype=np.int8))
        return pa.table(cols)

    return fn


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    by: str,
    on: str,
    how: str = "inner",
    tolerance: int | None = None,
    right_suffix: str = "_r",
    right_tiebreak: str | None = None,
):
    """Backward as-of join: each left row gains the right row with the
    greatest ``on`` <= left ``on`` (within ``tolerance`` units of the
    ``on`` column, if given) for the same ``by`` key.

    Output columns: all left columns (original names) + every right
    column except ``by`` suffixed with ``right_suffix``. ``how`` is
    ``"inner"`` (drop unmatched left rows) or ``"left"`` (null-filled).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    lf = _arrow_fields(left)
    rf = _arrow_fields(right)
    lnames = [n for n, _ in lf]
    fields: list[tuple[str, pa.DataType]] = []
    have_l: dict = {}
    have_r: dict = {}
    for n, t in lf:
        t = _on_type(t) if n == on else t
        fields.append((n, t))
        have_l[n] = n
    r_out: list[str] = []
    for n, t in rf:
        if n == by:
            have_r[by] = by
            continue
        out = n + right_suffix
        if out in lnames:
            raise ValueError(
                f"right column {n!r} suffixed to {out!r} collides with a "
                "left column; pass a different right_suffix"
            )
        t = _on_type(t) if n == on else t
        fields.append((out, t))
        have_r[out] = n
        r_out.append(out)
    on_r = on + right_suffix
    tb_r = right_tiebreak + right_suffix if right_tiebreak else None
    out_schema = pa.schema(fields)

    both = left.map_batches(
        _project(fields, have_l, 0), batch_format="pyarrow"
    ).union(
        right.map_batches(_project(fields, have_r, 1), batch_format="pyarrow")
    )

    def merge(g: pa.Table) -> pa.Table:
        side = g[_SIDE].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0)).select(out_schema.names)
        rt = g.filter(pa.array(side == 1)).select(out_schema.names)
        if lt.num_rows == 0:
            return out_schema.empty_table()
        l_on = lt[on].to_numpy(zero_copy_only=False)
        r_on = rt[on_r].to_numpy(zero_copy_only=False)
        if tb_r is not None:
            order = np.lexsort(
                (rt[tb_r].to_numpy(zero_copy_only=False), r_on)
            )
        else:
            order = np.argsort(r_on, kind="stable")
        r_sorted = r_on[order]
        # side="right": index past all equal values, so idx-1 lands on the
        # LAST (max-tiebreak) right row with on <= left on
        idx = np.searchsorted(r_sorted, l_on, side="right") - 1
        valid = idx >= 0
        take = order[np.maximum(idx, 0)]
        if tolerance is not None:
            valid &= (l_on - r_sorted[np.maximum(idx, 0)]) <= tolerance
        if how == "inner":
            lt = lt.filter(pa.array(valid))
            take = take[valid]
            if lt.num_rows == 0:
                return out_schema.empty_table()
            matched = rt.take(take)
            cols = {n: lt[n] for n in lnames}
            cols.update({n: matched[n] for n in r_out})
        else:
            take_arr = pa.array(
                np.where(valid, take, -1), type=pa.int64()
            )
            take_arr = pc.if_else(
                pc.greater_equal(take_arr, 0), take_arr, pa.nulls(len(valid), pa.int64())
            )
            cols = {n: lt[n] for n in lnames}
            for n in r_out:
                cols[n] = rt[n].take(take_arr)
        return pa.table(cols, schema=out_schema)

    return both.groupby(by).map_groups(merge, batch_format="pyarrow")


def range_agg_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    by: str,
    on: str,
    lo: int,
    hi: int,
    value: str,
    right_suffix: str = "_r",
):
    """For each left row: ``n{right_suffix}`` = count of right rows with
    the same ``by`` key and ``on`` in ``[left.on + lo, left.on + hi)``,
    and ``sum{right_suffix}`` = int64 sum of the right ``value`` column
    over those rows (pass integer units — e.g. cents — for exactness).

    Never materializes pairs: two searchsorted probes against the
    per-key sorted right side + a prefix-sum difference.
    """
    lf = _arrow_fields(left)
    lnames = [n for n, _ in lf]
    fields = [(n, _on_type(t) if n == on else t) for n, t in lf]
    on_r = "__on" + right_suffix
    val_r = "__val" + right_suffix
    fields += [(on_r, pa.int64()), (val_r, pa.int64())]
    have_l = {n: n for n in lnames}
    have_r = {by: by, on_r: on, val_r: value}
    n_out, s_out = "n" + right_suffix, "sum" + right_suffix
    out_schema = pa.schema(
        [(n, t) for n, t in fields if not n.startswith("__on") and not n.startswith("__val")]
        + [(n_out, pa.int64()), (s_out, pa.int64())]
    )

    both = left.map_batches(
        _project(fields, have_l, 0), batch_format="pyarrow"
    ).union(
        right.map_batches(_project(fields, have_r, 1), batch_format="pyarrow")
    )

    def merge(g: pa.Table) -> pa.Table:
        side = g[_SIDE].to_numpy(zero_copy_only=False)
        lt = g.filter(pa.array(side == 0))
        rt = g.filter(pa.array(side == 1))
        if lt.num_rows == 0:
            return out_schema.empty_table()
        l_on = lt[on].to_numpy(zero_copy_only=False)
        r_on = rt[on_r].to_numpy(zero_copy_only=False)
        order = np.argsort(r_on, kind="stable")
        r_sorted = r_on[order]
        vals = rt[val_r].to_numpy(zero_copy_only=False)[order]
        csum = np.concatenate(([0], np.cumsum(vals, dtype=np.int64)))
        a = np.searchsorted(r_sorted, l_on + lo, side="left")
        b = np.searchsorted(r_sorted, l_on + hi, side="left")
        cols = {n: lt[n] for n in lnames}
        cols[n_out] = pa.array((b - a).astype(np.int64))
        cols[s_out] = pa.array(csum[b] - csum[a])
        return pa.table(cols, schema=out_schema)

    return both.groupby(by).map_groups(merge, batch_format="pyarrow")
