"""As-of and range joins — time-ordered join operators Ray Data has no
built-in for, composed per SURVEY.md §2 "custom operators" guidance:
both sides are projected onto one unified schema, unioned, and
hash-partitioned in ONE shuffle into coarse key buckets
(functions/bucketed.py); the merge kernel is vectorized across EVERY key
in a bucket — a union sort by (key, on, side) plus run-segmented
maximum-accumulate (as-of) or probe-event prefix counts (range agg), so
per-group Python cost is O(buckets), never O(#keys).

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


def _col_np(g: pa.Table, name: str) -> np.ndarray:
    """Null-safe numpy view of a union-schema column: the OTHER side's
    rows are null here (never read), but a raw to_numpy would upcast the
    whole column to float NaN — fill first, keep the integer dtype."""
    c = g[name]
    if isinstance(c, pa.ChunkedArray):
        c = c.combine_chunks()
    if c.null_count:
        c = c.fill_null(0)
    return c.to_numpy(zero_copy_only=False)


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
        """Vectorized across EVERY key in one coarse bucket: sort the
        UNION of both sides by (key, on, side, right-tiebreak) with
        rights preceding lefts at equal ``on``, then the backward as-of
        match is a run-segmented maximum-accumulate over right-row
        positions (the forward-fill pattern) — no per-key Python, no
        per-key searchsorted."""
        n = g.num_rows
        if n == 0:
            return out_schema.empty_table()
        side = g[_SIDE].to_numpy(zero_copy_only=False)
        kcol = g[by]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        enc = (
            kcol
            if pa.types.is_dictionary(kcol.type)
            else kcol.dictionary_encode()
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        is_r = side == 1
        onv = np.where(
            is_r,
            _col_np(g, on_r),
            _col_np(g, on),
        )
        # rights sort BEFORE lefts at equal on (<= is inclusive); within
        # equal (key, on) rights, ascending tiebreak puts the winner last
        side_sort = (~is_r).astype(np.int8)
        if tb_r is not None:
            tb = np.where(is_r, _col_np(g, tb_r), 0)
            order = np.lexsort((tb, side_sort, onv, codes))
        else:
            order = np.lexsort(
                (np.arange(n, dtype=np.int64), side_sort, onv, codes)
            )
        ks = codes[order]
        starts = np.concatenate(([0], np.flatnonzero(ks[1:] != ks[:-1]) + 1))
        sizes = np.diff(np.concatenate((starts, [n])))
        start_rep = np.repeat(starts, sizes)
        r_sorted_mask = is_r[order]
        pos = np.where(r_sorted_mask, np.arange(n, dtype=np.int64), -1)
        last = np.maximum.accumulate(pos)
        miss = last < start_rep  # carried from a previous key's run
        lpos = np.flatnonzero(~r_sorted_mask)  # left rows, sorted order
        match_sorted = last[lpos]
        valid = ~miss[lpos]
        take = order[np.maximum(match_sorted, 0)]  # original g row index
        lt_idx = order[lpos]
        if tolerance is not None:
            l_onv = onv[lt_idx]
            r_onv = onv[take]
            valid &= (l_onv - r_onv) <= tolerance
        lt = g.take(pa.array(lt_idx, type=pa.int64()))
        if how == "inner":
            keep = np.flatnonzero(valid)
            if keep.size == 0:
                return out_schema.empty_table()
            lt = lt.take(pa.array(keep, type=pa.int64()))
            matched = g.take(pa.array(take[keep], type=pa.int64()))
            cols = {name: lt[name] for name in lnames}
            cols.update({name: matched[name] for name in r_out})
        else:
            take_arr = pa.array(
                take.astype(np.int64), type=pa.int64(), mask=~valid
            )
            cols = {name: lt[name] for name in lnames}
            for name in r_out:
                cols[name] = pc.take(
                    g[name].combine_chunks()
                    if isinstance(g[name], pa.ChunkedArray)
                    else g[name],
                    take_arr,
                )
        return pa.table(cols, schema=out_schema)

    from .bucketed import bucketed_group_kernel

    return bucketed_group_kernel(both, by, merge)


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
        """Vectorized across EVERY key in one coarse bucket: the two
        searchsorted probes become PROBE EVENTS at ``l.on+lo`` / ``l.on+hi``
        merged into one (key, value, probe-before-right) sort with the
        right rows; a run-segmented exclusive prefix count/sum at each
        probe position gives count(on < bound) and sum(on < bound) per
        key, and the window aggregate is the B−A difference — no per-key
        Python, no per-key searchsorted."""
        n = g.num_rows
        if n == 0:
            return out_schema.empty_table()
        side = g[_SIDE].to_numpy(zero_copy_only=False)
        is_r = side == 1
        kcol = g[by]
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        enc = (
            kcol
            if pa.types.is_dictionary(kcol.type)
            else kcol.dictionary_encode()
        )
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        onv = np.where(is_r, _col_np(g, on_r), _col_np(g, on))
        vals = np.where(is_r, _col_np(g, val_r), 0).astype(np.int64)
        r_idx = np.flatnonzero(is_r)
        l_idx = np.flatnonzero(~is_r)
        nl, nr = len(l_idx), len(r_idx)
        if nl == 0:
            return out_schema.empty_table()
        ev_key = np.concatenate((codes[r_idx], codes[l_idx], codes[l_idx]))
        ev_val = np.concatenate(
            (onv[r_idx], onv[l_idx] + lo, onv[l_idx] + hi)
        )
        # probes sort BEFORE rights at equal value: bound semantics match
        # searchsorted side="left" (on == l+lo counts, on == l+hi doesn't)
        ev_isr = np.concatenate(
            (np.ones(nr, dtype=np.int8), np.zeros(2 * nl, dtype=np.int8))
        )
        ev_w = np.concatenate((vals[r_idx], np.zeros(2 * nl, np.int64)))
        order = np.lexsort((ev_isr, ev_val, ev_key))
        k = ev_key[order]
        isr = ev_isr[order].astype(np.int64)
        w = ev_w[order]
        m = len(order)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        sizes = np.diff(np.concatenate((starts, [m])))
        before_n = np.cumsum(isr) - isr
        before_s = np.cumsum(w) - w
        base_n = np.repeat(before_n[starts], sizes)
        base_s = np.repeat(before_s[starts], sizes)
        cnt = before_n - base_n
        ssum = before_s - base_s
        ev_pos = np.empty(m, dtype=np.int64)
        ev_pos[order] = np.arange(m, dtype=np.int64)
        pa_pos = ev_pos[nr : nr + nl]
        pb_pos = ev_pos[nr + nl :]
        lt = g.take(pa.array(l_idx, type=pa.int64()))
        cols = {name: lt[name] for name in lnames}
        cols[n_out] = pa.array(cnt[pb_pos] - cnt[pa_pos])
        cols[s_out] = pa.array(ssum[pb_pos] - ssum[pa_pos])
        return pa.table(cols, schema=out_schema)

    from .bucketed import bucketed_group_kernel

    return bucketed_group_kernel(both, by, merge)
