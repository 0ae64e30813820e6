"""Misra-Gries heavy hitters — a mergeable frequency sketch + exact verify.

(The reference has no sketches — SURVEY.md §2.5; training-pipeline
extension alongside the HLL in ``sketches.py``.)

The problem at 100 TB: "every item with frequency ≥ s" cannot be answered
with an exact group-by when the item domain is unbounded (n-grams, URLs,
user agents) — the partial tables themselves explode. The Misra-Gries
summary (public algorithm; mergeability per Agarwal et al., "Mergeable
Summaries", PODS 2012) keeps k = ⌈2/s⌉ counters REGARDLESS of data size
and guarantees every item with true count > n/(k+1) survives, with
undercount ≤ n/(k+1). With k = ⌈2/s⌉ the undercount bound is s·n/2, so
every true heavy hitter (count ≥ s·n) is retained — memory ∝ 1/s, not
∝ |domain|.

Two-phase shape (sketch → exact verify), the standard production pattern:

1. per-batch exact counts are MG-compressed to k counters; per-block
   partials (≤ k rows + one total-weight row each) merge on the driver by
   group-sum + one final MG compression — candidates are a superset of
   the true heavy hitters;
2. a second streaming pass exact-counts ONLY the candidates (broadcast
   sorted candidate array + searchsorted membership) and filters by the
   exact threshold ⌈s·n⌉ — so the OUTPUT is exact and oracle-checkable,
   while memory stays O(1/s + |candidates|).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .join import get_broadcast, put_broadcast


def mg_compress(
    items: np.ndarray, counts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Reduce a counter multiset to ≤ k counters: subtract the (k+1)-th
    largest count from all, keep positives (the MG decrement step,
    vectorized — equivalent to repeated decrement-all-by-one)."""
    if len(items) <= k:
        return items, counts
    # (k+1)-th largest via partition (O(n), no full sort)
    delta = np.partition(counts, len(counts) - k - 1)[len(counts) - k - 1]
    kept = counts > delta
    return items[kept], counts[kept] - delta


def heavy_hitters(
    ds,
    items_fn,
    support: float,
    min_k: int = 16,
    pairs_fn=None,
) -> pa.Table:
    """Items with exact frequency ≥ ``support`` of the total item stream.

    ``items_fn(batch) -> np.ndarray`` flattens a batch into its item
    stream (strings or ints; must never yield nulls — a null item row is
    the per-block total-weight sentinel). ``pairs_fn(batch) ->
    (unique items, counts)`` replaces the flatten+unique when the caller
    already holds the batch's multiset — the whole-table store feeds
    dictionary bincounts through this hook, never materializing a row.
    Returns an Arrow table (item, n) with EXACT counts, guaranteed
    complete: phase-1 recall is the MG bound, phase 2 re-counts
    candidates exactly."""
    if not (0 < support < 1):
        raise ValueError("support must be in (0, 1)")
    k = max(min_k, math.ceil(2.0 / support))

    def batch_pairs(b: pa.Table):
        if pairs_fn is not None:
            u, c = pairs_fn(b)
            return np.asarray(u), np.asarray(c)
        return np.unique(items_fn(b), return_counts=True)

    def partial(b: pa.Table) -> pa.Table:
        u, c = batch_pairs(b)
        item_type = (
            pa.int64() if u.dtype.kind in ("i", "u") else pa.string()
        )
        u2, c2 = mg_compress(u, c.astype(np.int64), k)
        item_arr = (
            pa.array(u2).cast(item_type)
            if len(u2)
            else pa.array([], type=item_type)
        )
        return pa.table(
            {
                # null item row carries the block's total weight
                "item": pa.concat_arrays(
                    [item_arr, pa.nulls(1, type=item_type)]
                ),
                "cnt": pa.array(
                    np.r_[c2, int(c.sum())].astype(np.int64), type=pa.int64()
                ),
            }
        )

    # phase 1: per-block MG partials (≤ k+1 rows each) → driver merge.
    # At 256 nodes × k≈1e3 this is ≤ a few hundred k rows — driver-safe by
    # construction, independent of corpus size.
    parts = []
    for blk in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=4096, batch_format="pyarrow"
    ):
        if blk.num_rows:
            parts.append(blk)
    if not parts:
        return pa.table(
            {
                "item": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    merged = pa.concat_tables(parts)
    is_tot = merged["item"].is_null().to_numpy(zero_copy_only=False)
    cnts = merged["cnt"].to_numpy(zero_copy_only=False)
    n_total = int(cnts[is_tot].sum())
    threshold = math.ceil(support * n_total)
    live = merged.filter(pa.array(~is_tot))
    items = live["item"].to_numpy(zero_copy_only=False)
    cvals = live["cnt"].to_numpy(zero_copy_only=False)
    # group-sum the partials (one argsort), then one final compression
    order = np.argsort(items, kind="stable")
    si, sc = items[order], cvals[order]
    starts = np.flatnonzero(np.r_[True, si[1:] != si[:-1]])
    gi = si[starts]
    gc = np.add.reduceat(sc, starts)
    cand, _ = mg_compress(gi, gc, k)
    if not len(cand):
        return pa.table(
            {
                "item": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    cand = np.sort(cand)
    ref = put_broadcast(cand)

    # phase 2: exact recount of candidates only
    def recount(b: pa.Table) -> pa.Table:
        cs = get_broadcast(ref)
        u, c = batch_pairs(b)
        idx = np.searchsorted(cs, u)
        np.minimum(idx, len(cs) - 1, out=idx)
        hit = cs[idx] == u
        return pa.table(
            {
                "item": pa.array(u[hit]),
                "cnt": pa.array(c[hit].astype(np.int64), type=pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    exact = (
        ds.map_batches(recount, batch_format="pyarrow")
        .groupby("item")
        .aggregate(Sum("cnt", alias_name="n"))
        .filter(expr=f"n >= {threshold}")
    )
    out = [
        b
        for b in exact.iter_batches(batch_size=65536, batch_format="pyarrow")
        if b.num_rows
    ]
    if not out:
        return pa.table(
            {
                "item": pa.array([], type=pa.string()),
                "n": pa.array([], type=pa.int64()),
            }
        )
    t = pa.concat_tables(out)
    return pa.table({"item": t["item"], "n": t["n"].cast(pa.int64())})


def bigram_stream(batch: pa.Table, col: str = "text") -> np.ndarray:
    """Flatten a text batch into its word-bigram stream (same tokenizer
    contract as vocab.word_bigram_partials, so the SQL oracle is shared)."""
    import pyarrow.compute as pc

    from .vocab import tokenize_rows

    values, row_ids, keep = tokenize_rows(batch, col)
    toks = values.filter(pa.array(keep))
    rows = row_ids[keep]
    if len(rows) < 2:
        return np.zeros(0, dtype="U1")
    same = rows[:-1] == rows[1:]
    idx = np.flatnonzero(same)
    joined = pc.binary_join_element_wise(
        toks.take(pa.array(idx)), toks.take(pa.array(idx + 1)), " "
    )
    return joined.to_numpy(zero_copy_only=False)
