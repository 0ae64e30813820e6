"""Per-group top-k — rows, not aggregates: the k best rows of every key
by (score desc, tiebreak asc), deterministic under any partitioning.

Canonical partial-then-merge shape: each batch pre-prunes to ≤k rows per
key it contains (vectorized lexsort + run segmentation — no per-key
Python), so the ONE shuffle moves at most k × (#keys × #blocks-holding-
that-key) rows, never the dataset; the per-key merge re-applies the same
selection. The tiebreak column makes results identical regardless of
which blocks rows landed in (a retry or repartition cannot change the
answer).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _topk_table(t: pa.Table, key: str, score: str, tiebreak: str, k: int):
    """Vectorized per-key top-k of one in-memory table."""
    if t.num_rows == 0:
        return t
    kv = t[key]
    if isinstance(kv, pa.ChunkedArray):
        kv = kv.combine_chunks()
    enc = kv.dictionary_encode() if not pa.types.is_dictionary(kv.type) else kv
    kcodes = enc.indices.to_numpy(zero_copy_only=False)
    s = t[score].to_numpy(zero_copy_only=False)
    tb = t[tiebreak].to_numpy(zero_copy_only=False)
    # sort by (key, score desc, tiebreak asc); np.lexsort: last key primary.
    # Descending via NEGATED DENSE RANKS, not -s: negating the raw score
    # wraps unsigned dtypes and overflows INT64_MIN
    s_rank = np.unique(s, return_inverse=True)[1]
    order = np.lexsort((tb, -s_rank, kcodes))
    ks = kcodes[order]
    # rank within key run = position - run start
    starts = np.concatenate(([0], np.flatnonzero(np.diff(ks)) + 1))
    pos = np.arange(len(ks))
    run_id = np.searchsorted(starts, pos, side="right") - 1
    rank = pos - starts[run_id]
    keep = order[rank < k]
    keep.sort()  # preserve input order within the batch
    return t.take(pa.array(keep))


def grouped_topk(
    ds: "ray.data.Dataset",
    key: str,
    score: str,
    k: int,
    tiebreak: str,
    n_buckets: int = 64,
):
    """Top-k rows per key by (score desc, tiebreak asc). ``score`` and
    ``tiebreak`` must be numeric; all columns ride through.

    Scale shape: the per-batch partial prunes to ≤k rows per key, then
    the merge runs through :func:`..bucketed.bucketed_group_kernel` —
    ONE shuffle into ``n_buckets`` coarse key-hash buckets, the in-bucket
    merge is the same vectorized multi-key kernel as the partial, so
    per-group Python cost is O(n_buckets), never O(#keys): a million-key
    top-k (latest event per user) pays a million vectorized rows, not a
    million Python calls. No monster groups either: a key's pruned rows
    are ≤ k × #blocks and buckets hold hash-balanced key sets."""
    from .bucketed import bucketed_group_kernel

    def partial(b: pa.Table) -> pa.Table:
        return _topk_table(b, key, score, tiebreak, k)

    pruned = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    )
    return bucketed_group_kernel(
        pruned,
        key,
        lambda g: _topk_table(g, key, score, tiebreak, k),
        n_buckets=n_buckets,
    )
