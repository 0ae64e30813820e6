"""Distributed token-vocabulary statistics over the north-rule tokens table.

The canonical "what's in my corpus" op for a training-data pipeline: global
token frequencies and top-k. Partial-then-merge shape — each batch reduces its
flattened token stream to at most |vocab-in-batch| (token, cnt) pairs before
the groupby, so the shuffle moves vocabulary-bounded partials, never tokens
(at 100 TB the exchange is ~|vocab| rows per block regardless of corpus size).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Sum


def token_count_partials(batch: pa.Table) -> pa.Table:
    """tokens list<int32> batch → (token, cnt) partial counts (vectorized)."""
    toks = batch["tokens"]
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    vals = toks.flatten().to_numpy(zero_copy_only=False)
    u, c = np.unique(vals, return_counts=True)
    return pa.table(
        {
            "token": pa.array(u.astype(np.int64), type=pa.int64()),
            "cnt": pa.array(c.astype(np.int64), type=pa.int64()),
        }
    )


def token_frequencies(tokens_ds, k: int | None = None):
    """Global token frequencies, optionally top-k.

    ``groupby`` then ``sort`` both run over the vocabulary-sized partial
    table (≤ |vocab| rows after merge), not the corpus. Deterministic ties:
    count descending, then token id ascending.
    """
    partials = tokens_ds.map_batches(token_count_partials, batch_format="pyarrow")
    merged = partials.groupby("token").aggregate(Sum("cnt", alias_name="n"))
    out = merged.sort(["n", "token"], descending=[True, False])
    if k is not None:
        out = out.limit(k)
    return out
