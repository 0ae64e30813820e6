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


def tokenize_rows(batch: pa.Table, col: str = "text"):
    """Lowercase + split a text column on ``[^a-z0-9]+`` (Arrow C++ regex):
    returns (values, row_ids, keep) where ``values`` is the flattened token
    StringArray, ``row_ids`` maps each token to its source row, and
    ``keep`` masks empty boundary tokens. Null text is treated as ''
    (splits to one empty token that ``keep`` drops — exactly the SQL
    oracles' unnest-of-NULL → 0 rows semantics). Shared by the bigram and
    explode operators so the tokenization contract cannot desynchronize."""
    import pyarrow.compute as pc

    filled = pc.fill_null(batch[col], "")
    lists = pc.split_pattern_regex(pc.utf8_lower(filled), "[^a-z0-9]+")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    values = lists.flatten()
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    counts = counts.astype(np.int64)
    row_ids = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    keep = pc.not_equal(values, "").to_numpy(zero_copy_only=False)
    return values, row_ids, keep


def word_bigram_partials(batch: pa.Table, col: str = "text") -> pa.Table:
    """text batch → (bigram, cnt) partial counts, Arrow/NumPy end to end:
    ``split_pattern_regex`` (C++) tokenizes every row at once; row ids come
    from list offsets; consecutive same-row token pairs are joined with
    ``binary_join_element_wise``; the per-batch count is a C++ group_by.
    Separator ``[^a-z0-9]+`` merges runs, so empty tokens only occur at
    row boundaries and are masked before pairing (semantics proven equal
    to the SQL split-then-filter oracle in the driver check)."""
    import pyarrow.compute as pc

    values, row_ids, keep = tokenize_rows(batch, col)
    toks = values.filter(pa.array(keep))
    rows = row_ids[keep]
    if len(rows) < 2:
        return pa.table(
            {
                "bigram": pa.array([], type=pa.string()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
    same = rows[:-1] == rows[1:]
    idx = np.flatnonzero(same)
    w1 = toks.take(pa.array(idx))
    w2 = toks.take(pa.array(idx + 1))
    joined = pc.binary_join_element_wise(w1, w2, " ")
    g = pa.table({"bigram": joined}).group_by("bigram").aggregate(
        [("bigram", "count")]
    )
    return pa.table(
        {
            "bigram": g["bigram"],
            "cnt": g["bigram_count"].cast(pa.int64()),
        }
    )


def bigram_frequencies(docs_ds, col: str = "text", k: int | None = None):
    """Global word-bigram frequencies over a text column, optionally top-k.
    Same partial-then-merge shape as ``token_frequencies``: the shuffle
    moves ≤ |distinct bigrams in block| partial rows, never text."""
    partials = docs_ds.map_batches(
        lambda b: word_bigram_partials(b, col), batch_format="pyarrow"
    )
    merged = partials.groupby("bigram").aggregate(Sum("cnt", alias_name="n"))
    out = merged.sort(["n", "bigram"], descending=[True, False])
    if k is not None:
        out = out.limit(k)
    return out


def doc_repetition_stats(batch: pa.Table, id_col: str = "doc_id",
                         col: str = "text") -> pa.Table:
    """Per-document repetition stats — the Gopher-style duplicate-n-gram
    quality signal: for each doc, total word-bigram count, distinct
    bigram count, and repetition in integer per-mille
    ((n - distinct) * 1000 // n). Pure per-row math, so the stage is an
    embarrassingly parallel map_batches (docs never split across rows);
    both counts come from ONE Arrow C++ group_by over (row, bigram) —
    no Python loop, no string hashing collisions. Docs with < 2 words
    have no bigrams and are omitted (matches the SQL oracle's inner
    join-of-unnested-bigrams semantics)."""
    import pyarrow.compute as pc

    values, row_ids, keep = tokenize_rows(batch, col)
    toks = values.filter(pa.array(keep))
    rows = row_ids[keep]
    empty = pa.table(
        {
            id_col: pa.array([], type=batch[id_col].type),
            "n_bigrams": pa.array([], type=pa.int64()),
            "n_distinct": pa.array([], type=pa.int64()),
            "rep_milli": pa.array([], type=pa.int64()),
        }
    )
    if len(rows) < 2:
        return empty
    same = rows[:-1] == rows[1:]
    idx = np.flatnonzero(same)
    if idx.size == 0:
        return empty
    w1 = toks.take(pa.array(idx))
    w2 = toks.take(pa.array(idx + 1))
    joined = pc.binary_join_element_wise(w1, w2, " ")
    per_pair = (
        pa.table({"rid": pa.array(rows[idx]), "bg": joined})
        .group_by(["rid", "bg"])
        .aggregate([("bg", "count")])
    )
    per_doc = per_pair.group_by("rid").aggregate(
        [("bg_count", "sum"), ("bg_count", "count")]
    )
    rid = per_doc["rid"].to_numpy(zero_copy_only=False).astype(np.int64)
    n = per_doc["bg_count_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = per_doc["bg_count_count"].to_numpy(zero_copy_only=False).astype(
        np.int64
    )
    ids = batch[id_col].take(pa.array(rid))
    return pa.table(
        {
            id_col: ids,
            "n_bigrams": pa.array(n),
            "n_distinct": pa.array(d),
            "rep_milli": pa.array((n - d) * 1000 // n),
        }
    )


def word_and_search(
    ds: "ray.data.Dataset",
    terms: tuple,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Documents containing ALL ``terms`` as whole WORDS (the search-engine
    AND query over the shared tokenization contract). One streaming pass,
    no shuffle: per batch the token stream dictionary-encodes once, the
    tiny per-batch dictionary matches against the broadcast term list, and
    a per-row BITMASK of matched terms accumulates via one bitwise-or
    scatter — rows whose mask is full survive. Term count is capped at 63
    (one int64 mask)."""
    import re

    import pyarrow.compute as pc

    from .join import get_broadcast, put_broadcast

    uniq = sorted(set(terms))
    if not 1 <= len(uniq) <= 63:
        raise ValueError("word_and_search supports 1..63 distinct terms")
    for t in uniq:
        # a term outside the tokenization alphabet can NEVER match —
        # surface the contract violation instead of returning zero rows
        if not re.fullmatch(r"[a-z0-9]+", t):
            raise ValueError(
                f"term {t!r} is not a lowercase [a-z0-9]+ word — it cannot "
                "match the tokenizer's output"
            )
    ref = put_broadcast(uniq)

    def scan(b: pa.Table) -> pa.Table:
        tarr = get_broadcast(ref)
        full = (1 << len(tarr)) - 1
        values, rows, keep = tokenize_rows(b, text_col)
        toks = values.filter(pa.array(keep))
        rr = rows[keep]
        if not len(rr):
            return b.select([id_col]).slice(0, 0)
        enc = toks.dictionary_encode()
        # dictionary slot → term bit (or null): ONE C++ lookup over the
        # tiny per-batch dictionary, never the token stream
        slot_bit = pc.index_in(
            enc.dictionary, value_set=pa.array(tarr, type=pa.string())
        ).to_numpy(zero_copy_only=False)
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bit = slot_bit[idx]
        hit = ~np.isnan(bit)
        masks = np.zeros(b.num_rows, dtype=np.int64)
        np.bitwise_or.at(
            masks, rr[hit],
            (np.int64(1) << bit[hit].astype(np.int64)),
        )
        return b.select([id_col]).filter(pa.array(masks == full))

    return ds.map_batches(scan, batch_format="pyarrow")


def phrase_search(
    ds: "ray.data.Dataset",
    phrase: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Documents containing the word PHRASE — every phrase word adjacent,
    in order, under the shared tokenization contract (so punctuation /
    case between words doesn't break a match, exactly like the bigram
    operator's pairing). One streaming pass, no shuffle: each window
    position compares against its constant needle word with one C++
    equality kernel and the k masks AND together — no per-window string
    concatenation (tokens contain no spaces, so positional equality is
    exactly window equality)."""
    import re

    import pyarrow.compute as pc

    words = [w for w in phrase.lower().split() if w]
    if not words:
        raise ValueError("empty phrase")
    for w in words:
        # a word outside the tokenization alphabet can NEVER match —
        # surface the contract violation (same guard as word_and_search)
        if not re.fullmatch(r"[a-z0-9]+", w):
            raise ValueError(
                f"phrase word {w!r} is not a lowercase [a-z0-9]+ word — "
                "it cannot match the tokenizer's output"
            )
    k = len(words)

    def scan(b: pa.Table) -> pa.Table:
        values, rows, keep = tokenize_rows(b, text_col)
        toks = values.filter(pa.array(keep))
        rr = rows[keep]
        n = len(rr)
        if n < k:
            return b.select([id_col]).slice(0, 0)
        # windows fully inside one row
        valid = rr[k - 1 :] == rr[: n - k + 1]
        idx = np.flatnonzero(valid)
        if not len(idx):
            return b.select([id_col]).slice(0, 0)
        hit = np.ones(len(idx), dtype=bool)
        for j, w in enumerate(words):
            hit &= pc.equal(
                toks.take(pa.array(idx + j)), w
            ).to_numpy(zero_copy_only=False)
        docs = np.unique(rr[idx[hit]])
        mask = np.zeros(b.num_rows, dtype=bool)
        mask[docs] = True
        return b.select([id_col]).filter(pa.array(mask))

    return ds.map_batches(scan, batch_format="pyarrow")
