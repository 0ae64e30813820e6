"""Fuzzy string matching: vectorized Levenshtein over a word universe —
the typo-tolerant lookup a data-cleaning pipeline needs ("find documents
mentioning ≈this term").

The DP runs one (target-char × word-char) loop of NumPy vector ops over
ALL candidate words at once (n words × max-length padded uint8 matrix),
so per-batch cost is m·L vector steps over the batch's DISTINCT words —
never a Python loop per word pair. Membership then propagates back to
word occurrences via the dictionary inverse and to documents via row
ids."""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _padded_bytes(words: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(n, L) uint8 matrix (0-padded) + int64 lengths for a string array."""
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    a = words.cast(pa.large_binary())
    buf = np.frombuffer(a.buffers()[2] or b"", dtype=np.uint8)
    off = np.frombuffer(a.buffers()[1], dtype=np.int64)[
        a.offset : a.offset + len(a) + 1
    ]
    lens = np.diff(off)
    n, L = len(lens), int(lens.max()) if len(lens) else 0
    mat = np.zeros((n, max(L, 1)), dtype=np.uint8)
    if off[-1] > off[0]:
        cols = np.arange(int(off[-1] - off[0]), dtype=np.int64) - np.repeat(
            (off[:-1] - off[0]), lens
        )
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        mat[rows, cols] = buf[int(off[0]) : int(off[-1])]
    return mat, lens


def edit_distances(words: pa.Array, target: str) -> np.ndarray:
    """Levenshtein distance from every word to ``target`` (byte-level,
    matching DuckDB's levenshtein on ASCII)."""
    t = np.frombuffer(target.encode("utf-8"), dtype=np.uint8)
    W, lens = _padded_bytes(words)
    n, L = W.shape
    m = len(t)
    prev = np.tile(np.arange(L + 1, dtype=np.int32), (n, 1))
    for i in range(1, m + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        for j in range(1, L + 1):
            sub = prev[:, j - 1] + (W[:, j - 1] != t[i - 1])
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j] + 1, sub), cur[:, j - 1] + 1
            )
        prev = cur
    return prev[np.arange(n), np.minimum(lens, L)]


def fuzzy_doc_pairs(
    batch: pa.Table,
    targets: list[str],
    max_dist: int = 1,
    id_col: str = "doc_id",
    col: str = "text",
) -> pa.Table:
    """Per-batch DISTINCT (target, doc_id) pairs where the doc contains a
    word within ``max_dist`` edits of the target. The DP touches each
    distinct word once per target; global distinct-doc counting is one
    (target, doc_id) groupby downstream."""
    from .vocab import tokenize_rows

    values, row_ids, keep = tokenize_rows(batch, col)
    toks = values.filter(pa.array(keep))
    rows = row_ids[keep]
    out_t, out_i = [], []
    if len(rows):
        enc = (
            toks.combine_chunks()
            if isinstance(toks, pa.ChunkedArray)
            else toks
        ).dictionary_encode()
        inv = enc.indices.to_numpy(zero_copy_only=False)
        uniq = enc.dictionary
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        for tgt in targets:
            ok_words = edit_distances(uniq, tgt) <= max_dist
            hit_rows = rows[ok_words[inv]]
            docs = np.unique(ids[hit_rows])
            out_t.extend([tgt] * len(docs))
            out_i.append(docs)
    return pa.table(
        {
            "target": pa.array(out_t, type=pa.string()),
            "doc_id": pa.array(
                np.concatenate(out_i) if out_i else np.zeros(0, np.int64),
                type=pa.int64(),
            ),
        }
    )
