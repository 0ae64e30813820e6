"""Count-Min sketch: mergeable point-frequency estimates over a word
stream — the companion to Misra-Gries (heavy.py finds WHICH items are
frequent; CMS answers "how often does THIS item occur" for any item,
without storing the vocabulary).

Shape: each batch folds its words into one D×W int64 counter matrix
(D=4 rows, W=2^14 counters — ~512 KB; error ≤ e/W·N per estimate with
overwhelming probability, and NEVER an underestimate). Matrices merge by
elementwise sum — commutative and associative, so the driver reduce is
retry-safe and the shuffle moves one sketch row per block regardless of
corpus size. Hashing is the verify stage's vectorized 64-bit polynomial
+ murmur finalizer, re-seeded per CMS row.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.verify import _poly_rowhash
from .vocab import tokenize_rows

CMS_D = 4
CMS_W = 1 << 14
_SEEDS = np.array(
    [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
     0x27D4EB2F165667C5],
    dtype=np.uint64,
)


def _finalize(h: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        h = h ^ (h >> np.uint64(33))
        h = h * np.uint64(0xFF51AFD7ED558CCD)
        h = h ^ (h >> np.uint64(29))
        h = h * np.uint64(0xC4CEB9FE1A85EC53)
        h = h ^ (h >> np.uint64(32))
    return h


def _string_hashes(arr: pa.Array) -> np.ndarray:
    """Vectorized 64-bit hash per string (no per-row Python)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.zeros(0, dtype=np.uint64)
    a = arr.cast(pa.large_utf8())
    buf = np.frombuffer(a.buffers()[2] or b"", dtype=np.uint8)
    off = np.frombuffer(a.buffers()[1], dtype=np.int64)[
        a.offset : a.offset + len(a) + 1
    ]
    lo = int(off[0])
    return _poly_rowhash(
        buf[lo : lo + int(off[-1] - lo)].astype(np.uint64), off - lo
    )


def _positions(h: np.ndarray) -> np.ndarray:
    """(D, n) counter positions for word hashes ``h``."""
    pos = np.empty((CMS_D, len(h)), dtype=np.int64)
    for d in range(CMS_D):
        pos[d] = (_finalize(h ^ _SEEDS[d]) % np.uint64(CMS_W)).astype(
            np.int64
        )
    return pos


def cms_partial(batch: pa.Table, col: str = "text") -> pa.Table:
    """One (cms: bytes, n_words: int64) row per batch over the column's
    word stream (same tokenizer as the vocab/bigram operators)."""
    values, row_ids, keep = tokenize_rows(batch, col)
    toks = values.filter(pa.array(keep))
    h = _string_hashes(toks)
    mat = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    if len(h):
        pos = _positions(h)
        for d in range(CMS_D):
            mat[d] += np.bincount(pos[d], minlength=CMS_W)
    return pa.table(
        {
            "cms": pa.array([mat.tobytes()], type=pa.binary()),
            "n_words": pa.array([len(h)], type=pa.int64()),
        }
    )


def cms_build(ds, col: str = "text") -> tuple[np.ndarray, int]:
    """Streaming build: elementwise-sum merge of per-block sketches.
    Returns (D×W matrix, total word count)."""
    mat = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    n = 0
    for blk in ds.map_batches(
        lambda b: cms_partial(b, col), batch_format="pyarrow"
    ).iter_batches(batch_size=256, batch_format="pyarrow"):
        for r in blk.to_pylist():
            mat += np.frombuffer(r["cms"], dtype=np.int64).reshape(
                CMS_D, CMS_W
            )
            n += int(r["n_words"])
    return mat, n


def cms_query(mat: np.ndarray, words: list[str]) -> np.ndarray:
    """Point estimates: min over the D counters each word maps to.
    Guaranteed ≥ the true count; ≤ true + (e/W)·N w.h.p."""
    h = _string_hashes(pa.array(words, type=pa.string()))
    pos = _positions(h)
    ests = np.stack([mat[d][pos[d]] for d in range(CMS_D)])
    return ests.min(axis=0)
