"""Benchmark decontamination: flag TRAINING documents that share any exact
k-word window with a held-out BENCHMARK set.

(Training-pipeline extension — SURVEY.md §2.5. Evaluation integrity
requires removing train/test overlap before pretraining; the standard
recipe — n-gram overlap against the benchmark suite, cf. the published
GPT-2/GPT-3-style 8-gram/13-gram decontamination procedure — is
reimplemented here from the problem statement on the spans module's
rolling window hashes.)

Scale shape: the BENCHMARK side is small by contract (an eval suite, not
a corpus) — its distinct window grams collect once on the driver and
broadcast via ``ray.put``. The TRAINING side streams in ONE pass: a
vectorized searchsorted hash prefilter drops non-candidate windows, the
window TEXT is re-derived only for survivors, and exact string membership
confirms each hit (hash collisions can add candidates, never hits). No
shuffle at all — each doc's windows live in its own row, so per-doc
distinct-hit counts finalize inside the batch."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .spans import _window_rows
from .vocab import tokenize_rows


def _window_texts(
    b: pa.Table, text_col: str, k: int, id_col: str, ids, pos, sel
) -> list[str]:
    """Join the k words of the selected windows (spans.py pass-2 shape:
    text is materialized ONLY for prefilter survivors)."""
    values, rows, keep = tokenize_rows(b, text_col)
    toks = values.filter(pa.array(keep)).to_numpy(zero_copy_only=False)
    rr = rows[keep]
    starts = np.flatnonzero(np.r_[True, rr[1:] != rr[:-1]])
    bids = b[id_col].to_numpy(zero_copy_only=False)
    id2start = {int(bids[rr[s]]): int(s) for s in starts}
    return [
        " ".join(
            toks[
                id2start[int(ids[i])] + int(pos[i]) :
                id2start[int(ids[i])] + int(pos[i]) + k
            ]
        )
        for i in sel
    ]


def benchmark_grams(
    bench: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> tuple[np.ndarray, frozenset]:
    """Collect the benchmark's distinct k-gram (hashes, strings) on the
    driver. Bounded by the BENCHMARK size (small by contract)."""
    hashes: list[np.ndarray] = []
    grams: set[str] = set()

    def per_batch(b: pa.Table) -> pa.Table:
        h, ids, pos = _window_rows(b, text_col, k, id_col)
        if len(h) == 0:  # empty / punctuation-only bench batch
            return pa.table(
                {
                    "h": pa.array([], type=pa.int64()),
                    "win": pa.array([], type=pa.string()),
                }
            )
        # dedup by hash first (cheap, vectorized), then materialize the
        # texts of the distinct-hash windows; equal grams always share a
        # hash, so no gram is lost across batches (the driver unions the
        # strings). The one theoretical gap: two DISTINCT grams colliding
        # on the same 64-bit hash within one batch keep only the first
        # text (~n²/2⁶⁴ odds — accepted, same hash family as spans.py)
        uh, first = np.unique(h, return_index=True)
        wins = _window_texts(b, text_col, k, id_col, ids, pos, first)
        return pa.table(
            {
                "h": pa.array(uh.view(np.int64), type=pa.int64()),
                "win": pa.array(wins, type=pa.string()),
            }
        )

    for out in bench.map_batches(per_batch, batch_format="pyarrow").iter_batches(
        batch_size=65536, batch_format="pyarrow"
    ):
        if out.num_rows:
            hashes.append(out["h"].to_numpy(zero_copy_only=False))
            grams.update(out["win"].to_pylist())
    hs = (
        np.unique(np.concatenate(hashes))
        if hashes
        else np.zeros(0, dtype=np.int64)
    )
    return hs, frozenset(grams)


def contamination_report(
    docs: "ray.data.Dataset",
    bench: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> "ray.data.Dataset":
    """(``id_col``, n_hits) for every training doc sharing ≥1 exact k-word
    window with the benchmark; n_hits counts DISTINCT shared grams."""
    from .join import get_broadcast, put_broadcast

    hs, gram_set = benchmark_grams(bench, text_col, id_col, k)
    ref = put_broadcast((hs, gram_set))

    def scan(b: pa.Table) -> pa.Table:
        bh, bgrams = get_broadcast(ref)
        h, ids, pos = _window_rows(b, text_col, k, id_col)
        hi = h.view(np.int64)
        empty = pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "n_hits": pa.array([], type=pa.int64()),
            }
        )
        if len(bh) == 0 or len(hi) == 0:
            return empty
        ix = np.searchsorted(bh, hi)
        np.minimum(ix, len(bh) - 1, out=ix)
        sel = np.flatnonzero(bh[ix] == hi)
        if len(sel) == 0:
            return empty
        wins = _window_texts(b, text_col, k, id_col, ids, pos, sel)
        per_doc: dict[int, set] = {}
        for i, w in zip(sel, wins):
            if w in bgrams:  # exact verify — collisions die here
                per_doc.setdefault(int(ids[i]), set()).add(w)
        items = sorted((d, len(s)) for d, s in per_doc.items())
        return pa.table(
            {
                id_col: pa.array([d for d, _ in items], type=pa.int64()),
                "n_hits": pa.array([n for _, n in items], type=pa.int64()),
            }
        )

    return docs.map_batches(scan, batch_format="pyarrow").sort(id_col)
