"""Duplicated-span detection vs a brute-force python window matcher."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def _brute_pairs(texts: dict[int, str], k: int) -> set[tuple[int, int]]:
    import re

    win2docs: dict[str, set] = {}
    for d, t in texts.items():
        words = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        for i in range(len(words) - k + 1):
            win2docs.setdefault(" ".join(words[i : i + k]), set()).add(d)
    pairs = set()
    for docs in win2docs.values():
        if len(docs) >= 2:
            s = sorted(docs)
            for b in s[1:]:
                pairs.add((s[0], b))
    return pairs


def test_duplicated_spans_random_splices(ray_session):
    rng = np.random.default_rng(13)
    texts = {}
    for d in range(30):
        texts[d] = " ".join(f"d{d}w{j}" for j in range(80))
    # splice spans of varying length (some < k → undetectable)
    k = 8
    for i, (src, dst, length) in enumerate(
        [(0, 20, 30), (1, 21, 8), (2, 22, 7), (3, 23, 12), (4, 20, 9)]
    ):
        words = texts[src].split()[10 : 10 + length]
        base = texts[dst].split()
        texts[dst] = " ".join(base[:40] + words + base[40:])
    want = _brute_pairs(texts, k)
    assert (2, 22) not in want  # 7-word splice is below k
    assert {(0, 20), (1, 21), (3, 23), (4, 20)} <= want

    from fsst_like_ray.functions.spans import duplicated_span_pairs

    tbl = pa.table(
        {
            "doc_id": pa.array(sorted(texts), type=pa.int64()),
            "text": pa.array([texts[d] for d in sorted(texts)]),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    got = duplicated_span_pairs(ds, k=k).to_pandas()
    got_pairs = set(zip(got["doc_a"], got["doc_b"]))
    assert got_pairs == want


def test_duplicated_spans_none(ray_session):
    from fsst_like_ray.functions.spans import duplicated_span_pairs

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array(["a b c d e f g h i", "j k l m n o p q r"]),
        }
    )
    ds = ray.data.from_arrow(tbl)
    assert duplicated_span_pairs(ds, k=8).count() == 0
