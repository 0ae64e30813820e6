"""Unit tests for the token-domain training-prep kernels (tokenops)."""

import numpy as np
import pyarrow as pa
import pytest

from fsst_like_ray.functions import tokenops as T


def _tbl(rows):
    off = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum([len(r) for r in rows], out=off[1:])
    vals = np.array([t for r in rows for t in r], dtype=np.int32)
    return pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(rows))]),
            "tokens": T._list_array(vals, off),
            "n_tok": pa.array(
                [len(r) for r in rows], type=pa.int32()
            ),
        }
    )


def _lists(col):
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_pylist()


ROWS = [[5, 6, 7], [], [9], [1, 2, 3, 4, 5, 6]]


def test_truncate_pad_shapes_and_values():
    b = T.truncate_pad_batch(_tbl(ROWS), max_len=4, pad_id=0)
    assert _lists(b["tokens"]) == [
        [5, 6, 7, 0],
        [0, 0, 0, 0],
        [9, 0, 0, 0],
        [1, 2, 3, 4],
    ]
    assert b["n_tok"].to_pylist() == [3, 0, 1, 4]


def test_truncate_pad_exact_width_noop():
    b = T.truncate_pad_batch(_tbl([[1, 2]]), max_len=2, pad_id=7)
    assert _lists(b["tokens"]) == [[1, 2]]


def test_shift_labels_masks_row_ends():
    b = T.shift_labels_batch(_tbl(ROWS))
    assert _lists(b["labels"]) == [
        [6, 7, -100],
        [],
        [-100],
        [2, 3, 4, 5, 6, -100],
    ]
    # tokens column rides through unchanged
    assert _lists(b["tokens"]) == ROWS


def test_shift_labels_empty_batch():
    b = T.shift_labels_batch(_tbl([]))
    assert b.num_rows == 0


def test_remap_oov():
    keep = np.array([2, 5, 9], dtype=np.int64)
    b = T.remap_oov_batch(_tbl(ROWS), keep, unk_id=-1)
    assert _lists(b["tokens"]) == [
        [5, -1, -1],
        [],
        [9],
        [-1, 2, -1, -1, 5, -1],
    ]


def test_remap_empty_keepset_maps_everything():
    b = T.remap_oov_batch(
        _tbl([[1, 2]]), np.array([], dtype=np.int64), unk_id=-1
    )
    assert _lists(b["tokens"]) == [[-1, -1]]


def test_bigram_partials_mask_row_boundaries():
    t = T.bigram_partials(_tbl(ROWS))
    got = {
        (k // T.CODEPOINT_SPAN, k % T.CODEPOINT_SPAN): n
        for k, n in zip(t["key"].to_pylist(), t["n"].to_pylist())
    }
    # pairs inside rows only: (5,6) (6,7) from row0; row1 empty; row2 single;
    # (1,2)(2,3)(3,4)(4,5)(5,6) from row3 — (5,6) total 2
    assert got == {
        (5, 6): 2,
        (6, 7): 1,
        (1, 2): 1,
        (2, 3): 1,
        (3, 4): 1,
        (4, 5): 1,
    }
    # never a cross-row pair like (7,9) or (9,1)
    assert (7, 9) not in got and (9, 1) not in got


def test_bigram_partials_tiny_inputs():
    assert T.bigram_partials(_tbl([])).num_rows == 0
    assert T.bigram_partials(_tbl([[4]])).num_rows == 0
    one = T.bigram_partials(_tbl([[4, 4]]))
    assert one["n"].to_pylist() == [1]


@pytest.mark.usefixtures("ray_session")
def test_vocab_topk_and_bigram_topk_distributed(tmp_path):
    import ray.data

    rows = [[1, 1, 2], [2, 1, 3], [1, 2]]
    ds = ray.data.from_arrow(_tbl(rows))
    keep = T.vocab_topk(ds, 2)
    # counts: 1→5, 2→3, 3→1 → top2 = {1, 2} (returned sorted ascending)
    assert keep.tolist() == [1, 2]
    top = T.bigram_topk(ds, 2)
    pairs = list(
        zip(
            top["t1"].to_pylist(),
            top["t2"].to_pylist(),
            top["n"].to_pylist(),
        )
    )
    # (1,2):2 (1,1):1 (2,1):1 (1,3):1 → top2 by count desc, then key asc
    assert pairs == [(1, 2, 2), (1, 1, 1)]


def test_sliding_windows_brute_force():
    """Windows at 0, stride, 2·stride … while start < n; tail short;
    empty docs emit nothing — checked against a per-row oracle across a
    grid of (window, stride)."""
    rng = np.random.default_rng(11)
    rows = [list(rng.integers(0, 99, int(n))) for n in
            [0, 1, 2, 3, 5, 8, 13, 21, 34, 64, 100]]
    tbl = _tbl(rows)
    for window, stride in [(4, 4), (4, 2), (5, 3), (1, 1), (64, 16), (3, 7)]:
        got = T.sliding_windows_batch(tbl, window, stride)
        exp = []
        for i, r in enumerate(rows):
            s = 0
            w = 0
            while s < len(r):
                exp.append((f"d{i}", w, r[s : s + window]))
                s += stride
                w += 1
        assert len(got) == len(exp), (window, stride)
        assert got["doc_id"].to_pylist() == [e[0] for e in exp]
        assert got["win_idx"].to_pylist() == [e[1] for e in exp]
        assert _lists(got["tokens"]) == [e[2] for e in exp]
        assert got["n_tok"].to_pylist() == [len(e[2]) for e in exp]


def test_sliding_windows_rejects_bad_params():
    tbl = _tbl([[1, 2, 3]])
    with pytest.raises(ValueError):
        T.sliding_windows_batch(tbl, 0, 1)
    with pytest.raises(ValueError):
        T.sliding_windows_batch(tbl, 4, 0)


def test_sliding_windows_empty_batch():
    got = T.sliding_windows_batch(_tbl([]), 8, 4)
    assert len(got) == 0
    assert got.column_names == ["doc_id", "win_idx", "tokens", "n_tok"]


def _itbl(rows, ids=None):
    """Like _tbl but with integer doc_ids (span_corrupt's mask needs them)."""
    off = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum([len(r) for r in rows], out=off[1:])
    vals = np.array([t for r in rows for t in r], dtype=np.int32)
    return pa.table(
        {
            "doc_id": pa.array(
                ids if ids is not None else list(range(len(rows))),
                type=pa.int64(),
            ),
            "tokens": T._list_array(vals, off),
            "n_tok": pa.array([len(r) for r in rows], type=pa.int32()),
        }
    )


def test_dispersion_brute_force():
    rng = np.random.default_rng(23)
    rows = [list(rng.integers(0, 7, int(n)))
            for n in [0, 1, 2, 5, 13, 50, 200]]
    got = T.dispersion_batch(_tbl(rows))
    for i, r in enumerate(rows):
        from collections import Counter
        c = Counter(r)
        assert got["n_distinct"][i].as_py() == len(c), i
        assert got["sum_sq"][i].as_py() == sum(v * v for v in c.values()), i
        assert got["max_count"][i].as_py() == (max(c.values()) if c else 0), i


def test_dispersion_negative_ids_no_collision():
    # -1 (OOV) and large positives must not collide across rows
    got = T.dispersion_batch(_tbl([[-1, -1, 5], [5, -1]]))
    assert got["n_distinct"].to_pylist() == [2, 2]
    assert got["sum_sq"].to_pylist() == [5, 2]
    assert got["max_count"].to_pylist() == [2, 1]


def test_dup_ngram_brute_force():
    rng = np.random.default_rng(31)
    rows = [list(rng.integers(0, 4, int(n)))
            for n in [0, 1, 2, 3, 4, 9, 40, 120]]
    for n in (2, 3):
        got = T.dup_ngram_batch(_tbl(rows), n)
        for i, r in enumerate(rows):
            grams = [tuple(r[j : j + n]) for j in range(len(r) - n + 1)]
            assert got["n_grams"][i].as_py() == len(grams), (n, i)
            assert got["n_distinct_grams"][i].as_py() == len(set(grams)), (
                n,
                i,
            )


def test_dup_ngram_rejects_bad_input():
    with pytest.raises(ValueError):
        T.dup_ngram_batch(_tbl([[1, 2, 3]]), 1)
    with pytest.raises(ValueError):
        T.dup_ngram_batch(_tbl([[-1, 2, 3]]), 2)


def _span_corrupt_oracle(doc_id, toks, mult=1000003, mod=11, k=2):
    masked = [((doc_id * mult + p) % mod) < k for p in range(len(toks))]
    inp, tgt, n_spans = [], [], 0
    for p, t in enumerate(toks):
        if masked[p]:
            if p == 0 or not masked[p - 1]:
                n_spans += 1
                inp.append(-n_spans)
                tgt.append(-n_spans)
            tgt.append(t)
        else:
            inp.append(t)
    return inp, tgt, n_spans


def test_span_corrupt_brute_force():
    rng = np.random.default_rng(47)
    rows = [list(rng.integers(0, 500, int(n)))
            for n in [0, 1, 2, 3, 7, 11, 64, 300]]
    ids = [0, 1, 5, 17, 100, 3, 8, 9999]
    got = T.span_corrupt_batch(_itbl(rows, ids))
    for i, (d, r) in enumerate(zip(ids, rows)):
        inp, tgt, n_spans = _span_corrupt_oracle(d, r)
        assert _lists(got["inputs"])[i] == inp, i
        assert _lists(got["targets"])[i] == tgt, i
        assert got["n_spans"][i].as_py() == n_spans, i


def test_span_corrupt_roundtrip_reconstructs():
    """Splicing each target span back over its sentinel restores the doc."""
    rng = np.random.default_rng(53)
    rows = [list(rng.integers(0, 500, 80)) for _ in range(6)]
    got = T.span_corrupt_batch(_itbl(rows))
    for i, r in enumerate(rows):
        inp = _lists(got["inputs"])[i]
        tgt = _lists(got["targets"])[i]
        spans = {}
        cur = None
        for t in tgt:
            if t < 0:
                cur = spans.setdefault(t, [])
            else:
                cur.append(t)
        rebuilt = []
        for t in inp:
            rebuilt.extend(spans[t] if t < 0 else [t])
        assert rebuilt == r, i


def _fim_oracle(d, toks):
    n = len(toks)
    p1 = (d * 37 + 11) % (n + 1)
    p2 = p1 + (d * 53 + 29) % (n - p1 + 1)
    return [-1] + toks[:p1] + [-2] + toks[p2:] + [-3] + toks[p1:p2]


def test_fim_brute_force():
    rng = np.random.default_rng(61)
    rows = [list(map(int, rng.integers(0, 900, int(n))))
            for n in [0, 1, 2, 3, 5, 17, 120]]
    ids = [0, 3, 7, 11, 42, 100, 12345]
    got = T.fim_batch(_itbl(rows, ids))
    for i, (d, r) in enumerate(zip(ids, rows)):
        assert _lists(got["fim"])[i] == _fim_oracle(d, r), i


def test_fim_reconstructs():
    """prefix+middle+suffix from the PSM layout restore the document."""
    rng = np.random.default_rng(67)
    rows = [list(map(int, rng.integers(0, 900, 60))) for _ in range(8)]
    got = T.fim_batch(_itbl(rows))
    for i, r in enumerate(rows):
        f = _lists(got["fim"])[i]
        i2, i3 = f.index(-2), f.index(-3)
        assert f[1:i2] + f[i3 + 1 :] + f[i2 + 1 : i3] == r, i


from hypothesis import given, settings, strategies as st


@st.composite
def _tok_rows(draw):
    n_rows = draw(st.integers(min_value=0, max_value=12))
    rows = [
        draw(st.lists(st.integers(0, 1_000_000), min_size=0, max_size=80))
        for _ in range(n_rows)
    ]
    ids = draw(
        st.lists(
            st.integers(0, 10**9),
            min_size=n_rows,
            max_size=n_rows,
            unique=True,
        )
    )
    return rows, ids


@given(data=_tok_rows())
@settings(max_examples=30, deadline=None)
def test_fim_property(data):
    rows, ids = data
    got = T.fim_batch(_itbl(rows, ids))
    for i, (d, r) in enumerate(zip(ids, rows)):
        f = _lists(got["fim"])[i]
        assert len(f) == len(r) + 3
        assert f[0] == -1
        i2, i3 = f.index(-2), f.index(-3)
        assert f[1:i2] + f[i3 + 1 :] + f[i2 + 1 : i3] == r


@given(data=_tok_rows())
@settings(max_examples=30, deadline=None)
def test_span_corrupt_property(data):
    rows, ids = data
    got = T.span_corrupt_batch(_itbl(rows, ids))
    for i, (d, r) in enumerate(zip(ids, rows)):
        inp, tgt, n_spans = _span_corrupt_oracle(d, r)
        assert _lists(got["inputs"])[i] == inp
        assert _lists(got["targets"])[i] == tgt
        assert got["n_spans"][i].as_py() == n_spans


@given(data=_tok_rows())
@settings(max_examples=30, deadline=None)
def test_dispersion_dupngrams_property(data):
    from collections import Counter

    rows, ids = data
    # dup_ngram_stats requires ids < span: clamp the token domain
    rows = [[t % 1_000_000 for t in r] for r in rows]
    got_d = T.dispersion_batch(_itbl(rows, ids))
    got_g = T.dup_ngram_batch(_itbl(rows, ids), 3)
    for i, r in enumerate(rows):
        c = Counter(r)
        assert got_d["n_distinct"][i].as_py() == len(c)
        assert got_d["sum_sq"][i].as_py() == sum(v * v for v in c.values())
        grams = [tuple(r[j : j + 3]) for j in range(len(r) - 2)]
        assert got_g["n_grams"][i].as_py() == len(grams)
        assert got_g["n_distinct_grams"][i].as_py() == len(set(grams))
