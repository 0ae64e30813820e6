"""The C kernels must be byte-identical twins of the NumPy FSST path."""

from __future__ import annotations

import numpy as np
import pytest

from fsst_like_ray import fsstlib, native


def _numpy_encode(data, off, table):
    """Call the NumPy implementation directly (bypassing dispatch)."""
    pos, ml, code = fsstlib._parse(data, off, table)
    esc = ml == 0
    out_len = np.where(esc, 2, 1).astype(np.int64)
    out_off = np.zeros(len(pos) + 1, dtype=np.int64)
    np.cumsum(out_len, out=out_off[1:])
    out = np.empty(int(out_off[-1]), dtype=np.uint8)
    out[out_off[:-1][~esc]] = code[~esc]
    ep = out_off[:-1][esc]
    out[ep] = fsstlib.ESCAPE
    out[ep + 1] = data[pos[esc]]
    first_emit = np.searchsorted(pos, off)
    return out, out_off[first_emit].astype(np.int64)


@pytest.mark.skipif(native.lib is None, reason="no C compiler")
@pytest.mark.parametrize("seed", range(6))
def test_native_encode_decode_bit_identical(seed):
    rng = np.random.default_rng(seed)
    n_rows = int(rng.integers(1, 500))
    lens = rng.integers(0, 400, n_rows)
    off = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    total = int(off[-1])
    mode = seed % 3
    if mode == 0:
        data = rng.integers(0, 256, total).astype(np.uint8)
    elif mode == 1:
        data = rng.choice(
            np.frombuffer(b"the quick brown\xff fox ", dtype=np.uint8), total
        )
    else:
        data = np.full(total, 255, dtype=np.uint8)
    data = np.ascontiguousarray(data)
    table = fsstlib.train(data, off)

    b_np, po_np = _numpy_encode(data, off, table)
    b_c, po_c = native.encode(data, off, table)
    assert np.array_equal(po_np, po_c)
    assert np.array_equal(b_np, b_c)

    d_c, ro_c = native.decode(b_c, po_c, table)
    assert bytes(d_c) == bytes(data)
    assert np.array_equal(ro_c, off)


@pytest.mark.skipif(native.lib is None, reason="no C compiler")
def test_native_empty_table_and_rows():
    table = fsstlib.SymbolTable([])
    data = np.frombuffer(b"xyz\xff", dtype=np.uint8).copy()
    off = np.array([0, 0, 4, 4], dtype=np.int64)  # empty rows at both ends
    buf, po = native.encode(data, off, table)
    assert list(po) == [0, 0, 8, 8]  # all escaped: 2 bytes per input byte
    dec, ro = native.decode(buf, po, table)
    assert bytes(dec) == bytes(data)
    assert list(ro) == list(off)


@pytest.mark.skipif(native.lib is None, reason="no C compiler")
def test_native_decode_bounds_corrupt_payload():
    """A payload that expands past the caller's expected output size must
    error, not write past the buffer (a corrupted parquet payload could
    otherwise expand to 8x compressed before any row-size check runs)."""
    table = fsstlib.SymbolTable([b"ABCDEFGH"])  # code 0 -> 8 bytes
    # 100 copies of code 0 decode to 800 bytes; claim only 16 expected
    buf = np.zeros(100, dtype=np.uint8)
    po = np.array([0, 100], dtype=np.int64)
    with pytest.raises(ValueError, match="expand"):
        native.decode(buf, po, table, out_nbytes=16)
    # and with an honest bound it round-trips
    out, ro = native.decode(buf, po, table, out_nbytes=800)
    assert bytes(out) == b"ABCDEFGH" * 100


@pytest.mark.skipif(native.lib is None, reason="no C compiler")
def test_numpy_decode_fallback_matches_native(monkeypatch):
    """fsstlib.decode dispatches to C when available; the NumPy fallback
    (used on hosts without a compiler) must stay bit-identical."""
    rng = np.random.default_rng(9)
    lens = rng.integers(0, 300, 300)
    off = np.zeros(301, dtype=np.int64)
    np.cumsum(lens, out=off[1:])
    data = rng.choice(
        np.frombuffer(b"abcdefgh \xff123", dtype=np.uint8), int(off[-1])
    ).copy()
    table = fsstlib.train(data, off)
    buf, po = fsstlib.encode(data, off, table)
    d_c, ro_c = fsstlib.decode(buf, po, table)
    monkeypatch.setattr(native, "lib", None)
    d_np, ro_np = fsstlib.decode(buf, po, table)
    assert bytes(d_np) == bytes(d_c) == bytes(data)
    assert np.array_equal(ro_np, ro_c)


def test_dict_unique_inverse_matches_numpy():
    """C hash unique+inverse must be bit-identical to
    np.unique(return_inverse=True) — including negatives (the table uses
    a code sentinel, never a key sentinel) and heavy duplication."""
    from fsst_like_ray import native

    if native.lib is None:
        import pytest

        pytest.skip("no compiler")
    rng = np.random.default_rng(3)
    cases = [
        np.zeros(0, dtype=np.int32),
        np.array([-1], dtype=np.int32),
        np.array([-1, -1, 0, 2**31 - 1, -2**31], dtype=np.int32),
        rng.integers(-5, 5, 10_000).astype(np.int32),
        rng.integers(-2**31, 2**31, 50_000).astype(np.int32),
    ]
    for v in cases:
        u1, c1 = native.dict_unique_inverse(v)
        u2, c2 = np.unique(v, return_inverse=True)
        assert np.array_equal(u1, u2)
        assert np.array_equal(c1, c2.astype(np.uint32))


def _random_encoded_corpus(seed, n_rows=1500):
    """(pay, po, table, texts) over word-soup rows incl. escape bytes."""
    rng = np.random.default_rng(seed)
    words = ["merge", "sort", "scan", "\xffhash", "the fast key", "zap!"]
    rows = []
    for _ in range(n_rows):
        n = int(rng.integers(0, 25))
        rows.append(" ".join(rng.choice(words, size=n)).encode("latin-1"))
    off = np.zeros(n_rows + 1, dtype=np.int64)
    off[1:] = np.cumsum([len(r) for r in rows])
    flat = np.frombuffer(b"".join(rows), dtype=np.uint8)
    table = fsstlib.train(flat, off)
    pay, po = fsstlib.encode(flat, off, table)
    return pay, po, table, rows


@pytest.mark.skipif(native.lib is None, reason="no C compiler")
@pytest.mark.parametrize("seed", range(3))
def test_native_like_prefilter_and_kmp_bit_identical(seed, monkeypatch):
    """The new scan kernels (like_prefilter, kmp_scan, meta_kmp_scan) must
    return exactly the NumPy masks on the same payloads — including
    escape-pair handling and no-match patterns."""
    from fsst_like_ray.matchers import engines as E
    from fsst_like_ray.matchers.pattern import parse_like

    pay, po, table, rows = _random_encoded_corpus(seed)
    patterns = [
        "%merge%", "%zap!%", "%never-there%", "%merge%sort%",
        "%fast key%zap%scan%", "%\xffhash%",
    ]
    for p in patterns:
        segs = tuple(parse_like(p).segments)
        nat_pref = E.skipping_prefilter(pay, po, table, segs, None)
        if len(segs) == 1:
            nat_kmp = E.kmp_code_match(pay, po, table, segs[0])
        else:
            nat_kmp = E.meta_kmp_code_match(pay, po, table, segs)
        with monkeypatch.context() as m:
            m.setattr(native, "lib", None)
            np_pref = E.skipping_prefilter(pay, po, table, segs, None)
            if len(segs) == 1:
                np_kmp = E.kmp_code_match(pay, po, table, segs[0])
            else:
                np_kmp = E.meta_kmp_code_match(pay, po, table, segs)
        assert np.array_equal(nat_pref, np_pref), p
        assert np.array_equal(nat_kmp, np_kmp), p
        # the prefilter must be sound: every true match is a candidate
        assert not (nat_kmp & ~nat_pref).any(), p
        # and KMP must equal ground truth on the decoded rows
        if len(segs) == 1:
            truth = np.array([segs[0] in r for r in rows])
        else:
            def ordered_contains(r, ss):
                pos = 0
                for s in ss:
                    i = r.find(s, pos)
                    if i < 0:
                        return False
                    pos = i + len(s)
                return True
            truth = np.array([ordered_contains(r, segs) for r in rows])
        assert np.array_equal(nat_kmp, truth), p


@pytest.mark.parametrize("name", ["varint", "pfor", "for", "rlebp"])
def test_numpy_codec_fallback_matches_native(name, monkeypatch):
    """The varint C kernels and the seg_scatter/seg_gather payload movers
    must produce byte-identical encodings to the pure-NumPy paths (and
    cross-decode: NumPy decodes the native buffer and vice versa)."""
    from fsst_like_ray.codecs import CODECS

    if native.lib is None:
        pytest.skip("no C compiler")
    rng = np.random.default_rng(21)
    rows = [
        list(rng.integers(0, 1 << int(rng.integers(1, 31)), rng.integers(0, 90)))
        for _ in range(200)
    ] + [[], [2**31 - 1, -5, 0], [7] * 500]
    off = np.zeros(len(rows) + 1, dtype=np.int64)
    off[1:] = np.cumsum([len(r) for r in rows])
    values = np.concatenate(
        [np.asarray(r, dtype=np.int32) for r in rows if len(r)]
    ).astype(np.int32)
    counts = np.diff(off)

    c = CODECS[name]
    state = c.train(values, off)
    buf_c, po_c = c.encode(values, off, state)
    dec_c = c.decode(buf_c, po_c, counts, state)

    monkeypatch.setattr(native, "lib", None)
    buf_np, po_np = c.encode(values, off, state)
    dec_np = c.decode(buf_c, po_c, counts, state)  # numpy decodes C buffer
    assert bytes(buf_np) == bytes(buf_c)
    np.testing.assert_array_equal(po_np, po_c)
    np.testing.assert_array_equal(dec_np, values)
    np.testing.assert_array_equal(dec_c, values)


def test_poly_rowhash_native_matches_numpy():
    """C per-row polynomial hash bit-identical to the NumPy formulation
    (zero-extended uint32 values, including empty rows and extremes)."""
    if native.lib is None:
        pytest.skip("no C compiler")
    from fsst_like_ray.stages.verify import _poly_rowhash

    rng = np.random.default_rng(5)
    rows = [
        list(rng.integers(0, 1 << 32, rng.integers(0, 120), dtype=np.uint64))
        for _ in range(300)
    ] + [[], [0], [2**32 - 1] * 700]
    off = np.zeros(len(rows) + 1, dtype=np.int64)
    off[1:] = np.cumsum([len(r) for r in rows])
    values = (
        np.concatenate([np.asarray(r, dtype=np.uint64) for r in rows if r])
        .astype(np.uint32)
        if off[-1]
        else np.zeros(0, dtype=np.uint32)
    )
    got = native.poly_rowhash_u32(values, off)
    want = _poly_rowhash(values.astype(np.uint64), off)
    np.testing.assert_array_equal(got, want)
