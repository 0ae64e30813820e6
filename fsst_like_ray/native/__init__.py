"""Optional C acceleration for the FSST hot loops.

Compiled at import time from ``fsstkern.c`` with the system C compiler into
a content-addressed ``.so`` under the temp dir (no installs, no network;
concurrent workers build to a pid-suffixed temp file and ``os.replace`` it
atomically). When no compiler is available ``lib`` is None and
:mod:`fsst_like_ray.fsstlib` keeps its pure-NumPy path — both paths produce
bit-identical output (asserted in tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "fsstkern.c")


def _build():
    with open(_SRC, "rb") as f:
        src = f.read()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so = os.path.join(tempfile.gettempdir(), f"fsstkern_{tag}.so")
    if not os.path.exists(so):
        tmp = f"{so}.{os.getpid()}.tmp"
        subprocess.run(
            ["cc", "-O3", "-march=native", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, so)
    l = ctypes.CDLL(so)
    l.fsst_encode.restype = ctypes.c_int64
    l.fsst_encode.argtypes = (
        [ctypes.c_void_p] * 2
        + [ctypes.c_int64]
        + [ctypes.c_void_p] * 3
        + [ctypes.c_int64]
        + [ctypes.c_void_p] * 7
    )
    l.fsst_decode.restype = ctypes.c_int64
    l.fsst_decode.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                              ctypes.c_void_p, ctypes.c_void_p,
                              ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    l.fsst_parse.restype = ctypes.c_int64
    l.fsst_parse.argtypes = l.fsst_encode.argtypes
    l.pack_rows.restype = None
    l.pack_rows.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p]
    l.unpack_rows.restype = None
    l.unpack_rows.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                              ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
                              ctypes.c_void_p]
    l.dict_unique.restype = ctypes.c_long
    l.dict_unique.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                              ctypes.c_void_p, ctypes.c_void_p,
                              ctypes.c_int64, ctypes.c_void_p,
                              ctypes.c_void_p]
    l.like_prefilter.restype = None
    l.like_prefilter.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                 ctypes.c_int64, ctypes.c_void_p,
                                 ctypes.c_void_p, ctypes.c_int,
                                 ctypes.c_void_p]
    l.kmp_scan.restype = None
    l.kmp_scan.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                           ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
                           ctypes.c_void_p]
    l.seg_scatter.restype = None
    l.seg_scatter.argtypes = [ctypes.c_void_p] * 3 + [ctypes.c_int64,
                                                      ctypes.c_void_p]
    l.seg_gather.restype = None
    l.seg_gather.argtypes = [ctypes.c_void_p] * 3 + [ctypes.c_int64,
                                                     ctypes.c_void_p]
    l.varint_encode.restype = None
    l.varint_encode.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_int64, ctypes.c_void_p,
                                ctypes.c_void_p]
    l.varint_decode.restype = None
    l.varint_decode.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_void_p, ctypes.c_int64,
                                ctypes.c_void_p]
    l.meta_kmp_scan.restype = None
    l.meta_kmp_scan.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_int64, ctypes.c_void_p,
                                ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_void_p, ctypes.c_void_p,
                                ctypes.c_int, ctypes.c_void_p,
                                ctypes.c_void_p]
    l.poly_rowhash_u32.restype = None
    l.poly_rowhash_u32.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                   ctypes.c_int64, ctypes.c_void_p]
    return l


try:  # pragma: no cover - environment dependent
    lib = _build()
except Exception:  # no compiler / sandboxed exec — NumPy fallback
    lib = None


def _ptr(a: np.ndarray):
    return ctypes.c_void_p(a.ctypes.data)


def _prep(table):
    """C-ready lookup arrays for a SymbolTable (cheap: ≤255 symbols)."""
    from .. import fsstlib

    len1 = np.full(256, 255, dtype=np.uint8)
    if 1 in table.keys_by_len:
        for k, c in zip(table.keys_by_len[1], table.codes_by_len[1]):
            len1[int(k)] = c
    npfx = len(table.long_prefixes)
    has_len = np.zeros(max(npfx, 1), dtype=np.uint8)
    for l in range(3, fsstlib.MAX_SYMBOL_LEN + 1):
        if npfx:
            has_len |= table.prefix_has_len[l].astype(np.uint8) << (l - 1)
    keys_parts, codes_parts, key_off = [], [], np.zeros(10, dtype=np.int64)
    for l in range(9):
        k = table.keys_by_len.get(l)
        if k is not None and l >= 3:
            keys_parts.append(k)
            codes_parts.append(table.codes_by_len[l])
        key_off[l + 1] = key_off[l] + (len(k) if (k is not None and l >= 3) else 0)
    keys = (
        np.concatenate(keys_parts) if keys_parts else np.zeros(0, dtype=np.uint64)
    )
    codes = (
        np.concatenate(codes_parts) if codes_parts else np.zeros(0, dtype=np.uint8)
    )
    lut3 = table.lut3
    if lut3 is None:
        lut3 = np.zeros(1, dtype=np.uint8)  # has_long is False ⇒ never read
    return len1, has_len, keys, codes, key_off, lut3


def encode(data: np.ndarray, offsets: np.ndarray, table):
    """Native twin of fsstlib.encode: (out buffer, per-row payload offsets).
    The kernel's gram loads are tail-safe, so the batch buffer is passed
    as-is — no zeroed pad copy (2 extra passes over the batch)."""
    n = int(data.size)
    n_rows = len(offsets) - 1
    data = np.ascontiguousarray(data, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    out = np.empty(2 * n + 8, dtype=np.uint8)
    po = np.empty(n_rows + 1, dtype=np.int64)
    len1, has_len, keys, codes, key_off, lut3 = _prep(table)
    has_long = int(lut3.size > 1)
    total = lib.fsst_encode(
        _ptr(data), _ptr(offsets), n_rows,
        _ptr(table.short_code), _ptr(table.short_len), _ptr(len1),
        has_long, _ptr(lut3), _ptr(has_len),
        _ptr(keys), _ptr(codes), _ptr(key_off),
        _ptr(out), _ptr(po),
    )
    return out[:total], po


def decode(buf: np.ndarray, payload_offsets: np.ndarray, table,
           out_nbytes: int | None = None):
    """Native twin of fsstlib.decode: (decoded bytes, per-row offsets).

    ``out_nbytes`` (exact decoded size, when the caller knows it from row
    counts) avoids allocating the worst-case 8× bound — first-touch page
    faults on those large buffers dominated cold decode tasks. The kernel
    treats the allocation as a HARD capacity: a corrupt payload that would
    expand past it stops with -1 instead of overflowing the heap."""
    n = int(buf.size)
    n_rows = len(payload_offsets) - 1
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    po = np.ascontiguousarray(payload_offsets, dtype=np.int64)
    # reference decode bound: 8 * compressed + 32 (src/FsstWrapper.hpp:56)
    size = (out_nbytes + 8) if out_nbytes is not None else (8 * n + 32)
    out = np.empty(size, dtype=np.uint8)
    ro = np.empty(n_rows + 1, dtype=np.int64)
    total = lib.fsst_decode(
        _ptr(buf), _ptr(po), n_rows,
        _ptr(table.sym_bytes), _ptr(table.sym_lens_u8),
        _ptr(out), size, _ptr(ro),
    )
    if total < 0:
        raise ValueError(
            "fsst decode: payload expands past the expected output size "
            "(corrupt payload or wrong row counts)"
        )
    return out[:total], ro


def pack_rows(values_u32, offsets, width, payload_offsets, total_bytes):
    """Native bit pack; caller supplies precomputed row payload offsets."""
    vals = np.ascontiguousarray(values_u32, dtype=np.uint32)
    off = np.ascontiguousarray(offsets, dtype=np.int64)
    po = np.ascontiguousarray(payload_offsets, dtype=np.int64)
    out = np.zeros(int(total_bytes), dtype=np.uint8)
    lib.pack_rows(_ptr(vals), _ptr(off), len(off) - 1, int(width),
                  _ptr(out), _ptr(po))
    return out


def unpack_rows(buf, payload_offsets, offsets, width, n_values):
    vals = np.empty(int(n_values), dtype=np.uint32)
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    po = np.ascontiguousarray(payload_offsets, dtype=np.int64)
    off = np.ascontiguousarray(offsets, dtype=np.int64)
    lib.unpack_rows(_ptr(b), _ptr(po), _ptr(off), len(off) - 1, int(width),
                    _ptr(vals))
    return vals


def seg_scatter(buf, dst_base, seg_nbytes, src):
    db = np.ascontiguousarray(dst_base, dtype=np.int64)
    nb = np.ascontiguousarray(seg_nbytes, dtype=np.int64)
    s = np.ascontiguousarray(src, dtype=np.uint8)
    lib.seg_scatter(_ptr(buf), _ptr(db), _ptr(nb), len(nb), _ptr(s))


def seg_gather(buf, src_base, seg_nbytes, total):
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    sb = np.ascontiguousarray(src_base, dtype=np.int64)
    nb = np.ascontiguousarray(seg_nbytes, dtype=np.int64)
    out = np.empty(int(total), dtype=np.uint8)
    lib.seg_gather(_ptr(b), _ptr(sb), _ptr(nb), len(nb), _ptr(out))
    return out


def varint_encode(values_u32, offsets, payload_offsets, total_bytes):
    """Native Stream-VByte pack; caller precomputed the row payload offsets."""
    vals = np.ascontiguousarray(values_u32, dtype=np.uint32)
    off = np.ascontiguousarray(offsets, dtype=np.int64)
    po = np.ascontiguousarray(payload_offsets, dtype=np.int64)
    out = np.zeros(int(total_bytes), dtype=np.uint8)
    lib.varint_encode(_ptr(vals), _ptr(off), len(off) - 1, _ptr(po),
                      _ptr(out))
    return out


def poly_rowhash_u32(values_u32, offsets):
    """Native per-row polynomial hash (bit-identical to the NumPy
    _poly_rowhash on zero-extended uint32 values): 4 bytes read per token
    instead of the vectorized path's ~60 bytes of intermediates."""
    vals = np.ascontiguousarray(values_u32, dtype=np.uint32)
    off = np.ascontiguousarray(offsets, dtype=np.int64)
    out = np.empty(len(off) - 1, dtype=np.uint64)
    lib.poly_rowhash_u32(_ptr(vals), _ptr(off), len(off) - 1, _ptr(out))
    return out


def varint_decode(buf, payload_offsets, offsets, n_values):
    vals = np.empty(int(n_values), dtype=np.uint32)
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    po = np.ascontiguousarray(payload_offsets, dtype=np.int64)
    off = np.ascontiguousarray(offsets, dtype=np.int64)
    lib.varint_decode(_ptr(b), _ptr(po), _ptr(off), len(off) - 1, _ptr(vals))
    return vals


def parse(data: np.ndarray, offsets: np.ndarray, table):
    """Native twin of fsstlib._parse limited to (positions, match lengths) —
    what training needs; codes are not materialized."""
    n = int(data.size)
    n_rows = len(offsets) - 1
    data = np.ascontiguousarray(data, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    pos = np.empty(n + 1, dtype=np.int64)
    ml = np.empty(n + 1, dtype=np.uint8)
    len1, has_len, keys, codes, key_off, lut3 = _prep(table)
    has_long = int(lut3.size > 1)
    total = lib.fsst_parse(
        _ptr(data), _ptr(offsets), n_rows,
        _ptr(table.short_code), _ptr(table.short_len), _ptr(len1),
        has_long, _ptr(lut3), _ptr(has_len),
        _ptr(keys), _ptr(codes), _ptr(key_off),
        _ptr(pos), _ptr(ml),
    )
    return pos[:total], ml[:total].astype(np.int64)


def like_prefilter(
    pay: np.ndarray, po: np.ndarray, comb: np.ndarray, esc_comb: np.ndarray,
    need: int,
) -> np.ndarray:
    """Native requirement-AND prefilter; see fsstkern.c like_prefilter."""
    pay = np.ascontiguousarray(pay, dtype=np.uint8)
    po = np.ascontiguousarray(po, dtype=np.int64)
    n_rows = len(po) - 1
    out = np.empty(n_rows, dtype=np.uint8)
    lib.like_prefilter(
        _ptr(pay), _ptr(po), n_rows,
        _ptr(np.ascontiguousarray(comb, dtype=np.uint8)),
        _ptr(np.ascontiguousarray(esc_comb, dtype=np.uint8)),
        int(need), _ptr(out),
    )
    return out.view(bool)


def kmp_scan(
    pay: np.ndarray, po: np.ndarray, code_delta: np.ndarray,
    char_delta: np.ndarray, m: int,
) -> np.ndarray:
    """Native lockstep-KMP contains match; see fsstkern.c kmp_scan."""
    pay = np.ascontiguousarray(pay, dtype=np.uint8)
    po = np.ascontiguousarray(po, dtype=np.int64)
    n_rows = len(po) - 1
    out = np.empty(n_rows, dtype=np.uint8)
    lib.kmp_scan(
        _ptr(pay), _ptr(po), n_rows,
        _ptr(np.ascontiguousarray(code_delta, dtype=np.int32)),
        _ptr(np.ascontiguousarray(char_delta, dtype=np.int32)),
        int(m), _ptr(out),
    )
    return out.view(bool)


def meta_kmp_scan(
    pay: np.ndarray, po: np.ndarray,
    char_d: list[np.ndarray], code_d: list[np.ndarray],
    acc: list[np.ndarray], m_of: list[int], table,
) -> np.ndarray:
    """Native ordered multi-segment KMP; see fsstkern.c meta_kmp_scan.
    Stacks the per-segment automata row-major (tab_off addresses them)."""
    pay = np.ascontiguousarray(pay, dtype=np.uint8)
    po = np.ascontiguousarray(po, dtype=np.int64)
    n_rows = len(po) - 1
    K = len(m_of)
    tab_off = np.zeros(K + 1, dtype=np.int64)
    for k in range(K):
        tab_off[k + 1] = tab_off[k] + m_of[k] + 1
    cd = np.ascontiguousarray(np.vstack(char_d), dtype=np.int32)
    kd = np.ascontiguousarray(np.vstack(code_d), dtype=np.int32)
    ac = np.ascontiguousarray(np.vstack(acc), dtype=np.int32)
    mo = np.ascontiguousarray(np.asarray(m_of), dtype=np.int32)
    out = np.empty(n_rows, dtype=np.uint8)
    lib.meta_kmp_scan(
        _ptr(pay), _ptr(po), n_rows, _ptr(cd), _ptr(kd), _ptr(ac),
        _ptr(tab_off), _ptr(mo), K,
        _ptr(table.sym_bytes), _ptr(table.sym_lens_u8), _ptr(out),
    )
    return out.view(bool)


def dict_unique_inverse(values: np.ndarray):
    """(sorted unique int32 array, uint32 codes into it) — the dict
    codec's np.unique(return_inverse=True) replaced by one O(n) C hash
    pass; only the SMALL unique array is sorted (u log u) and codes are
    remapped with one gather. Bit-identical to the NumPy contract."""
    v = np.ascontiguousarray(values, dtype=np.int32)
    n = int(v.size)
    if n == 0:
        return np.zeros(0, dtype=np.int32), np.zeros(0, dtype=np.uint32)
    cap = 1 << max(int(n * 2 - 1).bit_length(), 4)
    ht_keys = np.empty(cap, dtype=np.int32)
    ht_codes = np.full(cap, -1, dtype=np.int32)
    uniq = np.empty(n, dtype=np.int32)
    codes = np.empty(n, dtype=np.int32)
    u = lib.dict_unique(
        _ptr(v), n, _ptr(ht_keys), _ptr(ht_codes), cap, _ptr(uniq),
        _ptr(codes),
    )
    uniq = uniq[:u]
    order = np.argsort(uniq, kind="stable")
    rank = np.empty(u, dtype=np.uint32)
    rank[order] = np.arange(u, dtype=np.uint32)
    return uniq[order], rank[codes]
