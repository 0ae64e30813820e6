"""Mergeable sketches for training-data pipelines.

HyperLogLog distinct counting (Flajolet et al. 2007, public algorithm):
each batch builds a 2^P-register sketch vectorized (one hash pass, per-
register max via np.maximum.at); registers merge by elementwise max — the
canonical partial-aggregate shape, so the shuffle moves 2^P-byte sketches,
never rows. Standard error ≈ 1.04/sqrt(2^P) (~1.6% at P=12).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.text import string_buffers
from ..stages.verify import _poly_rowhash

_P = 12  # 4096 registers
_M = 1 << _P
_ALPHA = 0.7213 / (1 + 1.079 / _M)


def hll_batch(batch: pa.Table, col: str = "text") -> pa.Table:
    """One HLL sketch row per batch over the column's row VALUES (hashed
    with the same 64-bit polynomial as the verify stage)."""
    if pa.types.is_integer(batch[col].type):
        v = (
            batch[col]
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
            .view(np.uint64)
        )
        h = _poly_rowhash(v, np.arange(len(v) + 1, dtype=np.int64))
    else:
        data, offsets = string_buffers(batch[col])
        h = _poly_rowhash(data.astype(np.uint64), offsets)
    return pa.table(
        {"hll": pa.array([regs_from_hashes(h).tobytes()], type=pa.binary())}
    )


def regs_from_hashes(h: np.ndarray) -> np.ndarray:
    """HLL register array from a batch of 64-bit row hashes — the
    reusable core of hll_batch (the whole-table store feeds it hashes
    computed from dictionary entries instead of row values)."""
    regs = np.zeros(_M, dtype=np.uint8)
    if len(h):
        # murmur3-style finalizer: the polynomial row hash is not uniform
        # enough in its TOP bits for short keys, and HLL reads exactly those
        with np.errstate(over="ignore"):
            h = h ^ (h >> np.uint64(33))
            h = h * np.uint64(0xFF51AFD7ED558CCD)
            h = h ^ (h >> np.uint64(29))
            h = h * np.uint64(0xC4CEB9FE1A85EC53)
            h = h ^ (h >> np.uint64(32))
        idx = (h >> np.uint64(64 - _P)).astype(np.int64)
        rest = h << np.uint64(_P)  # remaining 64-P bits, top-aligned
        # rank = leading zeros of the remainder + 1 (capped); bit_length via
        # a byte-wise table (float log2 is unsafe near 2^53)
        tbl = np.zeros(256, dtype=np.int64)
        for b in range(1, 256):
            tbl[b] = b.bit_length()
        bl = np.zeros(len(h), dtype=np.int64)
        acc = rest.copy()
        for byte_i in range(8):
            top = (acc >> np.uint64(56)).astype(np.int64)
            hit = (bl == 0) & (top != 0)
            bl[hit] = 64 - byte_i * 8 - (8 - tbl[top[hit]])
            acc = acc << np.uint64(8)
        rank = np.where(rest == 0, 64 - _P + 1, 64 - bl + 1).astype(np.int64)
        np.minimum(rank, 64 - _P + 1, out=rank)
        np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def hll_merge_estimate(sketch_rows) -> int:
    """Merge sketch rows (elementwise max) and estimate cardinality with the
    standard HLL small/large-range corrections."""
    regs = np.zeros(_M, dtype=np.uint8)
    for blob in sketch_rows:
        regs = np.maximum(regs, np.frombuffer(blob, dtype=np.uint8))
    est = _ALPHA * _M * _M / np.sum(np.float64(2.0) ** -regs.astype(np.float64))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * _M and zeros:
        est = _M * np.log(_M / zeros)  # linear counting
    return int(round(est))


def approx_distinct(ds, col: str = "text") -> int:
    """Streaming approximate distinct count: per-batch sketches, tiny
    driver-side merge (one 4 KB sketch per block reaches the driver)."""
    rows = [
        r["hll"]
        for b in ds.map_batches(
            lambda bb: hll_batch(bb, col), batch_format="pyarrow"
        ).iter_batches(batch_size=256, batch_format="pyarrow")
        for r in b.to_pylist()
    ]
    return hll_merge_estimate(rows)


def grouped_hll_batch(
    batch: pa.Table, group_col: str, value_col: str
) -> pa.Table:
    """Per-(block, group) HLL sketches: one argsort segments the batch by
    group, each segment gets its own 4 KB sketch. The per-batch Python
    loop is over DISTINCT GROUPS IN THE BATCH — the operator contract is
    low-cardinality groups (event types, languages, sources), where this
    is a handful of vectorized hll_batch calls."""
    if batch.num_rows == 0:
        return pa.table(
            {
                group_col: pa.array([], type=batch[group_col].type),
                "hll": pa.array([], type=pa.binary()),
            }
        )
    keys = batch[group_col].to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
    bounds = np.r_[starts, len(sk)]
    groups, blobs = [], []
    for i in range(len(starts)):
        seg = batch.take(pa.array(order[bounds[i] : bounds[i + 1]]))
        groups.append(sk[starts[i]])
        blobs.append(hll_batch(seg, value_col)["hll"][0].as_py())
    return pa.table(
        {
            group_col: pa.array(groups).cast(batch[group_col].type),
            "hll": pa.array(blobs, type=pa.binary()),
        }
    )


def grouped_approx_distinct(
    ds, group_col: str, value_col: str
) -> pa.Table:
    """Approximate distinct ``value_col`` per ``group_col``: per-block
    per-group sketches stream to the driver (blocks × groups × 4 KB) and
    merge by elementwise max per group — rows never shuffle."""
    per_group: dict = {}
    for blk in ds.map_batches(
        lambda b: grouped_hll_batch(b, group_col, value_col),
        batch_format="pyarrow",
    ).iter_batches(batch_size=1024, batch_format="pyarrow"):
        gvals = blk[group_col].to_pylist()
        for g, blob in zip(gvals, blk["hll"].to_pylist()):
            prev = per_group.get(g)
            cur = np.frombuffer(blob, dtype=np.uint8)
            per_group[g] = cur if prev is None else np.maximum(prev, cur)
    groups = sorted(per_group)
    return pa.table(
        {
            group_col: pa.array(groups),
            "approx_distinct": pa.array(
                [hll_merge_estimate([per_group[g].tobytes()]) for g in groups],
                type=pa.int64(),
            ),
        }
    )
