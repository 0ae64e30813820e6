"""Bloom-filter join pruning.

(The reference has no joins — SURVEY.md §2.5; this extends the join family
with the standard distributed-join optimization.)

A ``shuffle_hash_join`` is an all-to-all exchange: EVERY probe-side row is
hashed, serialized and shuffled, even rows whose key has no build-side
partner and that the per-bucket join will immediately drop. At 100 TB the
probe side is the fact table — pruning it BEFORE the shuffle is the single
biggest byte saving a selective join can get.

Shape (all mergeable-partial, like the HLL sketch in ``sketches.py``):

1. ``bloom_build`` — one streaming pass over the build side: each batch
   sets its keys' bits in a local bitmap and emits ONE ``n_bits/8``-byte
   binary row; the driver OR-merges the per-block bitmaps (bitmaps are the
   canonical commutative partial — order/retry safe).
2. ``bloom_prune`` — the merged bitmap is put in the object store ONCE
   (``ray.put``) and every probe batch drops rows failing the k-probe
   membership test, zero-copy Arrow filter. Blooms have NO false negatives,
   so an INNER join over the pruned probe side is bit-identical to the
   unpruned join; false positives only waste a little shuffle volume
   (rate ≈ (1 - e^{-kn/m})^k — default m=2^23 bits, k=4 keeps it <1% up to
   ~1M build keys; size ``n_bits`` up for bigger build sides).

Double hashing (Kirsch & Mitzenmacher 2006, public result): two independent
64-bit multiplicative hashes h1, h2 generate the k probe positions as
h1 + i*h2 — one multiply pass, vectorized over the whole batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .join import get_broadcast, put_broadcast

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _bloom_positions(keys: np.ndarray, n_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions for int keys via double hashing."""
    kk = keys.astype(np.int64, copy=False).view(np.uint64)
    with np.errstate(over="ignore"):
        h1 = kk * _C1
        h1 ^= h1 >> np.uint64(31)
        h2 = (kk * _C2) | np.uint64(1)  # odd → full-period stepping
        steps = np.arange(k, dtype=np.uint64)
        pos = h1[:, None] + steps[None, :] * h2[:, None]
    return (pos % np.uint64(n_bits)).astype(np.int64)


def bloom_insert(bitmap: np.ndarray, keys: np.ndarray, k: int) -> None:
    """Set ``keys``' bits in a uint8 bitmap in place (vectorized)."""
    if not len(keys):
        return
    pos = _bloom_positions(keys, len(bitmap) * 8, k).ravel()
    np.bitwise_or.at(bitmap, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))


def bloom_contains(bitmap: np.ndarray, keys: np.ndarray, k: int) -> np.ndarray:
    """Boolean membership mask (no false negatives)."""
    if not len(keys):
        return np.zeros(0, dtype=bool)
    pos = _bloom_positions(keys, len(bitmap) * 8, k)
    bits = (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


def bloom_build(
    ds: "object", key: str, n_bits: int = 1 << 23, k: int = 4
) -> np.ndarray:
    """Streaming bloom build over a Dataset's integer key column: one
    bitmap partial per block reaches the driver (n_bits/8 bytes each),
    OR-merged — rows never leave the workers."""
    if n_bits % 8:
        raise ValueError("n_bits must be a multiple of 8")

    def partial(b: pa.Table) -> pa.Table:
        bm = np.zeros(n_bits // 8, dtype=np.uint8)
        bloom_insert(bm, b[key].cast(pa.int64()).to_numpy(zero_copy_only=False), k)
        return pa.table({"bloom": pa.array([bm.tobytes()], type=pa.binary())})

    merged = np.zeros(n_bits // 8, dtype=np.uint8)
    for blk in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_size=64, batch_format="pyarrow"
    ):
        for blob in blk["bloom"].to_pylist():
            np.bitwise_or(
                merged, np.frombuffer(blob, dtype=np.uint8), out=merged
            )
    return merged


def bloom_prune(
    ds: "object", key: str, bitmap: np.ndarray, k: int = 4
) -> "object":
    """Drop probe rows whose key cannot be in the build side. The bitmap
    ships through the object store ONCE; each task reads it zero-copy."""
    ref = put_broadcast(bitmap)

    def filt(b: pa.Table) -> pa.Table:
        bm = get_broadcast(ref)
        keys = b[key].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return b.filter(pa.array(bloom_contains(bm, keys, k)))

    return ds.map_batches(filt, batch_format="pyarrow")
