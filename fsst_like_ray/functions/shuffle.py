"""Deterministic multi-epoch global shuffle for training-data ordering.

Training runs need a different-but-reproducible document order per epoch:
the order must be (1) a function of (seed, epoch, doc_id) alone — identical
across re-runs, retries, resumes and cluster sizes (``ds.random_shuffle`` is
none of these: its permutation changes with task layout), (2) cheap to
recompute for any row in isolation (a resumed loader can re-derive where a
row lands without replaying the shuffle), and (3) SQL-restatable so the
driver's DuckDB oracle can verify the exact permutation.

The order key is a murmur-style finisher mod 2^32 — multiply, then
xor-shift, twice — seeded by an additive (seed, epoch) mix. The xor-shift
rounds matter: a purely multiplicative key is AFFINE in the id (consecutive
ids land on a constant-stride arithmetic progression — dispersed globally
but locally structured, a visibly bad shuffle), while one xor of the high
half into the low half breaks linearity. Not cryptographic, but every
operation (multiply, add, mod, xor, shift-as-divide) exists verbatim in
DuckDB SQL (HUGEINT intermediates avoid 64-bit overflow, the same trick
functions/sampling.py uses for its oracle).

The shuffle itself is ``ds.sort(key)`` — ONE range-partitioned all-to-all,
which is the minimum any true global shuffle pays. At 100 TB prefer
:func:`epoch_key_batch` + an existing downstream partitioner (the key is
uniform on [0, 2^32), so fixed-width key ranges are balanced splits) over
materializing a fully sorted copy per epoch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sampling import HASH_MULT, _MOD

# xxHash32 primes for the (seed, epoch) mix — arbitrary odd constants; the
# mix is computed ONCE in Python and inlined as a literal into both the
# NumPy kernel and the SQL restatement, so the two can never diverge.
_P2, _P3 = 2246822519, 3266489917


def epoch_mix(seed: int, epoch: int) -> int:
    """The per-(seed, epoch) additive constant, reduced mod 2^32."""
    return (seed * _P2 + epoch * _P3 + HASH_MULT) % _MOD


def epoch_key(ids: np.ndarray, seed: int, epoch: int) -> np.ndarray:
    """uint64 order keys in [0, 2^32): (multiply, xor-shift-16) twice over
    the id + (seed, epoch) mix. Same id, same (seed, epoch) → same key,
    everywhere."""
    mix = np.uint64(epoch_mix(seed, epoch))
    m = np.uint64(HASH_MULT)
    mod = np.uint64(_MOD)
    h = (ids.astype(np.uint64) + mix) % mod
    h = (h * m) % mod
    h ^= h >> np.uint64(16)
    h = (h * m) % mod
    h ^= h >> np.uint64(16)
    return h


def epoch_key_sql(seed: int, epoch: int, id_col: str = "doc_id") -> str:
    """The identical key as a DuckDB-SQL expression: HUGEINT multiplies,
    ``xor(h, h // 65536)`` for the xor-shift (h is non-negative, so the
    integer divide IS the logical right shift)."""
    mix = epoch_mix(seed, epoch)
    h = f"((CAST({id_col} AS HUGEINT) + {mix}) % {_MOD})"
    h = f"(({h} * {HASH_MULT}) % {_MOD})"
    h = f"xor({h}, {h} // 65536)"
    h = f"((CAST({h} AS HUGEINT) * {HASH_MULT}) % {_MOD})"
    h = f"xor({h}, {h} // 65536)"
    return f"CAST({h} AS BIGINT)"


def epoch_key_batch(seed: int, epoch: int, id_col: str = "doc_id",
                    key_col: str = "shuffle_key"):
    """A map_batches fn appending the epoch order key as int64 — compose
    with any partitioner / sort; no state, no shuffle of its own."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        k = epoch_key(ids, seed, epoch).astype(np.int64)
        return batch.append_column(key_col, pa.array(k))

    return fn


def epoch_shuffle(ds, seed: int, epoch: int, id_col: str = "doc_id"):
    """Dataset → the same rows in the (seed, epoch) global order, with the
    order key attached as ``shuffle_key``. One range shuffle (ds.sort);
    ties are impossible given unique ids because the sort key is
    (shuffle_key, id)."""
    keyed = ds.map_batches(
        epoch_key_batch(seed, epoch, id_col), batch_format="pyarrow"
    )
    return keyed.sort(["shuffle_key", id_col])
