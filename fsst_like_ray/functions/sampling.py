"""Deterministic stratified sampling for training-data mixture weighting.

Hash-based Bernoulli sampling with a per-stratum (source) rate: a row is kept
iff ``hash32(doc_id) < rate * 2^32``. Properties that matter at 100 TB:

- **Shuffle-free**: a pure per-batch filter; no groupby, no repartition.
- **Reproducible**: the keep-set is a function of the id alone — re-runs,
  retries, and different cluster sizes all select the same rows (contrast
  ``ds.random_sample``, which is seeded per task and changes with
  parallelism).
- **Consistent across pipelines**: downstream jobs sampling at a higher rate
  select a superset of a lower rate's rows (nested samples for scaling-law
  sweeps).

The hash is Knuth's multiplicative scheme mod 2^32 — simple enough to restate
verbatim in SQL, which is how the driver's DuckDB oracle checks it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

HASH_MULT = 2654435761  # Knuth multiplicative hash constant (2^32 / phi)
_MOD = 1 << 32


def rate_to_threshold(rate: float) -> int:
    """Integer keep-threshold in [0, 2^32] — computed ONCE so the Python and
    SQL predicates compare against the identical integer."""
    return min(_MOD, max(0, int(rate * _MOD)))


def sample_hash32(ids: np.ndarray) -> np.ndarray:
    return (ids.astype(np.uint64) * np.uint64(HASH_MULT)) % np.uint64(_MOD)


def stratified_sample(
    ds,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    strat_col: str = "source",
):
    """Filter ``ds`` down to a deterministic per-source Bernoulli sample."""
    thresholds = {s: rate_to_threshold(r) for s, r in rates.items()}
    default_thr = rate_to_threshold(default_rate)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        h = sample_hash32(ids)
        src = batch[strat_col].to_numpy(zero_copy_only=False)
        thr = np.full(len(ids), default_thr, dtype=np.uint64)
        for s, t in thresholds.items():
            thr[src == s] = t
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def sample_predicate_sql(
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    strat_col: str = "source",
) -> str:
    """The identical predicate as ANSI SQL (DuckDB HUGEINT avoids the 64-bit
    multiply overflow) — shared with the driver oracle."""
    h = f"CAST((CAST({id_col} AS HUGEINT) * {HASH_MULT}) % {_MOD} AS BIGINT)"
    cases = " ".join(
        f"WHEN '{s}' THEN {rate_to_threshold(r)}" for s, r in sorted(rates.items())
    )
    thr = f"(CASE {strat_col} {cases} ELSE {rate_to_threshold(default_rate)} END)"
    return f"{h} < {thr}"
