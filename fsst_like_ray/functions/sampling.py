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


def token_budget_sample(tokens_ds, budget: int, bucket_bits: int = 20):
    """Per-source TOKEN-budget subsampling: walk each source's documents
    in deterministic hash order (hash32(doc_id), doc_id) and keep a doc
    iff the token total of the docs BEFORE it is still under ``budget``
    — so each source contributes ≈budget tokens (the first overflowing
    doc is kept), the mixture is weighted by TOKENS not documents, and
    re-runs / retries / different cluster sizes select identical rows.

    100-TB shape (no total sort): hash space splits into coarse buckets
    (``hash >> bucket_bits``); pass 1 is a per-batch (source, bucket,
    Σ n_tok) partial → tiny groupby → driver prefix-sums per source
    (driver state = sources × 2^(32-bucket_bits) rows, broadcast once);
    pass 2 is ONE bounded shuffle — groupby (source, bucket) sorts each
    group locally, adds its bucket base, and filters. Mirrors
    pack_sequences' plan/split machinery."""
    import ray
    from ray.data.aggregate import Sum

    def key32(ids: np.ndarray) -> np.ndarray:
        return sample_hash32(ids.astype(np.int64)).astype(np.int64)

    def partials(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        n = b["n_tok"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        bk = key32(ids) >> bucket_bits
        src = b["source"]
        t = pa.table(
            {
                "source": src,
                "bucket": pa.array(bk, type=pa.int64()),
                "tok": pa.array(n, type=pa.int64()),
            }
        )
        g = t.group_by(["source", "bucket"]).aggregate([("tok", "sum")])
        return g.rename_columns(["source", "bucket", "tok"])

    totals = (
        tokens_ds.select_columns(["doc_id", "n_tok", "source"])
        .map_batches(partials, batch_format="pyarrow")
        .groupby(["source", "bucket"])
        .aggregate(Sum("tok", alias_name="tok"))
    )
    rows = sorted(
        (r["source"], int(r["bucket"]), int(r["tok"]))
        for r in totals.take_all()
    )
    bases: dict = {}
    run_src, acc = None, 0
    for src, bucket, tok in rows:
        if src != run_src:
            run_src, acc = src, 0
        bases[(src, bucket)] = acc
        acc += tok
    bases_ref = ray.put(bases) if ray.is_initialized() else bases

    def add_bucket(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        return b.append_column(
            "__bk", pa.array(key32(ids) >> bucket_bits, type=pa.int64())
        )

    def keep_group(g: pa.Table) -> pa.Table:
        bb = (
            ray.get(bases_ref)
            if isinstance(bases_ref, ray.ObjectRef)
            else bases_ref
        )
        src = g["source"][0].as_py()
        bucket = int(g["__bk"][0].as_py())
        base = bb.get((src, bucket), 0)
        if base >= budget:  # whole bucket past the budget: emit nothing
            return g.slice(0, 0).drop_columns(["__bk"])
        ids = g["doc_id"].to_numpy(zero_copy_only=False)
        n = g["n_tok"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, key32(ids)))
        before = base + np.concatenate(
            ([0], np.cumsum(n[order])[:-1])
        )
        keep_sorted = before < budget
        keep = np.zeros(len(ids), dtype=bool)
        keep[order] = keep_sorted
        return g.filter(pa.array(keep)).drop_columns(["__bk"])

    return (
        tokens_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby(["source", "__bk"])
        .map_groups(keep_group, batch_format="pyarrow")
    )
