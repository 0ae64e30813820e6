"""Similarity search over an embedding column (list<float>).

- brute-force cosine top-k: per-batch NumPy matmul against a broadcast query
  matrix (``ray.put`` once, fetched in each actor's __init__ — never
  re-shipped per batch), merged driver-side from tiny per-batch top-k tables;
- IVF variant (the scale path): coarse centroids trained once on a seeded
  sample, rows bucketed by nearest centroid; queries probe only the nearest
  ``nprobe`` buckets;
- embedding near-duplicate detection: random-hyperplane LSH buckets +
  verified cosine (same shuffle pattern as the text dedups).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _emb_matrix(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """(n, dim) float32 view of a list/fixed_size_list embedding column."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    vals = arr.values.to_numpy(zero_copy_only=False).astype(np.float32)
    if pa.types.is_fixed_size_list(arr.type):
        dim = arr.type.list_size
        base = arr.offset * dim
        return vals[base : base + len(arr) * dim].reshape(len(arr), dim)
    off = arr.offsets.to_numpy().astype(np.int64)
    dim = int(off[1] - off[0]) if len(off) > 1 else 0
    base = off[0]
    return vals[base : off[-1]].reshape(len(arr), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceTopK:
    """map_batches callable: holds the (normalized) query matrix (resolved
    from an object-store ref once per worker); emits each batch's local
    top-k per query."""

    def __init__(self, query_ref, k: int, id_col: str = "vec_id"):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        self.q = _normalize(np.asarray(q, dtype=np.float32))
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch))
        sims = m @ self.q.T  # (rows, n_queries)
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        k = min(self.k, len(ids))
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            top = np.argpartition(-sims[:, qi], k - 1)[:k] if k else np.array([], int)
            out_q.extend([qi] * len(top))
            out_id.extend(ids[top].tolist())
            out_sim.extend(sims[top, qi].tolist())
        return pa.table(
            {
                "query": pa.array(out_q, type=pa.int32()),
                "vec_id": pa.array(out_id, type=pa.int64()),
                "sim": pa.array(out_sim, type=pa.float64()),
            }
        )


def brute_force_topk(ds, query: np.ndarray, k: int = 10, id_col: str = "vec_id"):
    """→ pandas DataFrame (query, vec_id, sim) of the global top-k per query.
    The per-batch stage is distributed; only tiny per-batch top-k tables reach
    the driver."""
    query = np.atleast_2d(np.asarray(query, dtype=np.float32))
    # broadcast ONCE via the object store; stateless task pool (no per-task
    # state beyond the shared query ref, so an actor pool only adds spin-up)
    query_ref = ray.put(query) if ray.is_initialized() else query
    fn = BruteForceTopK(query_ref, k, id_col)
    parts = ds.map_batches(
        lambda b, _fn=fn: _fn(b), batch_format="pyarrow"
    ).to_pandas()
    out = (
        parts.sort_values(["query", "sim", "vec_id"], ascending=[True, False, True])
        .groupby("query", as_index=False)
        .head(k)
        .reset_index(drop=True)
    )
    return out


def train_centroids(ds, n_centroids: int = 16, sample_rows: int = 2048, iters: int = 5):
    """Seeded mini k-means on a driver-side sample (the ONLY materialized
    piece; ≈ sample_rows rows regardless of dataset size). The sample is a
    deterministic PER-BLOCK hash-threshold draw — every block contributes
    proportionally, unlike ``limit(n)`` which reads only the first blocks
    (a biased sample when the layout is sorted/clustered)."""
    _PRIME = np.uint64(0x9E3779B97F4A7C15)
    total = ds.count()  # parquet metadata read — no execution
    p = min(1.0, sample_rows / max(total, 1))
    thresh = np.uint64(int(p * (1 << 32)))

    def block_sample(b: pa.Table) -> pa.Table:
        ids = b["vec_id"].to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            h = (ids.astype(np.int64).view(np.uint64) * _PRIME) >> np.uint64(32)
        return b.take(pa.array(np.flatnonzero(h < thresh)))

    sample = ds.map_batches(block_sample, batch_format="pyarrow").to_pandas()
    if len(sample) == 0:
        sample = ds.limit(max(n_centroids, 1)).to_pandas()
    m = _normalize(
        np.stack([np.asarray(v, dtype=np.float32) for v in sample["embedding"]])
    )
    rng = np.random.default_rng(42)
    cents = m[rng.choice(len(m), min(n_centroids, len(m)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(m @ cents.T, axis=1)
        for c in range(len(cents)):
            sel = m[assign == c]
            if len(sel):
                cents[c] = sel.mean(axis=0)
        cents = _normalize(cents)
    return cents


def ivf_topk(
    ds,
    query: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
):
    """IVF-style ANN: probe only the ``nprobe`` clusters nearest each query.

    Pass ``centroids`` (e.g. from ``train_centroids`` or a persisted index)
    to skip per-call training; batch several queries into one call (``query``
    may be a matrix) to share the single filtered scan. For repeated query
    workloads prefer ``build_ivf_index`` + ``ivf_index_topk``, which probes
    stored cells instead of re-scanning and re-assigning the dataset."""
    cents = (
        np.asarray(centroids, dtype=np.float32)
        if centroids is not None
        else train_centroids(ds, n_centroids)
    )
    query = np.atleast_2d(np.asarray(query, dtype=np.float32))
    qn = _normalize(query)
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]
    probe_set = set(probe.ravel().tolist())

    def in_probed(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch))
        assign = np.argmax(m @ cents.T, axis=1)
        keep = np.isin(assign, list(probe_set))
        return batch.take(pa.array(np.flatnonzero(keep)))

    filtered = ds.map_batches(in_probed, batch_format="pyarrow")
    return brute_force_topk(filtered, query, k)


def build_ivf_index(
    ds, index_dir: str, n_centroids: int = 16, sample_rows: int = 2048
) -> np.ndarray:
    """Persist an IVF index: rows bucketed by nearest centroid into
    hive-partitioned parquet (``cell=K/``) plus the centroid matrix. A query
    then READS only its ``nprobe`` cells — the assignment pass runs once at
    build time, not per query (the scale path: query I/O is
    nprobe/n_centroids of the data, and cells are resumable partitions)."""
    import os

    import pyarrow.parquet as pq
    import ray.data

    import shutil

    cents = train_centroids(ds, n_centroids, sample_rows)
    os.makedirs(index_dir, exist_ok=True)
    # a REBUILD must not mix stale cell files with new ones (write_parquet
    # appends into partition dirs, it never replaces)
    shutil.rmtree(os.path.join(index_dir, "cells"), ignore_errors=True)
    np.save(os.path.join(index_dir, "centroids.npy"), cents)

    def assign(batch: pa.Table) -> pa.Table:
        m = _normalize(_emb_matrix(batch))
        cell = np.argmax(m @ cents.T, axis=1).astype(np.int32)
        return batch.append_column("cell", pa.array(cell))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        os.path.join(index_dir, "cells"), partition_cols=["cell"]
    )
    return cents


def ivf_index_topk(
    index_dir: str, query: np.ndarray, k: int = 10, nprobe: int = 4
):
    """Query a persisted IVF index: read ONLY the probed cell partitions."""
    import os

    import ray.data

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    query = np.atleast_2d(np.asarray(query, dtype=np.float32))
    qn = _normalize(query)
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]
    cells = sorted(set(int(c) for c in probe.ravel()))
    # read_parquet wants FILES when given a list — expand the cell dirs
    dirs = [
        os.path.join(root, f)
        for c in cells
        for root, _d, files in os.walk(
            os.path.join(index_dir, "cells", f"cell={c}")
        )
        for f in files
        if f.endswith(".parquet")
    ]
    if not dirs:
        import pandas as pd

        return pd.DataFrame({"query": [], "vec_id": [], "sim": []})
    sub = ray.data.read_parquet(dirs)
    return brute_force_topk(sub, query, k)


def hyperplane_band_rows(
    batch: pa.Table, bands: int = 4, planes_per_band: int = 8
) -> pa.Table:
    """Banded random-hyperplane LSH (seeded planes → deterministic): each
    row explodes into ``bands`` (band, band_val) bucket rows. Banding is the
    recall lever a single bucket id lacks — at cosine ≥0.98 a plane agrees
    w.p. ~0.94, so one 12-plane bucket catches only ~45% of true pairs while
    4 bands of 8 planes catch ~97% — and the band space grows with the data
    (2^8 per band × bands) instead of saturating 2^12 fixed buckets."""
    m = _normalize(_emb_matrix(batch))
    dim = m.shape[1]
    n = m.shape[0]
    rng = np.random.default_rng(7)
    planes = rng.standard_normal((dim, bands * planes_per_band)).astype(np.float32)
    bits = (m @ planes) > 0
    weights = (np.uint64(1) << np.arange(planes_per_band, dtype=np.uint64))
    vals = np.zeros((n, bands), dtype=np.int64)
    for b_i in range(bands):
        seg = bits[:, b_i * planes_per_band : (b_i + 1) * planes_per_band]
        vals[:, b_i] = (seg.astype(np.uint64) * weights[None, :]).sum(axis=1).astype(
            np.int64
        )
    rep = pa.array(np.repeat(np.arange(n), bands))
    return pa.table(
        {
            "band": pa.array(np.tile(np.arange(bands), n).astype(np.int32)),
            "band_val": pa.array(vals.reshape(-1)),
            "vec_id": batch["vec_id"].take(rep),
            "embedding": batch["embedding"].take(rep)
            if not isinstance(batch["embedding"], pa.ChunkedArray)
            else batch["embedding"].combine_chunks().take(rep),
        }
    )


def _cosine_dups(g: pd.DataFrame, threshold: float) -> pd.DataFrame:
    if len(g) < 2:
        return pd.DataFrame({"vec_id": pd.Series([], dtype=g["vec_id"].dtype)})
    g = g.sort_values("vec_id")
    m = _normalize(np.stack([np.asarray(v, dtype=np.float32) for v in g["embedding"]]))
    sims = m[1:] @ m[0]
    return pd.DataFrame({"vec_id": g["vec_id"].to_numpy()[1:][sims >= threshold]})


def _cosine_resolve_block(
    tbl: pa.Table, members: np.ndarray, keepers: np.ndarray, threshold: float
) -> np.ndarray:
    """Vectorized member-vs-keeper cosine for all candidate pairs at once."""
    m = _normalize(_emb_matrix(tbl))
    sims = np.einsum("ij,ij->i", m[members], m[keepers])
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    return ids[members[sims >= threshold]]


def embedding_duplicates(
    ds, threshold: float = 0.98, bands: int = 4, planes_per_band: int = 8
):
    """Near-duplicate vec_ids (cosine ≥ threshold vs their bucket keeper).
    Same scale shape as the text dedups: banded LSH explode → hot-bucket
    prefilter (singleton buckets never reach Python) → verified cosine."""
    from .dedup import resolve_hot_buckets

    exploded = ds.map_batches(
        lambda b: hyperplane_band_rows(b, bands, planes_per_band),
        batch_format="pyarrow",
    )
    return resolve_hot_buckets(
        exploded,
        ["band", "band_val"],
        lambda g: _cosine_dups(g, threshold),
        materialize=True,
        unique_col="vec_id",
        resolve_block=lambda t, m, k: _cosine_resolve_block(t, m, k, threshold),
    )
