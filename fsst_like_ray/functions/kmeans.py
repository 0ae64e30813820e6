"""Distributed Lloyd's k-means over an embedding column — the iterative-
algorithm shape: per iteration, centroids are BROADCAST once (``ray.put``),
every block computes k partial rows (count, vector sum, inertia) in one
vectorized pass, and the driver merges ≤ k × n_blocks tiny partials into
the next centroid set. The dataset streams every iteration; no row ever
shuffles and nothing larger than (k × dim) crosses the object store.

Determinism: partial rows are merged in a canonical order (lexsorted over
cluster id, count, and every sum component), so float accumulation order —
and therefore the fitted centroids — do not depend on block arrival order.

Scale contract (100 TB): cost is iters × one-full-scan; cap ``iters`` and
loosen ``tol`` for wide data, or fit on a deterministic sample and do one
final full assign pass (``kmeans_assign``) — the assign pass is embarrass-
ingly parallel. Empty clusters keep their previous centroid.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .join import get_broadcast, put_broadcast
from .similarity import _emb_matrix


def _assign(m: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(labels, squared distances) of rows in m to their nearest centroid."""
    # |x-c|^2 = |x|^2 - 2 x·c + |c|^2 ; argmin over c (vectorized matmul)
    d2 = (
        (m * m).sum(axis=1, keepdims=True)
        - 2.0 * (m @ cents.T)
        + (cents * cents).sum(axis=1)
    )
    lab = np.argmin(d2, axis=1)
    return lab, np.maximum(d2[np.arange(len(m)), lab], 0.0)


def _init_centroids(ds, col: str, k: int, sample_rows: int) -> np.ndarray:
    """Deterministic k-means++ on a bounded head sample (float64)."""
    head = []
    n = 0
    for b in ds.iter_batches(batch_size=4096, batch_format="pyarrow"):
        head.append(_emb_matrix(b, col).astype(np.float64))
        n += len(head[-1])
        if n >= sample_rows:
            break
    m = np.concatenate(head)[:sample_rows]
    if len(m) < k:
        raise ValueError(f"kmeans: need >= k={k} rows, got {len(m)}")
    rng = np.random.default_rng(0)
    cents = [m[0]]
    for _ in range(1, k):
        _, d2 = _assign(m, np.asarray(cents))
        tot = d2.sum()
        if tot <= 0:  # all mass on existing centers: pick any distinct row
            cents.append(m[rng.integers(len(m))])
            continue
        j = np.searchsorted(np.cumsum(d2 / tot), rng.random())
        cents.append(m[min(j, len(m) - 1)])
    return np.asarray(cents)


def kmeans_fit(
    ds: "ray.data.Dataset",
    col: str = "embedding",
    k: int = 8,
    iters: int = 10,
    tol: float = 1e-4,
    sample_rows: int = 4096,
) -> tuple[np.ndarray, float, int]:
    """Fit k centroids; returns (centroids (k, dim) float64, inertia,
    iterations run). One full streaming pass per iteration."""
    cents = _init_centroids(ds, col, k, sample_rows)
    dim = cents.shape[1]
    inertia = float("inf")
    it = 0
    for it in range(1, iters + 1):
        ref = put_broadcast((cents.astype(np.float64), k))

        def partial(b: pa.Table) -> pa.Table:
            c, kk = get_broadcast(ref)
            m = _emb_matrix(b, col).astype(np.float64)
            lab, d2 = _assign(m, c)
            cnt = np.bincount(lab, minlength=kk).astype(np.int64)
            sums = np.zeros((kk, m.shape[1]))
            np.add.at(sums, lab, m)
            sse = np.bincount(lab, weights=d2, minlength=kk)
            nz = np.flatnonzero(cnt)
            return pa.table(
                {
                    "cluster": pa.array(nz.astype(np.int64)),
                    "cnt": pa.array(cnt[nz]),
                    "sse": pa.array(sse[nz]),
                    "sum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums[nz].ravel()), m.shape[1]
                    ),
                }
            )

        parts = [
            b
            for b in ds.map_batches(partial, batch_format="pyarrow")
            .iter_batches(batch_size=65536, batch_format="pyarrow")
            if b.num_rows
        ]
        t = pa.concat_tables(parts).combine_chunks()
        lab = t["cluster"].to_numpy(zero_copy_only=False)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        sse = t["sse"].to_numpy(zero_copy_only=False)
        sums = (
            t["sum"].combine_chunks().values.to_numpy(zero_copy_only=False)
            .reshape(len(t), dim)
        )
        # canonical merge order -> deterministic float accumulation
        order = np.lexsort(tuple(sums.T) + (cnt, lab))
        lab, cnt, sse, sums = lab[order], cnt[order], sse[order], sums[order]
        new = cents.copy()
        tot_cnt = np.zeros(k, dtype=np.int64)
        tot_sum = np.zeros((k, dim))
        np.add.at(tot_cnt, lab, cnt)
        np.add.at(tot_sum, lab, sums)
        nz = tot_cnt > 0
        new[nz] = tot_sum[nz] / tot_cnt[nz, None]
        inertia = float(sse.sum())
        shift = float(np.sqrt(((new - cents) ** 2).sum(axis=1)).max())
        cents = new
        if shift < tol:
            break
    return cents, inertia, it


def kmeans_assign(
    ds: "ray.data.Dataset", centroids: np.ndarray, col: str = "embedding"
) -> "ray.data.Dataset":
    """Append a ``cluster`` (int64) column: nearest centroid per row.
    Centroids broadcast once; embarrassingly parallel."""
    ref = put_broadcast(np.asarray(centroids, dtype=np.float64))

    def tag(b: pa.Table) -> pa.Table:
        cc = get_broadcast(ref)
        lab, _ = _assign(_emb_matrix(b, col).astype(np.float64), cc)
        return b.append_column("cluster", pa.array(lab.astype(np.int64)))

    return ds.map_batches(tag, batch_format="pyarrow")
