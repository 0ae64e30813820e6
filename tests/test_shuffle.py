"""Deterministic epoch shuffle (functions/shuffle.py)."""

import numpy as np
import pyarrow as pa
import pytest

from fsst_like_ray.functions.shuffle import (
    epoch_key,
    epoch_key_sql,
    epoch_shuffle,
)


def test_key_matches_sql_restatement():
    import duckdb

    ids = np.concatenate(
        [
            np.arange(64, dtype=np.int64),
            np.array([10**6, 10**9, 2**31, 2**40], dtype=np.int64),
        ]
    )
    for seed, epoch in [(0, 0), (7, 3), (123, 41)]:
        want = epoch_key(ids, seed, epoch).tolist()
        con = duckdb.connect()
        con.execute("CREATE TABLE t(doc_id BIGINT)")
        con.executemany("INSERT INTO t VALUES (?)", [(int(i),) for i in ids])
        got = [
            r[0]
            for r in con.execute(
                f"SELECT {epoch_key_sql(seed, epoch)} FROM t ORDER BY rowid"
            ).fetchall()
        ]
        assert got == want


def test_key_not_affine_in_id():
    """The reason the xor-shift rounds exist: consecutive ids must NOT map
    to a constant-stride progression."""
    ids = np.arange(1000, dtype=np.int64)
    k = epoch_key(ids, 7, 3).astype(np.int64)
    strides = np.diff(k)
    assert len(np.unique(strides)) > 900  # affine would give exactly 1-2


def test_epochs_give_distinct_orders_and_runs_repeat():
    ids = np.arange(5000, dtype=np.int64)
    k3a = epoch_key(ids, 7, 3)
    k3b = epoch_key(ids, 7, 3)
    k4 = epoch_key(ids, 7, 4)
    other_seed = epoch_key(ids, 8, 3)
    assert np.array_equal(k3a, k3b)
    assert np.argsort(k3a, kind="stable").tolist() != np.argsort(
        k4, kind="stable"
    ).tolist()
    assert np.argsort(k3a, kind="stable").tolist() != np.argsort(
        other_seed, kind="stable"
    ).tolist()


def test_key_is_well_dispersed():
    """Uniformity sanity: quartile occupancy of 100k consecutive ids stays
    within 5% of uniform — good enough for balanced range partitioning."""
    k = epoch_key(np.arange(100_000, dtype=np.int64), 1, 1)
    counts, _ = np.histogram(k, bins=4, range=(0, 2**32))
    assert (np.abs(counts / 25_000 - 1.0) < 0.05).all()


@pytest.mark.usefixtures("ray_session")
def test_epoch_shuffle_is_a_permutation():
    import ray.data

    ids = np.arange(2000, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids})).repartition(8)
    out = epoch_shuffle(ds, seed=11, epoch=2)
    got = out.to_pandas()
    # same multiset of ids, globally ordered by the key
    assert sorted(got["doc_id"].tolist()) == ids.tolist()
    keys = got["shuffle_key"].to_numpy()
    assert (np.diff(keys.astype(np.int64)) >= 0).all()
    # and the order is the key-argsort order, independent of partitioning
    want = ids[np.argsort(epoch_key(ids, 11, 2), kind="stable")]
    assert got["doc_id"].tolist() == want.tolist()
