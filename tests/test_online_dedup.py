"""Sharded online-dedup registry: cross-epoch persistence, in-batch
dedup, hash-collision exactness, and the count-determinism contract the
driver query relies on."""

from __future__ import annotations

import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")


def _ds(texts, start_id=0):
    import ray

    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "doc_id": range(start_id, start_id + len(texts)),
                "text": texts,
            }
        )
    )


def test_cross_epoch_and_in_batch_dedup(ray_session):
    from fsst_like_ray.functions.online_dedup import OnlineDedup

    reg = OnlineDedup(n_shards=3)
    # epoch 0: one in-batch duplicate
    kept0 = reg.filter(_ds(["alpha", "beta", "alpha"])).to_pandas()
    assert sorted(kept0["text"]) == ["alpha", "beta"]
    assert reg.registry_size() == 2
    # epoch 1: one cross-epoch dup, one new, one in-epoch dup of the new
    kept1 = reg.filter(_ds(["beta", "gamma", "gamma"], 10)).to_pandas()
    assert sorted(kept1["text"]) == ["gamma"]
    assert reg.registry_size() == 3
    # epoch 2: everything already seen
    kept2 = reg.filter(_ds(["alpha", "beta", "gamma"], 20)).to_pandas()
    assert len(kept2) == 0


def test_collision_exactness(ray_session):
    """Two DIFFERENT texts forced onto one shard with the same hash must
    both be admitted in verify mode (collisions cannot drop a doc)."""
    import ray

    from fsst_like_ray.functions.online_dedup import DedupShardActor

    shard = DedupShardActor.remote(verify_texts=True)
    assert ray.get(shard.admit.remote([7], [100], ["textA"])) == [True]
    assert ray.get(shard.admit.remote([7], [101], ["textB"])) == [True]
    assert ray.get(shard.admit.remote([7], [102], ["textA"])) == [False]
    assert ray.get(shard.n_entries.remote()) == 1  # one hash bucket


def test_hash_only_mode_drops_by_hash(ray_session):
    import ray

    from fsst_like_ray.functions.online_dedup import DedupShardActor

    shard = DedupShardActor.remote(verify_texts=False)
    assert ray.get(
        shard.admit.remote([1, 2, 1], [10, 11, 12])
    ) == [True, True, False]


def test_retry_idempotence(ray_session):
    """A retried task re-sends the same (hash, owner) pairs and must get
    the SAME verdicts — the at-least-once execution contract. A different
    owner with the same content still loses."""
    import ray

    from fsst_like_ray.functions.online_dedup import DedupShardActor

    for verify in (True, False):
        shard = DedupShardActor.remote(verify_texts=verify)
        texts = ["x", "y"] if verify else None
        first = ray.get(shard.admit.remote([5, 6], [50, 60], texts))
        assert first == [True, True]
        # simulated retry: identical call → identical verdicts
        assert ray.get(shard.admit.remote([5, 6], [50, 60], texts)) == first
        # a genuine duplicate from another row still loses
        assert ray.get(
            shard.admit.remote([5], [99], ["x"] if verify else None)
        ) == [False]


def test_count_determinism_across_batch_sizes(ray_session):
    """Same stream at different block structure → identical kept COUNTS
    (the query's contract; keeper identity may differ)."""
    from fsst_like_ray.functions.online_dedup import OnlineDedup

    texts = [f"t{i % 17}" for i in range(100)]
    counts = []
    for n_blocks in (1, 7):
        reg = OnlineDedup(n_shards=2)
        ds = _ds(texts).repartition(n_blocks)
        counts.append(reg.filter(ds).count())
    assert counts[0] == counts[1] == 17
