"""Store → training-batch loader (pipelines/loader.py)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fsst_like_ray.pipelines.loader import (
    greedy_boundaries,
    iter_training_batches,
    plan_training_batches,
)
from fsst_like_ray.pipelines.tablestore import compress_table, read_table_store

BUDGET = 4096


@pytest.fixture(scope="module")
def store(tmp_path_factory, ray_session):
    from fsst_like_ray.sources.tokens import write_tokens_parquet

    base = tmp_path_factory.mktemp("loader_store")
    src = str(base / "tokens")
    # 3 source files → 3 fragments (the resume/shard granularity)
    write_tokens_parquet(src, n_rows=1536, seed=7, rows_per_file=512)
    out = str(base / "store")
    compress_table(src, out)
    return out


def _store_rows(store):
    tbl = pa.concat_tables(
        b
        for b in read_table_store(store).iter_batches(
            batch_size=4096, batch_format="pyarrow"
        )
        if b.num_rows
    )
    return tbl


def test_greedy_boundaries_semantics():
    nt = np.array([10, 20, 5, 100, 1, 1, 50], dtype=np.int64)
    b = greedy_boundaries(nt, 35)
    # [10,20,5]=35 | [100] oversized alone | [1,1] | [50] over budget alone
    assert b.tolist() == [0, 3, 4, 6, 7]
    sums = [nt[i:j].sum() for i, j in zip(b[:-1], b[1:])]
    for i, j, s in zip(b[:-1], b[1:], sums):
        assert s <= 35 or j - i == 1
    # degenerate: every row oversized
    assert greedy_boundaries(np.array([9, 9]), 1).tolist() == [0, 1, 2]
    with pytest.raises(ValueError):
        greedy_boundaries(nt, 0)


def test_full_iteration_covers_store_in_order(store):
    tbl = _store_rows(store)
    batches = list(iter_training_batches(store, BUDGET))
    assert [b["step"] for b in batches] == list(range(len(batches)))
    got_ids = np.concatenate([b["doc_id"] for b in batches])
    # loader fragment order is input-path order == doc_id order here
    assert sorted(got_ids.tolist()) == sorted(
        tbl["doc_id"].to_numpy(zero_copy_only=False).tolist()
    )
    for b in batches:
        assert b["n_tokens"] == len(b["tokens"])
        assert b["n_rows"] == len(b["doc_id"])
        assert b["n_tokens"] <= BUDGET or b["oversized"]
        assert b["row_offsets"][0] == 0
        assert b["row_offsets"][-1] == b["n_tokens"]


def test_token_payloads_match_store(store):
    tbl = _store_rows(store)
    toks = tbl["tokens"].combine_chunks()
    by_id = dict(zip(tbl["doc_id"].to_pylist(), toks.to_pylist()))
    for b in iter_training_batches(store, BUDGET):
        ro = b["row_offsets"]
        for k, did in enumerate(b["doc_id"]):
            row = b["tokens"][ro[k] : ro[k + 1]].tolist()
            assert row == by_id[did]


def test_resume_yields_exact_suffix(store):
    full = list(iter_training_batches(store, BUDGET))
    mid = len(full) // 2
    resumed = list(iter_training_batches(store, BUDGET, start_step=mid))
    assert len(resumed) == len(full) - mid
    for a, b in zip(full[mid:], resumed):
        assert a["step"] == b["step"]
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        assert np.array_equal(a["tokens"], b["tokens"])


def test_plan_reuse_and_seek_skips_fragments(store):
    plan = plan_training_batches(store, BUDGET)
    assert len(plan) == 3  # one per source file
    # resume landing inside the LAST fragment must not open earlier ones:
    # equivalent batches either way, and the plan short-circuits by step
    last_first = plan[-1]["first_step"]
    a = list(iter_training_batches(store, BUDGET, start_step=last_first))
    b = list(
        iter_training_batches(
            store, BUDGET, start_step=last_first, plan=plan
        )
    )
    assert len(a) == len(b) == len(plan[-1]["boundaries"]) - 1
    for x, y in zip(a, b):
        assert x["step"] == y["step"]
        assert np.array_equal(x["tokens"], y["tokens"])


def test_rank_sharding_partitions_fragments(store):
    ids0 = np.concatenate(
        [
            b["doc_id"]
            for b in iter_training_batches(store, BUDGET, rank=0, world_size=2)
        ]
    )
    ids1 = np.concatenate(
        [
            b["doc_id"]
            for b in iter_training_batches(store, BUDGET, rank=1, world_size=2)
        ]
    )
    assert set(ids0.tolist()).isdisjoint(ids1.tolist())
    tbl = _store_rows(store)
    assert sorted(ids0.tolist() + ids1.tolist()) == sorted(
        tbl["doc_id"].to_numpy(zero_copy_only=False).tolist()
    )
    with pytest.raises(ValueError):
        plan_training_batches(store, BUDGET, rank=2, world_size=2)


def test_oversized_row_flagged(store, tmp_path):
    src = tmp_path / "big.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1, 2], type=pa.int64()),
                "tokens": pa.array(
                    [list(range(100)), [5, 6]], type=pa.list_(pa.int32())
                ),
                "n_tok": pa.array([100, 2], type=pa.int32()),
                "source": pa.array(["s", "s"]),
            }
        ),
        src,
    )
    out = str(tmp_path / "store")
    compress_table(str(src), out)
    batches = list(iter_training_batches(out, 10))
    assert [b["oversized"] for b in batches] == [True, False]
    assert batches[0]["n_tokens"] == 100


def test_epoch_shuffles_fragment_order(store):
    base = [
        tuple(b["doc_id"].tolist())
        for b in iter_training_batches(store, BUDGET)
    ]
    e1 = [
        tuple(b["doc_id"].tolist())
        for b in iter_training_batches(store, BUDGET, epoch=(7, 1))
    ]
    e1_again = [
        tuple(b["doc_id"].tolist())
        for b in iter_training_batches(store, BUDGET, epoch=(7, 1))
    ]
    e2 = [
        tuple(b["doc_id"].tolist())
        for b in iter_training_batches(store, BUDGET, epoch=(7, 2))
    ]
    assert e1 == e1_again  # deterministic
    # same batches as some fragment-order permutation of the base stream
    assert sorted(e1) == sorted(base)
    assert sorted(e2) == sorted(base)
    assert e1 != e2 or e1 != base  # epochs reshuffle
    # rank sharding still partitions under a shuffled epoch
    ids = [
        d
        for r in range(2)
        for b in iter_training_batches(
            store, BUDGET, rank=r, world_size=2, epoch=(7, 1)
        )
        for d in b["doc_id"].tolist()
    ]
    assert sorted(ids) == sorted(d for t in base for d in t)
    # resume under an epoch yields the exact suffix of that epoch's stream
    full = list(iter_training_batches(store, BUDGET, epoch=(7, 2)))
    mid = len(full) // 2
    resumed = list(
        iter_training_batches(store, BUDGET, epoch=(7, 2), start_step=mid)
    )
    assert [b["step"] for b in resumed] == [b["step"] for b in full[mid:]]
    for a, b in zip(full[mid:], resumed):
        assert a["doc_id"].tolist() == b["doc_id"].tolist()


def test_corpus_store_format(store, tmp_path_factory, ray_session):
    """The flagship compress_dataset store serves the same loader API;
    with one part per fragment the batch stream is IDENTICAL to the
    per-column table store built from the same source files."""
    from fsst_like_ray.pipelines.compress import compress_dataset
    from fsst_like_ray.sources.tokens import write_tokens_parquet

    base = tmp_path_factory.mktemp("loader_corpus")
    src = str(base / "tokens")
    write_tokens_parquet(src, n_rows=1536, seed=7, rows_per_file=512)
    enc = str(base / "enc")
    compress_dataset(src, enc)
    corpus_batches = list(iter_training_batches(enc, BUDGET))
    table_batches = list(iter_training_batches(store, BUDGET))
    assert len(corpus_batches) == len(table_batches)
    for a, b in zip(corpus_batches, table_batches):
        assert a["step"] == b["step"]
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        assert np.array_equal(a["tokens"], b["tokens"])
    # plan over the corpus store must not touch payloads: n_tok is plain
    plan = plan_training_batches(enc, BUDGET)
    assert len(plan) == 3
    resumed = list(
        iter_training_batches(
            enc, BUDGET, start_step=plan[-1]["first_step"], plan=plan
        )
    )
    assert len(resumed) == len(plan[-1]["boundaries"]) - 1


def test_plan_param_mismatch_refused(store):
    plan = plan_training_batches(store, BUDGET)
    with pytest.raises(ValueError, match="recompute the plan"):
        next(iter_training_batches(store, BUDGET, epoch=(7, 1), plan=plan))
    with pytest.raises(ValueError, match="recompute the plan"):
        next(
            iter_training_batches(
                store, BUDGET, rank=1, world_size=2, plan=plan
            )
        )
    with pytest.raises(ValueError, match="recompute the plan"):
        next(iter_training_batches(store, BUDGET * 2, plan=plan))
    # matching params still served
    assert next(iter_training_batches(store, BUDGET, plan=plan))["step"] == 0


def test_batch_rows_cap(store):
    capped = list(iter_training_batches(store, BUDGET, batch_rows=3))
    uncapped = list(iter_training_batches(store, BUDGET))
    assert all(b["n_rows"] <= 3 for b in capped)
    assert len(capped) >= len(uncapped)
    # same rows, same order — only the boundaries move
    assert [d for b in capped for d in b["doc_id"].tolist()] == [
        d for b in uncapped for d in b["doc_id"].tolist()
    ]
    # a plan built without the cap is refused with it
    plan = plan_training_batches(store, BUDGET)
    with pytest.raises(ValueError, match="recompute the plan"):
        next(iter_training_batches(store, BUDGET, batch_rows=3, plan=plan))
    from fsst_like_ray.pipelines.loader import greedy_boundaries

    with pytest.raises(ValueError):
        greedy_boundaries(np.array([1, 2]), 10, batch_rows=0)


def test_parallel_plan_identical(store, ray_session):
    seq = plan_training_batches(store, BUDGET, parallel=False)
    par = plan_training_batches(store, BUDGET, parallel=True)
    assert len(seq) == len(par)
    for a, b in zip(seq, par):
        assert a["frag_key"] == b["frag_key"]
        assert a["first_step"] == b["first_step"]
        assert np.array_equal(a["boundaries"], b["boundaries"])
    # a parallel-built plan serves batches interchangeably
    x = list(iter_training_batches(store, BUDGET, plan=par))
    y = list(iter_training_batches(store, BUDGET, plan=seq))
    assert [b["step"] for b in x] == [b["step"] for b in y]
    for a, b in zip(x, y):
        assert np.array_equal(a["tokens"], b["tokens"])


def test_length_order_reduces_padding(store):
    base = list(iter_training_batches(store, BUDGET))
    bylen = list(iter_training_batches(store, BUDGET, order="length"))
    # same rows served exactly once, just re-batched
    assert sorted(d for b in bylen for d in b["doc_id"].tolist()) == sorted(
        d for b in base for d in b["doc_id"].tolist()
    )
    # token payloads still correct per row under the permutation
    tbl = _store_rows(store)
    by_id = dict(
        zip(tbl["doc_id"].to_pylist(), tbl["tokens"].combine_chunks().to_pylist())
    )
    for b in bylen[:5]:
        ro = b["row_offsets"]
        for k, did in enumerate(b["doc_id"]):
            assert b["tokens"][ro[k] : ro[k + 1]].tolist() == by_id[did]
    # rows within a batch are length-sorted, and padded waste shrinks
    def waste(batches):
        pad = tok = 0
        for b in batches:
            lens = np.diff(b["row_offsets"])
            pad += int(b["n_rows"] * lens.max() - lens.sum())
            tok += int(lens.sum())
        return pad / tok

    for b in bylen:
        lens = np.diff(b["row_offsets"])
        assert (np.diff(lens) >= 0).all()
    assert waste(bylen) < waste(base)
    # resume inside a length-ordered stream is exact
    mid = len(bylen) // 2
    resumed = list(
        iter_training_batches(store, BUDGET, order="length", start_step=mid)
    )
    for a, b in zip(bylen[mid:], resumed):
        assert a["step"] == b["step"]
        assert np.array_equal(a["tokens"], b["tokens"])
    # plan param guard covers order too
    plan = plan_training_batches(store, BUDGET)
    with pytest.raises(ValueError, match="recompute the plan"):
        next(iter_training_batches(store, BUDGET, order="length", plan=plan))


def test_prefetch_bitwise_identical(store):
    """The one-fragment-ahead prefetch thread must not change a single
    byte or the step numbering vs the synchronous path."""
    a = list(iter_training_batches(store, BUDGET, prefetch=True))
    b = list(iter_training_batches(store, BUDGET, prefetch=False))
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x["step"] == y["step"]
        assert x["oversized"] == y["oversized"]
        np.testing.assert_array_equal(x["tokens"], y["tokens"])
        np.testing.assert_array_equal(x["row_offsets"], y["row_offsets"])
        np.testing.assert_array_equal(x["doc_id"], y["doc_id"])


def test_shuffle_order_deterministic_covers_all(store):
    """order='shuffle': each fragment serves a deterministic per-(seed,
    epoch, fragment) permutation of its rows — full coverage, stable
    across re-runs, different across epochs, bit-identical payloads."""
    a = list(
        iter_training_batches(
            store, BUDGET, order="shuffle", epoch=(5, 0)
        )
    )
    b = list(
        iter_training_batches(
            store, BUDGET, order="shuffle", epoch=(5, 0)
        )
    )
    c = list(
        iter_training_batches(
            store, BUDGET, order="shuffle", epoch=(5, 1)
        )
    )
    plain = list(iter_training_batches(store, BUDGET))
    ids = lambda bs: np.concatenate([x["doc_id"] for x in bs])
    assert ids(a).tolist() == ids(b).tolist()  # deterministic
    assert sorted(ids(a).tolist()) == sorted(ids(plain).tolist())  # coverage
    assert ids(a).tolist() != ids(plain).tolist()  # actually shuffled
    assert ids(c).tolist() != ids(a).tolist()  # epoch changes the perm
    # per-row payloads intact under the permutation
    by_id = {}
    for x in plain:
        offs = x["row_offsets"]
        for i, d in enumerate(x["doc_id"]):
            by_id[str(d)] = x["tokens"][offs[i]:offs[i + 1]].tolist()
    for x in a:
        offs = x["row_offsets"]
        for i, d in enumerate(x["doc_id"]):
            assert x["tokens"][offs[i]:offs[i + 1]].tolist() == by_id[str(d)]


def test_keep_sources_filters_without_rewrite(store):
    """keep_sources serves only the chosen domains — full coverage of the
    kept rows, none of the dropped, composing with order='shuffle'."""
    import pyarrow.parquet as pq
    import glob

    all_batches = list(iter_training_batches(store, BUDGET))
    srcs = {}
    tbl = _store_rows(store)
    for d, s in zip(
        tbl["doc_id"].to_pylist(), tbl["source"].to_pylist()
    ):
        srcs[d] = s
    keep = sorted(set(srcs.values()))[:1]  # one domain
    kept_ids = sorted(d for d, s in srcs.items() if s in keep)
    got = list(
        iter_training_batches(store, BUDGET, keep_sources=keep)
    )
    got_ids = sorted(
        str(d) for b in got for d in b["doc_id"]
    )
    assert got_ids == sorted(str(d) for d in kept_ids)
    # composes with shuffle (coverage identical, order differs)
    shuf = list(
        iter_training_batches(
            store, BUDGET, keep_sources=keep, order="shuffle",
            epoch=(3, 1),
        )
    )
    shuf_ids = [str(d) for b in shuf for d in b["doc_id"]]
    assert sorted(shuf_ids) == got_ids
    flat = [str(d) for b in got for d in b["doc_id"]]
    if len(flat) > 2:
        assert shuf_ids != flat
    # a plan built WITHOUT the filter must be refused for a filtered read
    plan = plan_training_batches(store, BUDGET)
    with pytest.raises(ValueError, match="recompute the plan"):
        next(
            iter(
                iter_training_batches(
                    store, BUDGET, plan=plan, keep_sources=keep
                )
            )
        )
