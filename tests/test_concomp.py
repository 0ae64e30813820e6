"""Distributed connected components vs a local union-find oracle — graph
shapes the oracle sweep can't isolate: long paths (log-depth convergence),
clique pairs with a single bridge, sparse random graphs, 40-bit node ids."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def _uf(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


@pytest.mark.parametrize(
    "name",
    ["random", "path", "cliques_bridge", "bigids", "selfloops_dups"],
)
def test_connected_components_matches_union_find(ray_session, name):
    from fsst_like_ray.functions.concomp import connected_components

    rng = np.random.default_rng(11)
    if name == "random":
        e = rng.integers(0, 500, size=(400, 2))
    elif name == "path":
        p = np.arange(300)
        e = np.stack([p[:-1], p[1:]], axis=1)
    elif name == "cliques_bridge":
        c1 = np.array([(i, j) for i in range(10) for j in range(i)])
        e = np.concatenate([c1, c1 + 1000, np.array([[5, 1005]])])
    elif name == "bigids":
        e = rng.integers(0, 2**40, size=(50, 2))
    else:  # self loops + duplicate edges must be harmless
        e = np.array([[1, 1], [2, 3], [3, 2], [2, 3], [4, 4], [3, 5]])
    ds = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array(e[:, 0], type=pa.int64()),
                "v": pa.array(e[:, 1], type=pa.int64()),
            }
        )
    ).repartition(4)
    got = connected_components(ds).to_pandas()
    assert got["node"].is_unique
    want = _uf(e.tolist(), set(e[:, 0]) | set(e[:, 1]))
    gm = dict(zip(got["node"], got["component"]))
    real = {a for a, b in e.tolist() if a != b} | {
        b for a, b in e.tolist() if a != b
    }
    assert set(gm) == real  # isolated (self-loop-only) nodes are absent
    for n in real:
        assert gm[n] == want[n], (name, n, gm[n], want[n])


def test_exact_duplicate_pairs_star_edges(ray_session):
    """Pairs point at the identical-TEXT group min (hash collisions may
    not merge distinct texts) and feed CC into exact clusters."""
    from fsst_like_ray.functions.concomp import connected_components
    from fsst_like_ray.functions.dedup import exact_duplicate_pairs

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3, 4, 5, 6],
            "text": ["aa", "bb", "aa", "cc", "bb", "aa", "dd"],
        }
    )
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(3)
    pairs = exact_duplicate_pairs(ds).to_pandas()
    want_pairs = {(2, 0), (5, 0), (4, 1)}
    assert set(zip(pairs["u"], pairs["v"])) == want_pairs
    comps = connected_components(
        ray.data.from_arrow(pa.Table.from_pandas(pairs))
    ).to_pandas()
    gm = dict(zip(comps["node"], comps["component"]))
    assert gm == {0: 0, 2: 0, 5: 0, 1: 1, 4: 1}


def test_exact_duplicate_pairs_no_dups(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": ["a", "b", "c"]})
    from fsst_like_ray.functions.dedup import exact_duplicate_pairs

    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    out = exact_duplicate_pairs(ds).to_pandas()
    assert len(out) == 0


from hypothesis import given, settings, strategies as st


@settings(max_examples=12, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 60), st.integers(0, 60)),
        min_size=1,
        max_size=120,
    )
)
def test_connected_components_property(ray_session, edges):
    """Random graphs (self loops, duplicates, skew allowed): CC assignment
    equals the union-find oracle on every non-isolated node."""
    from fsst_like_ray.functions.concomp import connected_components

    e = np.array(edges, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "u": pa.array(e[:, 0], type=pa.int64()),
                "v": pa.array(e[:, 1], type=pa.int64()),
            }
        )
    ).repartition(3)
    got = connected_components(ds, n_buckets=5).to_pandas()
    if "node" not in got.columns:  # all-empty Ray result loses its schema
        got = pd.DataFrame({"node": [], "component": []})
    gm = dict(zip(got["node"], got["component"]))
    want = _uf(e.tolist(), set(e[:, 0]) | set(e[:, 1]))
    real = {a for a, b in e.tolist() if a != b} | {
        b for a, b in e.tolist() if a != b
    }
    assert set(gm) == real
    for n_ in real:
        assert gm[n_] == want[n_]


def test_exact_pairs_no_broadcast_and_forced_distributed(
    ray_session, monkeypatch
):
    """The pair emitter must produce identical star edges when the hot set
    may not broadcast AND the driver caps are off (the full distributed
    keeper-join path with the emit_block hook)."""
    import ray.data
    from fsst_like_ray.functions import dedup as D

    t = pa.table(
        {
            "doc_id": pa.array(range(30), type=pa.int64()),
            "text": pa.array(
                [f"dup-{i % 7}" if i < 21 else f"uniq-{i}" for i in range(30)]
            ),
        }
    )
    expect = sorted(
        (i, i % 7) for i in range(7, 21)
    )  # members 7..20 point at keepers 0..6
    base = sorted(
        (int(r["u"]), int(r["v"]))
        for r in D.exact_duplicate_pairs(
            ray.data.from_arrow(t).repartition(4)
        ).take_all()
    )
    assert base == expect
    monkeypatch.setattr(D, "HOT_KEY_BROADCAST_CAP", 0)
    monkeypatch.setattr(D, "DRIVER_CAP_ROWS", 0)
    monkeypatch.setattr(D, "SALT_MIN_MEMBERS", 2)
    forced = sorted(
        (int(r["u"]), int(r["v"]))
        for r in D.exact_duplicate_pairs(
            ray.data.from_arrow(t).repartition(4)
        ).take_all()
    )
    assert forced == expect
