"""Global ordered prefix scan vs a NumPy oracle: extremes must be exact
across block structures, ties, negatives, and the non-unique-key guard."""

from __future__ import annotations

import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")


def _run(df, n_blocks):
    import ray

    from fsst_like_ray.functions.prefix import global_prefix_extremes

    ds = ray.data.from_pandas(df).repartition(n_blocks)
    return global_prefix_extremes(ds, ["t", "uid"], "v")


@pytest.mark.parametrize("n_blocks", [1, 5, 16])
def test_extremes_match_numpy(ray_session, n_blocks):
    rng = np.random.default_rng(31)
    n = 20_000
    df = pd.DataFrame(
        {
            "t": rng.integers(0, 500, n),  # heavy ties across blocks
            "uid": np.arange(n, dtype=np.int64),
            "v": rng.integers(-3, 4, n),
        }
    )
    got = _run(df, n_blocks)
    run = df.sort_values(["t", "uid"])["v"].cumsum()
    assert got["max"] == run.max()
    assert got["min"] == run.min()
    assert got["total"] == df["v"].sum()


def test_all_identical_keys_degenerate(ray_session):
    """Fully tied order keys collapse to one non-empty range block — the
    scan must still be exact (and the duplicate-first-key guard must not
    misfire on the empty blocks)."""
    n = 200_000
    df = pd.DataFrame(
        {
            "t": np.ones(n, dtype=np.int64),
            "uid": np.zeros(n, dtype=np.int64),
            "v": np.ones(n, dtype=np.int64),
        }
    )
    got = _run(df, 8)
    assert got == {"max": n, "min": 1, "total": n}
