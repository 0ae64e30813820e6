"""Per-block codec auto-selection: sample rows, estimate encoded bytes for
every registered codec, pick the minimum (north-rule requirement; the
reference's fixed always-FSST choice generalized).

Deterministic: the sample is a fixed stride over the block's rows; ties break
by codec name order in the registry.
"""

from __future__ import annotations

import numpy as np


def _sample(
    values: np.ndarray,
    offsets: np.ndarray,
    max_rows: int,
    max_tokens: int = 1 << 19,
):
    # 2^19: large enough that the held-out fsst estimate keeps its ≤15%
    # calibration on ~1M-token blocks (2^18 drifted it to ~23%), small
    # enough that a 10M-token single row estimates in O(sample) not O(row)
    """Bounded estimation sample: at most ``max_rows`` strided rows AND at
    most ``max_tokens`` tokens. The token cap matters for token-heavy rows
    (one 10M-token document would otherwise make every per-codec estimate
    run at full-block cost — estimation is allowed to subsample; only
    encode itself must see every value). Oversized rows are token-strided
    so the sample still reflects the whole row's distribution."""
    n_rows = len(offsets) - 1
    total = int(offsets[-1] - offsets[0])
    if n_rows <= max_rows and total <= max_tokens:
        return values, offsets
    stride = max(1, int(np.ceil(n_rows / max_rows)))
    rows = np.arange(0, n_rows, stride)
    counts = np.diff(offsets)[rows]
    # trim the row set to the token budget (always keep ≥1 row)
    csum = np.cumsum(counts)
    keep = max(1, int(np.searchsorted(csum, max_tokens, side="right")))
    rows, counts = rows[:keep], counts[:keep]
    # a single row over budget: stride WITHIN the row
    row_stride = np.ones(len(rows), dtype=np.int64)
    if counts.sum() > max_tokens and len(rows) == 1:
        row_stride[0] = max(1, int(np.ceil(counts[0] / max_tokens)))
        counts = np.array(
            [len(range(0, int(counts[0]), int(row_stride[0])))],
            dtype=np.int64,
        )
    so = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(counts, out=so[1:])
    out = np.empty(int(so[-1]), dtype=values.dtype)
    for k, r in enumerate(rows):
        seg = values[offsets[r] : offsets[r + 1]]
        if row_stride[k] > 1:
            seg = seg[:: row_stride[k]]
        out[so[k] : so[k + 1]] = seg
    return out, so


def select_codec(
    values: np.ndarray,
    offsets: np.ndarray,
    codec_names: list[str] | None = None,
    sample_rows: int = 1024,
) -> tuple[str, dict[str, int], bytes | None]:
    """Returns (winning codec name, {codec: estimated FULL-BLOCK bytes}, and
    the winner's sample-trained state when reusable — saves the auto path a
    second training pass for expensive codecs like fsst)."""
    from . import CODECS

    names = codec_names or list(CODECS)
    full_tokens = int(offsets[-1] - offsets[0])
    full_rows = len(offsets) - 1
    sv, so = _sample(np.ascontiguousarray(values, dtype=np.int32), offsets, sample_rows)
    estimates: dict[str, int] = {}
    states: dict[str, bytes | None] = {}
    for name in names:
        try:
            estimates[name], states[name] = CODECS[name].estimate(
                sv, so, full_tokens=full_tokens, full_rows=full_rows
            )
        except Exception:
            estimates[name] = np.iinfo(np.int64).max
            states[name] = None
    best = min(estimates, key=lambda n: (estimates[n], n))
    return best, estimates, states[best]
