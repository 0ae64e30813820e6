"""Per-block codec auto-selection: sample rows, estimate encoded bytes for
every registered codec, pick the minimum (north-rule requirement; the
reference's fixed always-FSST choice generalized).

Deterministic: the sample is a fixed stride over the block's rows; ties break
by codec name order in the registry.
"""

from __future__ import annotations

import numpy as np


def _sample(values: np.ndarray, offsets: np.ndarray, max_rows: int):
    n_rows = len(offsets) - 1
    if n_rows <= max_rows:
        return values, offsets
    stride = int(np.ceil(n_rows / max_rows))
    rows = np.arange(0, n_rows, stride)
    counts = np.diff(offsets)[rows]
    so = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(counts, out=so[1:])
    out = np.empty(int(so[-1]), dtype=values.dtype)
    for k, r in enumerate(rows):
        out[so[k] : so[k + 1]] = values[offsets[r] : offsets[r + 1]]
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
