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
    max_tokens: int = 1 << 17,
):
    """Bounded estimation sample: at most ``max_rows`` strided rows AND at
    most ``max_tokens`` tokens. 2^17 measured: every codec estimator stays
    within ~2% of its exact encoded total at the correctness-gate window
    (≤15% tolerance), the fsst held-out estimate sits at ~11% vs ~9% at
    the old 2^19 on 8M-token fragments, and the integer-codec estimators
    that actually compete for the win (varint/pfor/dvint/for) are
    near-exact at any size — while the selector's share of encode CPU
    (the socket-bandwidth constraint at 32 cores) drops ~4x. Small enough
    that a 10M-token single row estimates in O(sample), not O(row) —
    estimation may subsample, only encode must see every value.

    Over the token budget, EVERY selected row contributes a CONTIGUOUS
    prefix slice proportional to its share of the tokens — a giant row
    keeps (almost all of) the budget instead of being dropped, and
    contiguity preserves the run/delta adjacency statistics the rle/delta
    estimators depend on (element striding would smear deltas by the
    stride factor)."""
    n_rows = len(offsets) - 1
    total = int(offsets[-1] - offsets[0])
    if n_rows <= max_rows and total <= max_tokens:
        return values, offsets
    stride = max(1, int(np.ceil(n_rows / max_rows)))
    rows = np.arange(0, n_rows, stride)
    counts = np.diff(offsets)[rows].astype(np.int64)
    sampled = int(counts.sum())
    if sampled > max_tokens:
        # proportional contiguous slice per row (≥1 token for non-empty)
        take = (counts * max_tokens // max(sampled, 1)).astype(np.int64)
        take[(counts > 0) & (take == 0)] = 1
        counts = np.minimum(counts, take)
    so = np.zeros(len(rows) + 1, dtype=np.int64)
    np.cumsum(counts, out=so[1:])
    out = np.empty(int(so[-1]), dtype=values.dtype)
    for k, r in enumerate(rows):
        s = offsets[r]
        out[so[k] : so[k + 1]] = values[s : s + counts[k]]
    return out, so


# train-heavy estimators (symbol-table training per estimate) are SCREENED:
# a tiny-prefix estimate runs first, and the full-sample estimate only runs
# when the codec is within SCREEN_SLACK of the best cheap estimate — on
# integer token corpora fsst trails varint/pfor by 40%+, so the expensive
# train+encode drops out of the selector hot path entirely while text-like
# blocks (where fsst IS the winner) still get the full-fidelity estimate.
SCREEN_CODECS = ("fsst",)
SCREEN_TOKENS = 1 << 14
SCREEN_SLACK = 1.15


def select_codec(
    values: np.ndarray,
    offsets: np.ndarray,
    codec_names: list[str] | None = None,
    sample_rows: int = 1024,
    screen_cache: dict | None = None,
) -> tuple[str, dict[str, int], bytes | None]:
    """Returns (winning codec name, {codec: estimated FULL-BLOCK bytes}, and
    the winner's sample-trained state when reusable — saves the auto path a
    second training pass for expensive codecs like fsst). Deterministic:
    the sample, the screen and every tie-break are pure functions of the
    block content.

    ``screen_cache``: a caller-owned dict carried across the sibling
    state windows of ONE batch — a screened codec's trained state from an
    earlier window screens later windows with a train-free
    ``estimate_with_state`` pass (training cost is ~independent of sample
    size, so this is most of the per-window selector time). Only the
    SCREEN rides the cache: any codec that looks competitive still pays
    the full fresh-trained estimate, so the choice never degrades."""
    from . import CODECS

    names = codec_names or list(CODECS)
    full_tokens = int(offsets[-1] - offsets[0])
    full_rows = len(offsets) - 1
    sv, so = _sample(np.ascontiguousarray(values, dtype=np.int32), offsets, sample_rows)
    estimates: dict[str, int] = {}
    states: dict[str, bytes | None] = {}

    def run(name, v, o):
        try:
            estimates[name], states[name] = CODECS[name].estimate(
                v, o, full_tokens=full_tokens, full_rows=full_rows
            )
        except Exception:
            estimates[name] = np.iinfo(np.int64).max
            states[name] = None

    cheap = [n for n in names if n not in SCREEN_CODECS]
    for name in cheap:
        run(name, sv, so)
    best_cheap = min(
        (estimates[n] for n in cheap), default=np.iinfo(np.int64).max
    )
    for name in names:
        if name in estimates:
            continue
        pv, po = _sample(sv, so, sample_rows, max_tokens=SCREEN_TOKENS)
        cached = (
            screen_cache.get(name) if screen_cache is not None else None
        )
        ewstate = getattr(CODECS[name], "estimate_with_state", None)
        if cached is not None and ewstate is not None:
            try:
                estimates[name], states[name] = ewstate(
                    pv, po, cached,
                    full_tokens=full_tokens, full_rows=full_rows,
                )
            except Exception:
                cached = None
        if cached is None or ewstate is None:
            run(name, pv, po)
            if screen_cache is not None and states.get(name):
                screen_cache[name] = states[name]
        if estimates[name] <= SCREEN_SLACK * best_cheap and (
            len(po) - 1 < len(so) - 1 or po[-1] < so[-1]
        ):
            # contender: replace the screen figure with the full-sample
            # estimate (the screen only ever skips work, never fidelity
            # for a codec that might win)
            run(name, sv, so)
    best = min(estimates, key=lambda n: (estimates[n], n))
    return best, estimates, states[best]
