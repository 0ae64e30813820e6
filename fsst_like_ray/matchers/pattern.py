"""LIKE pattern classification.

Dialect matches the reference: ``%`` multi-char wildcard only; ``_`` is
detected and rejected (reference: src/algos/StdFind.hpp:107); splitter drops
empty segments (SplitPattern, src/Utility.hpp:37-51). Shapes: exact, ``p%``,
``%p``, ``%p%``, ``%p1%p2%...%`` and the general anchored ``p1%p2`` form
(which the reference TODO'd — src/algos/StdFind.hpp:124 — supported here via
the decoded path).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LikePattern:
    raw: str
    segments: tuple[bytes, ...]
    anchor_start: bool  # no leading %
    anchor_end: bool  # no trailing %

    @property
    def shape(self) -> str:
        n = len(self.segments)
        if n == 0:
            return "all" if "%" in self.raw else "exact"
        if n == 1:
            if self.anchor_start and self.anchor_end:
                return "exact"
            if self.anchor_start:
                return "prefix"
            if self.anchor_end:
                return "suffix"
            return "contains"
        if not self.anchor_start and not self.anchor_end:
            return "multi"
        return "general"


def parse_like(pattern: str) -> LikePattern:
    if "_" in pattern:
        raise ValueError(
            "'_' wildcard not supported (matches the reference's dialect)"
        )
    parts = pattern.split("%")
    anchor_start = not pattern.startswith("%")
    anchor_end = not pattern.endswith("%")
    segments = tuple(p.encode("utf-8") for p in parts if p)
    return LikePattern(pattern, segments, anchor_start, anchor_end)
