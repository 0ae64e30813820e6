"""LIKE pattern classification.

Dialect: ``%`` multi-char wildcard; ``_`` single-char wildcard (the
reference REJECTS ``_`` — src/algos/StdFind.hpp:107 — but a real LIKE user
hits it constantly, and the decoded path's ``pc.match_like`` implements full
SQL LIKE, so patterns containing ``_`` classify as shape ``general`` and
run decode-verify); splitter drops empty segments (SplitPattern,
src/Utility.hpp:37-51). Shapes: exact, ``p%``, ``%p``, ``%p%``,
``%p1%p2%...%`` and the general anchored ``p1%p2`` form (which the
reference TODO'd — src/algos/StdFind.hpp:124 — supported here via the
decoded path).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class LikePattern:
    raw: str
    segments: tuple[bytes, ...]
    anchor_start: bool  # no leading %
    anchor_end: bool  # no trailing %
    has_underscore: bool = False

    @property
    def shape(self) -> str:
        if self.has_underscore:
            # '_' can sit inside any segment, so segments are NOT literal
            # needles — only the full-pattern decoded matcher is sound
            return "general"
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
    parts = pattern.split("%")
    anchor_start = not pattern.startswith("%")
    anchor_end = not pattern.endswith("%")
    segments = tuple(p.encode("utf-8") for p in parts if p)
    return LikePattern(
        pattern, segments, anchor_start, anchor_end, "_" in pattern
    )
