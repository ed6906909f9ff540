"""Axis-aligned bounding-box similarity.

The reference computes this with shapely (convex hull of corner points →
envelope box → intersection area / max area, /root/reference/pd3f/geometry.py:7-17).
All points it ever feeds in are the four corners of axis-aligned element
boxes (doc_info.py:91-99 ``only_points``), so the convex-hull envelope is
just the min/max rectangle; the closed form below is exactly equivalent
(pinned by the reference's own tests, tests/test_geometry.py:4-17).
"""

from __future__ import annotations

from collections.abc import Sequence

Point = tuple[float, float]  # (t, l) — top, left; matches only_points order


def envelope(points: Sequence[Point]) -> tuple[float, float, float, float]:
    """(t0, l0, t1, l1) min/max rectangle over the points. Requires >=4
    points like the reference's ``bbox`` assert (geometry.py:8)."""
    if len(points) < 4:
        raise ValueError("need at least 4 points for a bbox")
    ts = [p[0] for p in points]
    ls = [p[1] for p in points]
    return (min(ts), min(ls), max(ts), max(ls))


def _area(b: tuple[float, float, float, float]) -> float:
    return max(0.0, b[2] - b[0]) * max(0.0, b[3] - b[1])


def bbox_similarity(p1: Sequence[Point], p2: Sequence[Point]) -> float:
    """intersection area / max(area1, area2) of the two envelopes."""
    b1, b2 = envelope(p1), envelope(p2)
    it0, il0 = max(b1[0], b2[0]), max(b1[1], b2[1])
    it1, il1 = min(b1[2], b2[2]), min(b1[3], b2[3])
    inter = max(0.0, it1 - it0) * max(0.0, il1 - il0)
    denom = max(_area(b1), _area(b2))
    return inter / denom if denom else 0.0
