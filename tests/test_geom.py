"""Pins the closed-form bbox similarity to the reference's own test
expectations (reference tests/test_geometry.py:4-17)."""

from pd3f_ray.core.geom import bbox_similarity


def _rect(t, l, h, w):
    return [(t, l), (t + h, l), (t, l + w), (t + h, l + w)]


def test_half_overlap():
    # two unit squares sharing half their area → 0.5
    assert bbox_similarity(_rect(0, 0, 1, 1), _rect(0, 0.5, 1, 1)) == 0.5


def test_identical():
    assert bbox_similarity(_rect(0, 0, 2, 3), _rect(0, 0, 2, 3)) == 1.0


def test_disjoint():
    assert bbox_similarity(_rect(0, 0, 1, 1), _rect(5, 5, 1, 1)) == 0.0


def test_containment():
    # small box inside big box: intersection = small area, ratio = small/big
    assert bbox_similarity(_rect(0, 0, 4, 4), _rect(1, 1, 2, 2)) == (2 * 2) / (4 * 4)
