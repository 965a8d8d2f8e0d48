"""DPPParameters tests (mirrors reference
``models/dpp/_tests/test_parameters.py:10-23``)."""

import math

from perphil_tpu.models.dpp import DPPParameters


def test_defaults():
    p = DPPParameters()
    assert p.k1 == 1.0
    assert p.k2 == 1.0 / 1e2  # k2 defaults to k1 / scale_contrast
    assert p.beta == 1.0
    assert p.mu == 1.0


def test_explicit_k2():
    p = DPPParameters(k1=2.0, k2=0.5)
    assert p.k2 == 0.5


def test_eta():
    p = DPPParameters()
    expected = math.sqrt(p.beta * (p.k1 + p.k2) / (p.k1 * p.k2))
    assert abs(p.eta - expected) < 1e-15
    assert abs(p.eta - math.sqrt(101.0)) < 1e-12


def test_float_coercion():
    p = DPPParameters(k1=1, beta=2, mu=3)
    assert isinstance(p.k1, float) and isinstance(p.beta, float)
