"""Native C++ classical layer vs the pure-Python reference semantics.

The shared library is built on demand by the ctypes loader; if no compiler
is available the whole module is skipped (the Python path is the fallback
and is tested in test_number_theory.py)."""

import math

import numpy as np
import pytest

from quantumcomputer_tpu.algorithms import _native
from quantumcomputer_tpu.algorithms import number_theory as nt

pytestmark = pytest.mark.skipif(not _native.available(), reason="native library unavailable")


def test_gcd_matches():
    rng = np.random.default_rng(0)
    for _ in range(200):
        a = int(rng.integers(0, 1 << 62))
        b = int(rng.integers(0, 1 << 62))
        assert _native.gcd(a, b) == math.gcd(a, b)


def test_modpow_matches():
    rng = np.random.default_rng(1)
    for _ in range(200):
        b = int(rng.integers(0, 1 << 32))
        e = int(rng.integers(0, 1 << 32))
        m = int(rng.integers(1, 1 << 32))
        assert _native.modpow(b, e, m) == pow(b, e, m)


def test_cf_denominators_match_python():
    # Every dyadic omega that can be measured with L <= 8.
    for L in (3, 5, 8):
        for x in range(1 << L):
            omega = x / (1 << L)
            got = _native.continued_fraction_denominators(omega, 15)
            want = nt.continued_fraction_denominators(omega, 15)
            # Compare modulo u64 wrap (the Python path has exact big ints;
            # agreement is required wherever the C path hasn't wrapped).
            for g, w in zip(got, want):
                if w < (1 << 64):
                    assert g == w, (omega, got, want)


def test_find_period_matches_python():
    cases = [(0.25, 7, 15), (0.75, 7, 15), (0.0, 7, 15), (53 / 128, 2, 35), (0.123456789, 11, 21)]
    for omega, a, C in cases:
        got = _native.find_period_from_omega(omega, a, C, 15, 10)
        want = nt.find_period_from_omega(omega, a, C, use_native=False)
        assert got == want, (omega, a, C)


def test_mult_order_matches():
    for C in (15, 21, 33, 35, 39):
        for a in range(2, C):
            want = nt.multiplicative_order(a, C)
            got = _native.multiplicative_order(a, C)
            assert got == want or (want is None and got is None), (a, C)


def test_dispatch_uses_native():
    # The public API must produce identical results with and without native.
    assert nt.find_period_from_omega(0.25, 7, 15, use_native=True) == 4
    assert nt.find_period_from_omega(0.25, 7, 15, use_native=False) == 4
