"""Structured-oracle semiclassical attempt (algorithms/semiclassical.py
_attempt_fn_structured): branch-probability parity against the gather
path, fallback coverage, and the policy guards."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantumcomputer_tpu.algorithms import semiclassical as sc
from quantumcomputer_tpu.algorithms.semiclassical import run_semiclassical


def _branch_parity(C, L, M, a, forced_bits, dtype=jnp.complex64, rtol=1e-6):
    key = jax.random.PRNGKey(0)
    r_g = run_semiclassical(C, a, L, M, key, dtype, forced_bits=forced_bits,
                            structured=False)
    r_s = run_semiclassical(C, a, L, M, key, dtype, forced_bits=forced_bits,
                            structured=True, _cache={})
    assert r_s.bits == list(forced_bits) == r_g.bits
    np.testing.assert_allclose(r_s.branch_probs, r_g.branch_probs, rtol=rtol)
    assert r_s.x_tilde == r_g.x_tilde


def test_branch_parity_with_real_plans():
    """M large enough that the stride-permutation plans exist (C near
    2^M): every structured step runs the modperm path."""
    M = 14
    C = 251 * 61  # 15311 < 16384, odd semiprime
    assert C < (1 << M)
    L, a = 10, 2
    # verify at least some steps really plan (not all-fallback)
    a_invs = [pow(pow(a, 1 << (L - 1 - s), C), -1, C) for s in range(L)]
    plans = sc._structured_plans(C, a_invs, M)
    assert sum(p is not None for p in plans) >= L // 2
    rng = np.random.default_rng(0)
    for _ in range(3):
        bits = [int(b) for b in rng.integers(0, 2, size=L)]
        _branch_parity(C, L, M, a, bits)


def test_branch_parity_small_modulus_fallback():
    """C far below 2^M: plans mostly refuse (collect rows under the DMA
    floor) and the structured attempt runs its static-scalar gather
    fallback steps — the program form still differs from structured=False
    (unrolled vs fori_loop), so parity is a real check."""
    C, L, M, a = 391, 8, 9, 3
    a_invs = [pow(pow(a, 1 << (L - 1 - s), C), -1, C) for s in range(L)]
    assert any(p is None for p in sc._structured_plans(C, a_invs, M))
    rng = np.random.default_rng(1)
    bits = [int(b) for b in rng.integers(0, 2, size=L)]
    _branch_parity(C, L, M, a, bits)


def test_sampled_run_and_period_e2e():
    from quantumcomputer_tpu.algorithms.semiclassical import (
        find_period_semiclassical,
    )

    period, rec = find_period_semiclassical(
        15311, 2, 16, 14, jax.random.PRNGKey(3), structured=True
    )
    assert all(b in (0, 1) for b in rec.bits)
    assert all(0.0 < p <= 1.0 + 1e-6 for p in rec.branch_probs)
    if period is not None:
        assert pow(2, period, 15311) == 1


def test_complex32_branch_parity():
    M = 14
    C = 251 * 61
    L, a = 6, 2
    bits = [1, 0, 1, 1, 0, 0]
    _branch_parity(C, L, M, a, bits, dtype="complex32", rtol=2e-2)


def test_structured_with_checkpoint_refused(tmp_path):
    with pytest.raises(ValueError, match="checkpoint"):
        run_semiclassical(
            391, 3, 4, 9, jax.random.PRNGKey(0),
            structured=True, checkpoint_dir=str(tmp_path),
        )


def test_env_override_forces_structured(monkeypatch):
    cache = {}
    monkeypatch.setenv("QC_SC_STRUCTURED", "1")
    run_semiclassical(391, 3, 4, 9, jax.random.PRNGKey(0), _cache=cache)
    assert any(isinstance(k, tuple) and k[0] == "structured" for k in cache)
    cache.clear()
    monkeypatch.setenv("QC_SC_STRUCTURED", "0")
    run_semiclassical(391, 3, 4, 9, jax.random.PRNGKey(0), _cache=cache)
    assert not any(isinstance(k, tuple) and k[0] == "structured" for k in cache)


def test_auto_off_cpu(monkeypatch):
    """Off-TPU the auto policy keeps the compile-once gather programs."""
    monkeypatch.delenv("QC_SC_STRUCTURED", raising=False)
    cache = {}
    run_semiclassical(15311, 2, 4, 14, jax.random.PRNGKey(0), _cache=cache)
    assert not any(isinstance(k, tuple) and k[0] == "structured" for k in cache)


def test_cache_lru_bounded():
    cache = {}
    for i, C in enumerate([15311, 15313 * 1 - 2, 15307, 15289, 15287,
                           15277, 15271, 15259, 15255, 15251]):
        if math.gcd(2, C) != 1 or C % 2 == 0:
            continue
        run_semiclassical(
            C, 2, 3, 14, jax.random.PRNGKey(i), structured=True, _cache=cache
        )
    n = sum(1 for k in cache if isinstance(k, tuple) and k[0] == "structured")
    assert n <= 8
