"""Parity tests for the structured modular-stride permutation
(ops/modperm.py) against the table-gather oracle
(ops/gates.modmul_inverse_permutation)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from quantumcomputer_tpu.ops.gates import modmul_inverse_permutation
from quantumcomputer_tpu.ops.modperm import (
    apply_stride_permute,
    plan_stride_permute,
    rational_split,
)


def _ref_permute(x: np.ndarray, C: int, a_inv: int, M: int) -> np.ndarray:
    ginv = np.asarray(modmul_inverse_permutation(C, pow(a_inv, -1, C), M))
    return x[..., ginv]


def _check(C: int, a_inv: int, M: int, *, require_plan: bool) -> bool:
    plan = plan_stride_permute(C, a_inv, M)
    if plan is None:
        assert not require_plan, f"no plan for C={C} a_inv={a_inv} M={M}"
        return False
    rng = np.random.default_rng(C * 7919 + a_inv)
    x = rng.standard_normal((2, 1 << M)).astype(np.float32)
    got = np.asarray(apply_stride_permute(jnp.asarray(x), plan))
    want = _ref_permute(x, C, a_inv, M)
    np.testing.assert_array_equal(got, want)
    return True


def test_rational_split_reconstructs():
    rng = np.random.default_rng(0)
    for _ in range(200):
        C = int(rng.integers(5, 1 << 24)) | 1
        a_inv = int(rng.integers(2, C))
        if math.gcd(a_inv, C) != 1:
            continue
        split = rational_split(a_inv, C)
        if split is None:
            continue
        eps, u, v = split
        assert u > 0 and v > 0 and eps in (-1, 1)
        assert math.gcd(v, C) == 1
        assert (eps * u * pow(v, -1, C) - a_inv) % C == 0
        # Lattice bound: consecutive Euclid rows satisfy r*|t| < C, so
        # the chosen pair's product stays below C regardless of which
        # candidates the tile-friendliness floor removed.
        assert u * v < C
        # The floor itself: no factor in the catastrophic-tiling zone.
        assert u == 1 or u >= 32
        assert v == 1 or v >= 32


def test_split_balanced_at_scale():
    """For prime C no convergent is gcd-skipped, so the lattice bound
    max(u, v) <= sqrt(C)-scale is guaranteed."""
    rng = np.random.default_rng(1)
    C = 2147483647  # 2^31 - 1, prime
    for _ in range(50):
        a_inv = int(rng.integers(2, C))
        if math.gcd(a_inv, C) != 1:
            continue
        split = rational_split(a_inv, C)
        assert split is not None
        _, u, v = split
        assert max(u, v) <= 2 * math.isqrt(C) + 2


@pytest.mark.parametrize("M", [8, 10, 12, 14])
def test_fuzz_parity_small(M):
    rng = np.random.default_rng(M)
    planned = 0
    for _ in range(40):
        C = int(rng.integers(3, (1 << M) + 1)) | 1
        if C > (1 << M):
            C -= 2
        a = int(rng.integers(2, C)) if C > 3 else 2
        if math.gcd(a, C) != 1:
            continue
        a_inv = pow(a, -1, C)
        if a_inv <= 1:
            continue
        planned += _check(C, a_inv, M, require_plan=False)
    # At small M most moduli fall below the slice-width floor; the ones
    # that plan must be exact (asserted inside _check).


def test_fuzz_parity_large():
    """The regime the path exists for: C within a few percent of 2^M.
    A minority of multipliers legitimately refuse (their only balanced
    splits have a factor in the catastrophic-tiling zone, e.g.
    a_inv = 2^{-1} mod C); coverage must stay high, parity exact."""
    rng = np.random.default_rng(42)
    M = 18
    eligible = planned = 0
    for _ in range(25):
        C = int(rng.integers((1 << M) - (1 << 14), (1 << M) + 1)) | 1
        if C > (1 << M):
            C -= 2
        a = int(rng.integers(2, C))
        if math.gcd(a, C) != 1:
            continue
        a_inv = pow(a, -1, C)
        if a_inv <= 1:
            continue
        eligible += 1
        planned += _check(C, a_inv, M, require_plan=False)
    assert planned >= (3 * eligible) // 4, (planned, eligible)


def test_power_of_two_dim_modulus():
    # C == 2^M is even, never coprime with a — but C = 2^M - 1 is the
    # densest legal case (no identity tail beyond one element).  It is
    # also highly composite (3*5*17*257): many convergents gcd-skip, so
    # some multipliers (a=7) land with no tile-friendly split and must
    # refuse cleanly; others plan and must be exact.
    M = 16
    C = (1 << M) - 1
    # (a = 7 and a = C-2 refuse: their splits need v in {7, 2})
    for a in (32, 37, 41, 43):
        if math.gcd(a, C) != 1:
            continue
        _check(C, pow(a, -1, C), M, require_plan=True)
    assert plan_stride_permute(C, pow(7, -1, C), M) is None


def test_negation_only_case():
    # a_inv = C - 1 : eps = -1, u = v = 1 — pure index reversal.
    M = 14
    C = (1 << M) - 3
    assert math.gcd(C - 1, C) == 1
    assert _check(C, C - 1, M, require_plan=True)


def test_single_leg_cases():
    M = 16
    C = (1 << M) - 15
    # small a_inv: u = a_inv, v = 1 (deal leg only)
    a_inv = 197
    assert math.gcd(a_inv, C) == 1
    plan = plan_stride_permute(C, a_inv, M)
    assert plan is not None and plan.v == 1 and plan.u == a_inv
    _check(C, a_inv, M, require_plan=True)
    # a_inv = inverse of a small v: the split may pick either a pure
    # collect leg or a cheaper balanced pair — parity must hold either way
    v = 311
    assert math.gcd(v, C) == 1
    a_inv = pow(v, -1, C)
    _check(C, a_inv, M, require_plan=True)


def test_shor_power_sequence():
    """The actual per-step multipliers of a semiclassical attempt:
    a_inv_s = (a^(2^s))^{-1} mod C.  The tiny-power steps (a^1, a^2,
    a^4 for a=2 — split v in {2,4,16}, catastrophic tiling) refuse and
    fall back to the gather; the generic big-exponent steps must plan."""
    M = 18
    C = 251 * 1013  # odd semiprime just below 2^18
    assert C < (1 << M)
    a = 2
    eligible = planned = 0
    for s in range(12):
        a_inv = pow(pow(a, 1 << s, C), -1, C)
        if a_inv <= 1:
            continue
        eligible += 1
        planned += _check(C, a_inv, M, require_plan=False)
    assert planned >= (2 * eligible) // 3, (planned, eligible)


def test_identity_tail_preserved():
    M = 16
    C = (1 << M) - (1 << 12) - 1  # big identity tail
    a = 1234577 % C
    assert math.gcd(a, C) == 1
    a_inv = pow(a, -1, C)
    plan = plan_stride_permute(C, a_inv, M)
    assert plan is not None
    x = np.arange(2 * (1 << M), dtype=np.float32).reshape(2, -1)
    got = np.asarray(apply_stride_permute(jnp.asarray(x), plan))
    np.testing.assert_array_equal(got[:, C:], x[:, C:])
    np.testing.assert_array_equal(got, _ref_permute(x, C, a_inv, M))


def test_bf16_and_flat_shapes():
    M = 14
    C = (1 << M) - 3
    a_inv = pow(5, -1, C)
    plan = plan_stride_permute(C, a_inv, M)
    if plan is None:
        pytest.skip("below slice-width floor")
    rng = np.random.default_rng(9)
    x = rng.standard_normal((1 << M,)).astype(np.float32)
    want = _ref_permute(x, C, a_inv, M)
    got32 = np.asarray(apply_stride_permute(jnp.asarray(x), plan))
    np.testing.assert_array_equal(got32, want)
    xb = jnp.asarray(x).astype(jnp.bfloat16)
    gotb = np.asarray(apply_stride_permute(xb, plan).astype(jnp.float32))
    np.testing.assert_array_equal(
        gotb, np.asarray(xb.astype(jnp.float32))[..., np.asarray(
            modmul_inverse_permutation(C, pow(a_inv, -1, C), M))]
    )


@pytest.mark.parametrize("M", [14, 16])
def test_fuzz_parity_kernel_path(M, monkeypatch):
    """The TPU realization — Pallas chunk-gather legs over padded tiled
    transposes — forced on CPU via QC_MODPERM_KERNEL=1 (interpret mode).
    Walks multipliers until several genuinely plan (small M refuses
    most); parity must be exact through the padded layouts and the blend
    kernel's offset contract."""
    monkeypatch.setenv("QC_MODPERM_KERNEL", "1")
    C = (1 << M) - 3
    planned = 0
    for a in range(3, 4000, 2):
        if math.gcd(a, C) != 1:
            continue
        a_inv = pow(a, -1, C)
        if a_inv <= 1:
            continue
        planned += _check(C, a_inv, M, require_plan=False)
        if planned >= 3:
            break
    assert planned >= 3  # the kernel path must actually be exercised


def test_deal_leg_kernel_junk_lane_view(monkeypatch):
    """The kernel deal leg's PAD-FREE overlapping row view (round 5):
    each w2 row carries LANE junk lanes in front of its data so the wrap
    slice start (LANE + t2)*pitch - istar stays in bounds at t2 = 0 —
    the chunk straddling C always has t2 = 0 (m = u-1 there), and its
    wrap lanes are all >= C, so junk must flow only into discarded
    output.  Direct _deal_leg parity against the element map, forced
    through the kernel path, at shapes where C % W != 0 and the plan
    window guarantees u >= LANE."""
    monkeypatch.setenv("QC_MODPERM_KERNEL", "1")
    from quantumcomputer_tpu.ops.modperm import _deal_leg

    for M, C, u, W in (
        (16, 65533, 509, 128),    # C prime-ish, straddling chunk wrap
        (16, 65280, 131, 256),    # C % W == 0: no straddle, tail exact
        (17, 131063, 257, 256),   # wider rows, odd u
        (15, 32765, 129, 128),    # smallest kernel-legal u
    ):
        assert u >= 128 and W * u <= C <= (1 << M)
        rng = np.random.default_rng(u)
        x = rng.standard_normal((2, 1 << M)).astype(np.float32)
        got = np.asarray(_deal_leg(jnp.asarray(x), C, u, M, W))
        j = np.arange(1 << M)
        src = np.where(j < C, (u * j) % C, j)
        np.testing.assert_array_equal(got, x[:, src], err_msg=f"u={u} C={C}")
    """Collect rows wider than the VMEM cap split into Wc-wide chunks;
    shrink the cap so the split path runs at test scale.

    Sweeps ALL planning multipliers until the set includes a padded row
    width Qpr NOT divisible by the cap — the round-4 regression class:
    the shipped code recomputed Wc = min(Qpr, cap) after the split had
    chosen _ROW_SPLIT_W, so K = Qpr // Wc floored and the reshape threw
    (BENCH_r04's M=28 v=1543 Qpr=196608 TypeError; at this scale the
    v=43, Qpv=381 -> Qpr=384 candidate reproduces it).  Round 4's
    version stopped at the FIRST candidate, whose Qpr=512 happened to
    divide the clobbered width."""
    from quantumcomputer_tpu.ops import modperm

    monkeypatch.setenv("QC_MODPERM_KERNEL", "1")
    monkeypatch.setattr(modperm, "_ROW_W_CAP", 256)
    monkeypatch.setattr(modperm, "_ROW_SPLIT_W", 128)
    M = 14
    C = (1 << M) - 3
    split_plans = nondivisible = 0
    for a in range(3, 4000, 2):
        if math.gcd(a, C) != 1:
            continue
        a_inv = pow(a, -1, C)
        plan = plan_stride_permute(C, a_inv, M)
        if plan is None or plan.v <= 1:
            continue
        Qpr_unsplit = -((-((C - 1) // plan.v + 1)) // 128) * 128
        if Qpr_unsplit <= 256:
            continue  # no split at this cap
        split_plans += 1
        if Qpr_unsplit % 256 != 0:
            nondivisible += 1
        _check(C, a_inv, M, require_plan=True)
        if split_plans >= 8 and nondivisible >= 1:
            break
    assert split_plans >= 6, (split_plans, nondivisible)
    assert nondivisible >= 1, "sweep never hit the non-divisible-Qpr class"


def test_collect_chunking_invariants(monkeypatch):
    """The collect-leg chunking triple has ONE source of truth
    (modperm.collect_chunking); its invariants hold over the (C, v)
    space in both split and non-split regimes."""
    from quantumcomputer_tpu.ops import modperm

    monkeypatch.setattr(modperm, "_ROW_W_CAP", 256)
    monkeypatch.setattr(modperm, "_ROW_SPLIT_W", 128)
    rng = np.random.default_rng(5)
    for _ in range(500):
        C = int(rng.integers(1 << 10, 1 << 20)) | 1
        v = int(rng.integers(1, 2048))
        Qpv = (C - 1) // v + 1
        for use_kernel in (False, True):
            Wc, Qpr, K = modperm.collect_chunking(C, v, use_kernel)
            assert Qpr % Wc == 0 and K * Wc == Qpr
            assert Qpr >= Qpv and Qpr % 128 == 0
            assert Qpr - Qpv < max(Wc, 128)
            if use_kernel and -(-Qpv // 128) * 128 > 256:
                assert Wc == 128 and K == Qpr // 128
            else:
                assert K == 1 and Wc == Qpr


def test_collect_chunking_bench_r04_row():
    """Production caps, the exact BENCH_r04 crash configuration:
    M=28, C=2^28-3, v=1543 — padded row width > cap and not a multiple
    of it.  The pre-fix code computed K = Qpr // min(Qpr, cap) = 1 here
    and threw reshaping (1, 1543, 131072) -> (1, 1543, 196608)."""
    from quantumcomputer_tpu.ops.modperm import collect_chunking

    C, v = (1 << 28) - 3, 1543
    Wc, Qpr, K = collect_chunking(C, v, True)
    Qpv = (C - 1) // v + 1
    # Adaptive halving picks the candidate minimizing the Qpv roundup:
    # 4096 rounds 173970 to 176128 (+1.2%) vs 32768's 196608 (+13%).
    assert Wc == 4096 and Qpr == 176128
    assert Qpr == -(-Qpv // Wc) * Wc == K * Wc and K > 1
    assert Qpr % 131072 != 0  # the class round 4's test never reached


def test_row_compact_exact_rows_last_chunk():
    """ADVICE r4 (high): when Qpv is an exact multiple of 128 (rows ==
    Qpv, zero pad rows) a last-row chunk with t0 > vpad - Wt had its
    straight-slice start clamp-SHIFTED, silently corrupting live output
    positions < C.  v=899, rows=128: the chunk at f0=114688 has q0=127,
    t0=515 > vpad - Wt = 128 — pre-fix, lanes 0..383 of that chunk (all
    live) read from the wrong offset."""
    from quantumcomputer_tpu.ops.modperm import _row_compact

    v, rows, dim = 899, 128, 1 << 17
    vpad = 1024
    # One slack row past the live region, NaN-filled: _row_compact's
    # contract (production: _tr extra_rows, contents undefined) — the
    # kernel may read it only into lanes the blend discards.
    w2 = np.full((1, rows + 1, vpad), np.nan, np.float32)
    w2[0, :rows] = -1.0
    q = np.arange(rows)[:, None]
    t = np.arange(v)[None, :]
    w2[0, :rows, :v] = (q * v + t).astype(np.float32)
    flat = np.asarray(_row_compact(jnp.asarray(w2), v, dim))
    live = rows * v  # 115072: every position below is real data
    np.testing.assert_array_equal(
        flat[0, :live], np.arange(live, dtype=np.float32)
    )
