"""M-high physical layout: the Shor circuit with the work register in the
top physical bits (row-gather oracle, low-qubit iQFT).  Amplitudes must be
the standard-layout amplitudes under the bit permutation, and the driver
must produce identical measurement statistics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantumcomputer_tpu.algorithms.shor import shors_algorithm
from quantumcomputer_tpu.models.shor_circuit import shor_circuit_mhigh
from quantumcomputer_tpu.ops import gates as xops
from quantumcomputer_tpu.sim import reference as ref
from quantumcomputer_tpu.sim.engine import Register, StateVectorEngine
from tests.conftest import random_state


def physical_of_logical(idx: int, L: int, M: int) -> int:
    """Inverse of engine.logical_index: logical bit b<M -> physical L+b;
    logical bit b>=M -> physical b-M."""
    m_part = idx & ((1 << M) - 1)
    l_part = idx >> M
    return (m_part << L) | l_part


@pytest.mark.parametrize("C,a,L,M", [(15, 7, 3, 4), (21, 2, 4, 5), (33, 7, 5, 6)])
def test_mhigh_circuit_amplitude_parity(C, a, L, M):
    n = L + M
    want = ref.shor_circuit(C, a, L, M)  # logical (standard) amplitudes
    eng = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex128, layout="m_high")
    got_phys = eng.to_numpy(eng.run(shor_circuit_mhigh(C, a, L, M)))
    # permute physical -> logical and compare
    got = np.empty_like(got_phys)
    for p in range(1 << n):
        got[eng.logical_index(p)] = got_phys[p]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_camodc_high_matches_standard(rng):
    C, A, M = 21, 4, 5
    L = 4
    n = L + M
    psi = random_state(n, rng)  # treat as PHYSICAL m-high state
    got = np.asarray(xops.apply_camodc_high(jnp.asarray(psi), C, A, c_phys=2, M=M))
    # Build the logical-space equivalent: physical p = (m << L) | l_bits,
    # control physical bit 2 == logical qubit M+2.
    psi_logical = np.empty_like(psi)
    for p in range(1 << n):
        m_part = p >> L
        l_part = p & ((1 << L) - 1)
        psi_logical[m_part | (l_part << M)] = psi[p]
    want_logical = ref.apply_c_amodc(psi_logical, C, A, c_q=M + 2, M=M)
    want = np.empty_like(psi)
    for p in range(1 << n):
        m_part = p >> L
        l_part = p & ((1 << L) - 1)
        want[p] = want_logical[m_part | (l_part << M)]
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_mhigh_driver_end_to_end():
    res = shors_algorithm(C=15, L=3, M=4, forced_trial_int=7, seed=0, dtype=jnp.complex128, layout="m_high")
    assert res.ok and res.factors == (5, 3)
    # Same seed, same measured LOGICAL index as the standard layout? The
    # physical probability ordering differs, so indices may differ — but the
    # omega statistics and factors must match.
    res_std = shors_algorithm(C=15, L=3, M=4, forced_trial_int=7, seed=0, dtype=jnp.complex128)
    assert res_std.factors == res.factors


def test_mhigh_omega_distribution():
    # The omega distribution must be identical to the standard layout's
    # (uniform over the period-4 harmonics for C=15, a=7).
    C, a, L, M = 15, 7, 3, 4
    from quantumcomputer_tpu.algorithms.shor import read_omega

    eng = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex128, layout="m_high")
    state = eng.run(shor_circuit_mhigh(C, a, L, M))
    probs = np.asarray(eng.probabilities(state))
    omega_prob: dict[float, float] = {}
    for p, pr in enumerate(probs):
        if pr > 1e-15:
            w = read_omega(eng.logical_index(p), L, M)
            omega_prob[w] = omega_prob.get(w, 0.0) + float(pr)
    assert set(omega_prob) == {0.0, 0.25, 0.5, 0.75}
    for w, pr in omega_prob.items():
        assert abs(pr - 0.25) < 1e-12


def test_mhigh_pallas_backend(rng):
    # n=15 through the fused pallas path in the m-high layout.
    C, a, L, M = 33, 7, 9, 6
    want = ref.shor_circuit(C, a, L, M)
    eng = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex64, backend="pallas", layout="m_high")
    got_phys = eng.to_numpy(eng.run(shor_circuit_mhigh(C, a, L, M)))
    got = np.empty_like(got_phys)
    idx = np.arange(1 << (L + M))
    logical = (idx >> L) | ((idx & ((1 << L) - 1)) << M)
    got[logical] = got_phys
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_mhigh_on_mesh_factors():
    """m_high + mesh is supported since round 2 (sharded row-exchange
    oracle); the driver must factor correctly through it."""
    from quantumcomputer_tpu.parallel.mesh import build_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    res = shors_algorithm(
        C=15, L=3, M=4, forced_trial_int=7, seed=0,
        dtype=jnp.complex128, mesh=build_mesh(num_devices=2), layout="m_high",
    )
    assert res.ok and res.factors == (5, 3)


@pytest.mark.parametrize("c_phys", [0, 3, 6, 9, 10])
def test_pallas_dma_oracle_matches_xla(c_phys, rng):
    """The manual-DMA row-gather kernel (interpret mode) vs apply_camodc_high,
    covering both pure-block (control stride >= 1024) and mixed-block paths."""
    import jax.numpy as jnp
    from quantumcomputer_tpu.ops import pallas_oracle

    C, A, M = 33, 29, 6
    L = 11
    n = L + M  # rest = 2048 columns, rows = 64
    psi = random_state(n, rng)
    re = jnp.asarray(psi.real, jnp.float32)
    im = jnp.asarray(psi.imag, jnp.float32)
    ore, oim = pallas_oracle.apply_camodc_high_planar(re, im, C, A, c_phys, M)
    got = np.asarray(ore) + 1j * np.asarray(oim)
    want = np.asarray(xops.apply_camodc_high(jnp.asarray(psi), C, A, c_phys, M))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_mhigh_pallas_engine_uses_dma_oracle(rng):
    # Full m-high Shor through the pallas engine (DMA oracle in dispatch).
    C, a, L, M = 33, 7, 9, 6  # rows=64, rest=512
    from quantumcomputer_tpu.models.shor_circuit import shor_circuit_mhigh

    want = ref.shor_circuit(C, a, L, M)
    eng = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex64, backend="pallas", layout="m_high")
    got_phys = eng.to_numpy(eng.run(shor_circuit_mhigh(C, a, L, M)))
    idx = np.arange(1 << (L + M))
    logical = (idx >> L) | ((idx & ((1 << L) - 1)) << M)
    got = np.empty_like(got_phys)
    got[logical] = got_phys
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("c_phys,n_minus_m", [(13, 14), (13, 16), (14, 15), (15, 16)])
def test_pallas_perm_oracle_matches_xla(c_phys, n_minus_m, rng):
    """Half-traffic pure-permutation kernel (control==1 blocks only, in
    place) vs apply_camodc_high, across block widths 64..128."""
    import jax.numpy as jnp
    from quantumcomputer_tpu.ops import pallas_oracle

    C, A, M = 33, 29, 6
    n = n_minus_m + M
    assert pallas_oracle.perm_supported(c_phys, M, n)
    psi = random_state(n, rng)
    re = jnp.asarray(psi.real, jnp.float32)
    im = jnp.asarray(psi.imag, jnp.float32)
    ore, oim = pallas_oracle.apply_camodc_high_perm_planar(re, im, C, A, c_phys, M)
    got = np.asarray(ore) + 1j * np.asarray(oim)
    want = np.asarray(xops.apply_camodc_high(jnp.asarray(psi), C, A, c_phys, M))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_perm_oracle_dispatch_threshold():
    """try_apply_gate routes c>=13 to the perm kernel, lower controls to the
    full cycle kernel (both differential-tested above)."""
    from quantumcomputer_tpu.ops import pallas_oracle

    assert not pallas_oracle.perm_supported(12, 6, 20)
    assert pallas_oracle.perm_supported(13, 6, 20)
    assert not pallas_oracle.perm_supported(13, 6, 18)  # rest too small


@pytest.mark.parametrize("ca,cb,n_minus_m", [(13, 14, 15), (13, 16, 17), (14, 15, 16)])
def test_pallas_pair_oracle_matches_sequential(ca, cb, n_minus_m, rng):
    """In-place masked K=2 pair kernel (0.75R+0.75W: mask==0 blocks never
    move) vs two sequential XLA oracle applies."""
    from quantumcomputer_tpu.ops import pallas_oracle

    C, M = 33, 6
    A1, A2 = 29, 7
    n = n_minus_m + M
    assert pallas_oracle.pair_inplace_supported((ca, cb), M, n)
    psi = random_state(n, rng)
    re = jnp.asarray(psi.real, jnp.float32)
    im = jnp.asarray(psi.imag, jnp.float32)
    ore, oim = pallas_oracle.apply_camodc_pair_inplace_planar(re, im, C, (A1, A2), (ca, cb), M)
    got = np.asarray(ore) + 1j * np.asarray(oim)
    want = xops.apply_camodc_high(jnp.asarray(psi), C, A1, ca, M)
    want = np.asarray(xops.apply_camodc_high(want, C, A2, cb, M))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_engine_pairs_oracles_at_memory_ceiling(rng, monkeypatch):
    """When the out-of-place ladder kernel does not fit (two state buffers),
    the planner fuses eligible high-control oracle runs into K=2 in-place
    pairs instead; full-circuit parity vs the XLA backend."""
    import quantumcomputer_tpu.sim.engine as eng_mod
    from quantumcomputer_tpu.models.circuit import Gate

    C, M = 33, 6
    L = 15
    n = L + M
    # Force the "ladder does not fit" branch at this small n.
    monkeypatch.setenv("QC_TPU_HBM_BYTES", "1")
    circ = tuple(
        Gate("camodc_high", (c,), meta=(C, pow(29, 1 + (c % 3), C), M)) for c in (13, 14, 12, 11)
    )
    fused = eng_mod.fuse_oracle_ladders(
        circ, 0,
        eligible=lambda g: g.qubits[0] >= 13, max_run=2,
    )
    assert [g.name for g in fused] == ["camodc_ladder_high", "camodc_high", "camodc_high"]
    e_pal = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex64, backend="pallas", layout="m_high")
    e_xla = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex64, backend="xla", layout="m_high")
    psi = random_state(n, rng)
    s0 = jnp.stack([jnp.asarray(psi.real, jnp.float32), jnp.asarray(psi.imag, jnp.float32)])
    got = e_pal.run(circ, s0 + 0)
    want = e_xla.run(circ, s0 + 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pair_member_threshold_bytes():
    from quantumcomputer_tpu.ops import pallas_oracle

    assert pallas_oracle.pair_member_supported(13, 6, 21, itemsize=4)
    assert not pallas_oracle.pair_member_supported(12, 6, 21, itemsize=4)
    assert not pallas_oracle.pair_member_supported(13, 6, 21, itemsize=2)
    assert pallas_oracle.pair_member_supported(14, 6, 22, itemsize=2)
    assert not pallas_oracle.pair_inplace_supported((13, 13), 6, 21)  # distinct controls


def test_pallas_perm_and_pair_oracle_bf16(rng):
    """bf16 planes through the in-place masked kernels (perm single +
    K=2 pair): pure data movement, so bf16 must be EXACT vs the f32
    result rounded to bf16."""
    from quantumcomputer_tpu.ops import pallas_oracle

    C, M = 33, 6
    n = 17 + M  # rest = 2^17: bf16 perm threshold needs c >= 14
    psi = random_state(n, rng)
    re32 = jnp.asarray(psi.real, jnp.float32)
    im32 = jnp.asarray(psi.imag, jnp.float32)
    re16 = re32.astype(jnp.bfloat16)
    im16 = im32.astype(jnp.bfloat16)

    assert pallas_oracle.perm_supported(14, M, n, itemsize=2)
    o16 = pallas_oracle.apply_camodc_high_perm_planar(re16, im16, C, 29, 14, M)
    want = xops.apply_camodc_high(
        jnp.asarray(np.asarray(re16.astype(jnp.float32)) + 1j * np.asarray(im16.astype(jnp.float32))),
        C, 29, 14, M,
    )
    got = np.asarray(o16[0].astype(jnp.float32)) + 1j * np.asarray(o16[1].astype(jnp.float32))
    np.testing.assert_array_equal(got, np.asarray(want))

    assert pallas_oracle.pair_inplace_supported((14, 15), M, n, itemsize=2)
    p16 = pallas_oracle.apply_camodc_pair_inplace_planar(re16, im16, C, (29, 7), (14, 15), M)
    want2 = xops.apply_camodc_high(jnp.asarray(np.asarray(want)), C, 7, 15, M)
    got2 = np.asarray(p16[0].astype(jnp.float32)) + 1j * np.asarray(p16[1].astype(jnp.float32))
    np.testing.assert_array_equal(got2, np.asarray(want2))
