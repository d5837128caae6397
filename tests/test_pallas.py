"""Pallas kernels (interpret mode on CPU) vs the XLA ops path.

Differential tests: the kernel backend must agree with the einsum/diagonal
backend to float-roundoff on random states — every target-qubit stride
class (in-row roll q<=9, pair-axis q>=10) and the fused iQFT stage."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantumcomputer_tpu.models import circuit as cir
from quantumcomputer_tpu.models.shor_circuit import shor_circuit
from quantumcomputer_tpu.ops import gates as xops
from quantumcomputer_tpu.ops import pallas_gates as pops
from quantumcomputer_tpu.sim import reference as ref
from quantumcomputer_tpu.sim.engine import Register, StateVectorEngine
from tests.conftest import random_state

N = 14  # exercises both kernel regimes (roll <= 9 < pair-axis)
ATOL = 2e-5  # f32 planes


def planar_f32(psi):
    return jnp.asarray(psi.real, jnp.float32), jnp.asarray(psi.imag, jnp.float32)


@pytest.mark.parametrize("q", [0, 1, 3, 6, 7, 9, 10, 12, 13])
def test_pallas_1q_hadamard_all_strides(q, rng):
    psi = random_state(N, rng)
    re, im = planar_f32(psi)
    u = np.array(ref.HADAMARD)
    ore, oim = pops.apply_1q_planar(re, im, u, q)
    want = ref.apply_hadamard(psi, q)
    got = np.asarray(ore) + 1j * np.asarray(oim)
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize("q", [2, 5, 8, 9, 10, 11])
def test_pallas_1q_complex_unitary(q, rng):
    psi = random_state(N, rng)
    re, im = planar_f32(psi)
    m = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
    u, _ = np.linalg.qr(m)
    ore, oim = pops.apply_1q_planar(re, im, u, q)
    want = ref.apply_1q(psi, u, q)
    got = np.asarray(ore) + 1j * np.asarray(oim)
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize("l,M", [(13, 4), (12, 0), (11, 10), (10, 9), (9, 2), (7, 3), (5, 0)])
def test_pallas_iqft_stage(l, M, rng):
    psi = random_state(N, rng)
    re, im = planar_f32(psi)
    ore, oim = pops.apply_iqft_stage_planar(re, im, l, M)
    want = np.asarray(ref.apply_hadamard(psi, l))
    for k in range(l - 1, M - 1, -1):
        want = ref.apply_c_phase(want, l, k, np.pi / (1 << (l - k)))
    got = np.asarray(ore) + 1j * np.asarray(oim)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_pallas_backend_full_circuit():
    """Engine backend='pallas' on a full Shor circuit vs the oracle.
    n=13 (C=33, L=7, M=6) exercises both kernel stride classes."""
    C, a, L, M = 33, 7, 7, 6
    eng = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex64, backend="pallas")
    got = eng.to_numpy(eng.run(shor_circuit(C, a, L, M)))
    want = ref.shor_circuit(C, a, L, M)
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert abs(np.sum(np.abs(got) ** 2) - 1) < 1e-4


def test_pallas_backend_matches_xla_backend(rng):
    C, a, L, M = 15, 7, 9, 4  # n=13
    circ = shor_circuit(C, a, L, M)
    e_x = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex64, backend="xla")
    e_p = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex64, backend="pallas")
    a_ = e_x.to_numpy(e_x.run(circ))
    b_ = e_p.to_numpy(e_p.run(circ))
    np.testing.assert_allclose(a_, b_, atol=1e-5)


def test_small_register_falls_back():
    # n=7 < pallas minimum: dispatch must silently use the XLA path.
    eng = StateVectorEngine(Register(L=3, M=4), dtype=jnp.complex64, backend="pallas")
    got = eng.to_numpy(eng.run(shor_circuit(15, 7, 3, 4)))
    want = ref.shor_circuit(15, 7, 3, 4)
    np.testing.assert_allclose(got, want, atol=5e-6)


def test_xla_wide_and_roll_paths_match_einsum(rng):
    """The layout-aware XLA forms (wide slice/concat, lane roll) must equal
    the einsum form on a large state."""
    psi = random_state(14, rng)  # dim 16384 >= _SMALL_DIM: wide/roll paths
    z = jnp.asarray(psi)
    m = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
    u, _ = np.linalg.qr(m)
    for q in (0, 3, 5, 6, 9, 13):
        got = np.asarray(xops.apply_1q(z, jnp.asarray(u), q))
        want = ref.apply_1q(psi, u, q)
        np.testing.assert_allclose(got, want, atol=1e-12, err_msg=f"q={q}")
    for l, M in ((13, 4), (9, 2), (6, 0)):
        got = np.asarray(xops.apply_iqft_stage(z, l, M))
        want = np.asarray(ref.apply_hadamard(psi, l))
        for k in range(l - 1, M - 1, -1):
            want = ref.apply_c_phase(want, l, k, np.pi / (1 << (l - k)))
        np.testing.assert_allclose(got, want, atol=1e-12, err_msg=f"l={l},M={M}")
