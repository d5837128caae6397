"""Pallas measurement reduction (interpret mode): block sums + hierarchical
inverse-CDF sampling vs the flat reference scan."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantumcomputer_tpu.ops import pallas_measure as pm
from quantumcomputer_tpu.sim import reference as ref
from quantumcomputer_tpu.sim import statevec as sv
from quantumcomputer_tpu.sim.engine import Register, StateVectorEngine, _measure_planar_impl
from tests.conftest import random_state

N = 17  # dim 131072 = 16 blocks


def planar_of(psi):
    return sv.from_numpy_complex(psi, jnp.float32)


def test_block_sums(rng):
    psi = random_state(N, rng)
    planar = planar_of(psi)
    sums = np.asarray(pm.block_prob_sums(planar))
    want = (np.abs(psi) ** 2).reshape(-1, pm.BLOCK).sum(axis=1)
    np.testing.assert_allclose(sums, want, atol=1e-6)
    assert abs(sums.sum() - 1.0) < 1e-5


def test_hierarchical_sample_matches_flat(rng):
    psi = random_state(N, rng)
    planar = planar_of(psi)
    probs64 = np.abs(psi) ** 2
    for r in (0.0, 0.1, 0.31, 0.5, 0.77, 0.999, 1.5):
        got = int(pm.sample_index(planar, jnp.float32(r)))
        want = ref.measure_index(psi, r)
        # f32 partial sums can disagree with the f64 scan only by a
        # knife-edge index; accept an index whose cumulative neighborhood
        # brackets r within f32 rounding.
        if got != want:
            cum = np.cumsum(probs64)
            lo = cum[got - 1] if got > 0 else 0.0
            hi = cum[got]
            assert lo - 1e-5 <= min(r, cum[-1]) <= hi + 1e-5, (r, got, want)


def test_sampling_distribution(rng):
    # Concentrated state: index 777 carries 97% probability; sampling must
    # hit it for draws inside its cumulative band.
    dim = 1 << N
    psi = np.full(dim, np.sqrt(0.03 / (dim - 1)), dtype=np.complex128)
    psi[777] = np.sqrt(0.97)
    planar = planar_of(psi)
    hits = 0
    for seed in range(20):
        r = float(jax.random.uniform(jax.random.PRNGKey(seed)))
        idx = int(pm.sample_index(planar, jnp.float32(r)))
        hits += idx == 777
    assert hits >= 18


def test_engine_measure_uses_hierarchical_path(rng):
    # f32 state at n=17 routes through the pallas reduction inside the
    # jitted measure program; collapse must still be a valid one-hot.
    psi = random_state(N, rng)
    planar = planar_of(psi)
    idx, collapsed = jax.jit(_measure_planar_impl)(planar, jax.random.PRNGKey(3))
    c = np.asarray(collapsed)
    assert c[0].sum() == 1.0 and c[0][int(idx)] == 1.0 and c[1].sum() == 0.0
