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


def test_batched_sample_indices(rng):
    """Batched hierarchical sampling: same distribution as the flat scan,
    no full-state cumsum.  Concentrated state must dominate the draws."""
    dim = 1 << N
    psi = np.full(dim, np.sqrt(0.05 / (dim - 1)), dtype=np.complex128)
    psi[4242] = np.sqrt(0.95)
    planar = planar_of(psi)
    rs = jax.random.uniform(jax.random.PRNGKey(7), (500,), jnp.float32)
    idx = np.asarray(pm.sample_indices(planar, rs))
    assert idx.shape == (500,)
    assert (idx == 4242).mean() > 0.9
    assert ((idx >= 0) & (idx < dim)).all()


def test_engine_sample_hierarchical(rng):
    """engine.sample at n=17/f32 routes through the batched pallas path and
    matches the flat-scan statistics."""
    from quantumcomputer_tpu.sim.engine import Register, StateVectorEngine

    psi = random_state(N, rng)
    eng = StateVectorEngine(Register(L=N, M=0), dtype=jnp.complex64)
    state = planar_of(psi)
    idx = np.asarray(eng.sample(state, jax.random.PRNGKey(3), 256))
    assert idx.shape == (256,)
    # empirical mean probability of sampled indices should be far above
    # uniform (sampling weights by |amp|^2)
    probs = np.abs(psi) ** 2
    assert probs[idx].mean() > probs.mean()


def test_engine_measure_uses_hierarchical_path(rng):
    # f32 state at n=17 routes through the pallas reduction inside the
    # jitted measure program; collapse must still be a valid one-hot.
    psi = random_state(N, rng)
    planar = planar_of(psi)
    idx, collapsed = jax.jit(_measure_planar_impl)(planar, jax.random.PRNGKey(3))
    c = np.asarray(collapsed)
    assert c[0].sum() == 1.0 and c[0][int(idx)] == 1.0 and c[1].sum() == 0.0


def test_block_sums_inner_accumulation(rng, monkeypatch):
    """Large-state geometry (nblocks capped, inner accumulation grid) scaled
    down: block_rows > TILE_ROWS forces the multi-tile accumulation path."""
    monkeypatch.setattr(pm, "MAX_BLOCKS", 4)
    monkeypatch.setattr(pm, "TILE_ROWS", 16)
    psi = random_state(N, rng)
    planar = planar_of(psi)
    block_rows, block = pm._block_geom(1 << N)
    assert block_rows == (1 << N) // pm.LANE // 4 and block_rows > 16
    sums = np.asarray(pm.block_prob_sums(planar))
    want = (np.abs(psi) ** 2).reshape(-1, block).sum(axis=1)
    assert sums.shape == (4,)
    np.testing.assert_allclose(sums, want, atol=1e-6)


def test_block_geom_large_states():
    """At the n=30 memory ceiling the reduction output must fit SMEM
    (<= MAX_BLOCKS scalars) and tiles must stay VMEM-sized."""
    for n in (16, 24, 29, 30):
        block_rows, block = pm._block_geom(1 << n)
        rows = (1 << n) // pm.LANE
        assert rows % block_rows == 0
        assert rows // block_rows <= max(pm.MAX_BLOCKS, rows // pm.BLOCK_ROWS)
        if rows // pm.BLOCK_ROWS > pm.MAX_BLOCKS:
            assert rows // block_rows == pm.MAX_BLOCKS


def test_single_and_batch_samplers_agree_unnormalized():
    """sample_index_planes scales its draw by the total like the batched
    sampler: on an UNNORMALIZED state (bf16-style drift, total < 1) a
    near-1 draw must not fall through to the last basis index."""
    dim = 1 << 16
    re = np.zeros(dim, np.float32)
    re[5] = np.sqrt(0.5)
    re[dim // 2] = np.sqrt(0.4)  # total 0.9 < 1
    im = np.zeros(dim, np.float32)
    rej, imj = jnp.asarray(re), jnp.asarray(im)
    r = jnp.asarray(0.97, jnp.float32)  # in (total, 1): old code -> dim-1
    single = int(pm.sample_index_planes(rej, imj, r))
    batch = int(pm.sample_indices_planes(rej, imj, jnp.asarray([0.97], jnp.float32))[0])
    assert single == batch == dim // 2


def test_flat_sampler_scales_by_total():
    """The flat (small-dim) engine sampler scales its draw by the total
    probability like the hierarchical one: a norm-deficient bf16 state
    must never route the deficit to the last basis index."""
    import ml_dtypes

    dim = 1 << 10
    re = np.zeros(dim, np.float32)
    re[5] = 0.996  # bf16 rounds |amp|^2 total below 1
    planes = jnp.asarray(np.stack([re, np.zeros(dim, np.float32)])).astype(ml_dtypes.bfloat16)
    eng = StateVectorEngine(Register(L=10, M=0), dtype="complex32", backend="pallas")
    for seed in range(8):
        idx, _ = eng.measure(planes + 0, jax.random.PRNGKey(seed))
        assert int(idx) == 5
    shots = np.asarray(eng.sample(planes, jax.random.PRNGKey(1), 64))
    assert (shots == 5).all()
