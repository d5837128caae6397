"""Checkpoint/resume: segment snapshots, fingerprint guard, sharded resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quantumcomputer_tpu.models.shor_circuit import shor_circuit
from quantumcomputer_tpu.parallel.mesh import build_mesh
from quantumcomputer_tpu.parallel.sharded import ShardedStateVectorEngine
from quantumcomputer_tpu.sim import checkpoint as ckpt
from quantumcomputer_tpu.sim import reference as ref
from quantumcomputer_tpu.sim.engine import Register, StateVectorEngine


def test_save_load_roundtrip(tmp_path):
    eng = StateVectorEngine(Register(L=3, M=4), dtype=jnp.complex128)
    state = eng.run(shor_circuit(15, 7, 3, 4))
    p = str(tmp_path / "snap.npz")
    ckpt.save_state(p, state, {"k": 1})
    loaded, meta = ckpt.load_state(p)
    assert meta == {"k": 1}
    np.testing.assert_allclose(np.asarray(loaded), np.asarray(state), atol=0)


def test_run_with_checkpoints_matches_direct(tmp_path):
    C, a, L, M = 21, 2, 4, 5
    circ = shor_circuit(C, a, L, M)
    eng = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex128)
    direct = eng.to_numpy(eng.run(circ))
    seg = eng.to_numpy(ckpt.run_with_checkpoints(eng, circ, str(tmp_path), segment_gates=3))
    np.testing.assert_allclose(seg, direct, atol=1e-13)
    # snapshots exist for each segment
    assert ckpt.latest_segment(str(tmp_path)) == -(-len(circ) // 3)


def test_resume_from_partial(tmp_path):
    C, a, L, M = 15, 7, 3, 4
    circ = shor_circuit(C, a, L, M)
    eng = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex128)
    # Full run writes all segments; drop the last two snapshots to simulate
    # preemption, then resume.
    ckpt.run_with_checkpoints(eng, circ, str(tmp_path), segment_gates=2)
    total = ckpt.latest_segment(str(tmp_path))
    for s in (total, total - 1):
        os.remove(str(tmp_path / f"segment_{s:05d}.npz"))
    resumed = eng.to_numpy(ckpt.run_with_checkpoints(eng, circ, str(tmp_path), segment_gates=2))
    want = ref.shor_circuit(C, a, L, M)
    np.testing.assert_allclose(resumed, want, atol=1e-12)


def test_fingerprint_guard(tmp_path):
    eng = StateVectorEngine(Register(L=3, M=4), dtype=jnp.complex128)
    circ1 = shor_circuit(15, 7, 3, 4)
    circ2 = shor_circuit(15, 13, 3, 4)
    ckpt.run_with_checkpoints(eng, circ1, str(tmp_path), segment_gates=2)
    # Resuming a DIFFERENT circuit must ignore the stale snapshots.
    out = eng.to_numpy(ckpt.run_with_checkpoints(eng, circ2, str(tmp_path), segment_gates=2))
    want = ref.shor_circuit(15, 13, 3, 4)
    np.testing.assert_allclose(out, want, atol=1e-12)


def test_segment_gates_mismatch_ignored(tmp_path):
    """A snapshot taken under a different segment_gates maps segment index
    to a different gate offset — resume must refuse it, not misapply it."""
    C, a, L, M = 15, 7, 3, 4
    circ = shor_circuit(C, a, L, M)
    eng = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex128)
    ckpt.run_with_checkpoints(eng, circ, str(tmp_path), segment_gates=2)
    # Drop the tail so resume would engage, then resume with a DIFFERENT
    # segmentation: the stale snapshots must be ignored (recompute from 0).
    total = ckpt.latest_segment(str(tmp_path))
    os.remove(str(tmp_path / f"segment_{total:05d}.npz"))
    out = eng.to_numpy(ckpt.run_with_checkpoints(eng, circ, str(tmp_path), segment_gates=3))
    want = ref.shor_circuit(C, a, L, M)
    np.testing.assert_allclose(out, want, atol=1e-12)


def test_resume_when_all_segments_done(tmp_path):
    """last == len(segments): the final snapshot is loaded and returned
    without recomputing anything."""
    C, a, L, M = 15, 7, 3, 4
    circ = shor_circuit(C, a, L, M)
    eng = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex128)
    ckpt.run_with_checkpoints(eng, circ, str(tmp_path), segment_gates=2)
    calls = []
    orig_run = eng.run
    eng.run = lambda *a, **k: (calls.append(1), orig_run(*a, **k))[1]
    out = eng.to_numpy(ckpt.run_with_checkpoints(eng, circ, str(tmp_path), segment_gates=2))
    assert calls == [], "fully-checkpointed run must not re-execute segments"
    want = ref.shor_circuit(C, a, L, M)
    np.testing.assert_allclose(out, want, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_checkpoint_roundtrip(tmp_path):
    C, a, L, M = 15, 7, 3, 4
    circ = shor_circuit(C, a, L, M)
    eng = ShardedStateVectorEngine(Register(L=L, M=M), dtype=jnp.complex128, mesh=build_mesh(num_devices=8))
    out = eng.to_numpy(ckpt.run_with_checkpoints(eng, circ, str(tmp_path), segment_gates=4))
    want = ref.shor_circuit(C, a, L, M)
    np.testing.assert_allclose(out, want, atol=1e-12)


def test_checkpoint_roundtrip_complex32(tmp_path):
    """bf16 planar snapshots save/load exactly (np.savez handles ml_dtypes
    bfloat16) and resume through run_with_checkpoints at complex32."""
    C, a, L, M = 33, 29, 8, 6
    from quantumcomputer_tpu.models.shor_circuit import shor_circuit_mhigh

    circ = shor_circuit_mhigh(C, a, L, M)
    eng = StateVectorEngine(Register(L=L, M=M), dtype="complex32", backend="pallas", layout="m_high")
    direct = eng.run(circ)
    p = str(tmp_path / "c32.npz")
    ckpt.save_state(p, direct, {"dtype": "complex32"})
    loaded, meta = ckpt.load_state(p)
    assert loaded.dtype == jnp.bfloat16 and meta["dtype"] == "complex32"
    np.testing.assert_array_equal(
        np.asarray(loaded.astype(jnp.float32)), np.asarray(direct.astype(jnp.float32))
    )
    out = ckpt.run_with_checkpoints(eng, circ, str(tmp_path / "segs"), segment_gates=7)
    np.testing.assert_allclose(
        np.asarray(out.astype(jnp.float32)),
        np.asarray(direct.astype(jnp.float32)),
        atol=2e-3,
    )
