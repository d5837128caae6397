"""Dense 2-qubit gates in the fused Pallas path (VERDICT r2 item 4).

The "u2q" op kind covers cnot/swap/generic 4x4 unitaries for every
qubit-class pair — lane (q<=6), row (7..12), axis (>=13) — so generic
circuits neither break fusion runs nor drop to the XLA 4-roll path.
Differential oracle: ops/gates.apply_2q (itself parity-tested against the
NumPy reference).  Reference 2q construction: qc_shor.c:513-565.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quantumcomputer_tpu.models.circuit as cir
from quantumcomputer_tpu.models.circuit import Gate
from quantumcomputer_tpu.ops import pallas_fused as pf
from quantumcomputer_tpu.sim.engine import Register, StateVectorEngine

from conftest import random_state


def _rand_u4(rng):
    m = rng.standard_normal((4, 4)) + 1j * rng.standard_normal((4, 4))
    return np.linalg.qr(m)[0]


def _run(circ, n, backend, psi):
    eng = StateVectorEngine(Register(L=n, M=0), dtype=jnp.complex64, backend=backend)
    s0 = jnp.stack([jnp.asarray(psi.real, jnp.float32), jnp.asarray(psi.imag, jnp.float32)])
    out = eng.run(circ, s0)
    return np.asarray(out[0]) + 1j * np.asarray(out[1])


# Qubit-class pairs at n=15: lane (0..6), row (7..12), axis (13, 14).
PAIRS = [
    (5, 2),    # lane/lane
    (9, 3),    # row/lane
    (11, 8),   # row/row
    (13, 4),   # axis/lane
    (14, 10),  # axis/row
    (14, 13),  # axis/axis
]


@pytest.mark.parametrize("q_hi,q_lo", PAIRS)
@pytest.mark.parametrize("kind", ["u2q", "cnot", "swap"])
def test_u2q_all_class_pairs_vs_xla(q_hi, q_lo, kind, rng):
    n = 15
    if kind == "u2q":
        g = cir.U2Q(q_hi, q_lo, _rand_u4(rng))
    elif kind == "cnot":
        g = cir.CNOT(q_hi, q_lo)
    else:
        g = cir.SWAP(q_hi, q_lo)
    psi = random_state(n, rng)
    got = _run((g,), n, "pallas", psi)
    want = _run((g,), n, "xla", psi)
    np.testing.assert_allclose(got, want, atol=2e-6)


@pytest.mark.parametrize("q_hi,q_lo", [(4, 1), (12, 7)])
def test_u2q_low_high_qubit_order(q_hi, q_lo, rng):
    """Gates listing qubits low-before-high relabel the 4x4 correctly."""
    n = 14
    m = _rand_u4(rng)
    psi = random_state(n, rng)
    got = _run((cir.U2Q(q_lo, q_hi, m),), n, "pallas", psi)
    want = _run((cir.U2Q(q_lo, q_hi, m),), n, "xla", psi)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_u2q_does_not_break_fusion_runs(rng):
    """A dense mix with 2q gates plans as ONE fused segment (no 'single'
    fallback segments), and lane/lane + row/row pairs compose into the
    MXU matmul groups."""
    n = 15
    circ = (
        cir.H(14), cir.RY(13, 0.3),
        cir.CNOT(5, 2),        # lane/lane -> lanemat-eligible
        cir.SWAP(11, 8),       # row/row -> rowmat-eligible
        cir.U2Q(14, 10, _rand_u4(rng)),  # axis/row
        cir.H(3), cir.RZ(9, 0.4),
    )
    segs = pf.plan_circuit(circ, n, 0)
    assert [s[0] for s in segs] == ["fused"], segs
    ops = segs[0][1]
    # lane/lane and row/row u2q became part of matmul groups at apply time;
    # at plan time they are u2q ops inside the single run.
    assert any(op[0] == "u2q" for op in ops)
    psi = random_state(n, rng)
    got = _run(circ, n, "pallas", psi)
    want = _run(circ, n, "xla", psi)
    np.testing.assert_allclose(got, want, atol=2e-6)


def test_u2q_lane_pair_composes_into_lanemat(rng):
    """Two lane-class 1q ops + a lane/lane 2q compose into one lanemat."""
    ops = tuple(
        pf.gate_to_op(g, 0)
        for g in (cir.RY(2, 0.3), cir.CNOT(5, 1), cir.RX(6, 0.7))
    )
    grouped, mats = pf.matmul_group_ops(ops, 0)
    assert [op[0] for op in grouped] == ["lanemat"]
    assert len(mats) == 1
    # The composed 128x128 operator equals the dense product.
    w = (
        pf._expand_1q(np.asarray(pf._op_matrix_2x2(ops[2])), 6, 7)
        @ pf._expand_2q(np.array(ops[1][3][:16]).reshape(4, 4), 5, 1, 7)
        @ pf._expand_1q(np.asarray(pf._op_matrix_2x2(ops[0])), 2, 7)
    )
    got = mats[0][0] + 1j * mats[0][1]  # stored transposed
    np.testing.assert_allclose(got.T, w, atol=1e-6)


def test_u2q_in_sharded_local_path(rng):
    """Shard-local dense 2q gates route through the fused kernel inside
    shard_map (no fusion break, parity vs single chip)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from quantumcomputer_tpu.parallel.mesh import build_mesh
    from quantumcomputer_tpu.parallel.sharded import ShardedStateVectorEngine

    n = 16
    d = 2
    circ = (
        cir.H(15),                      # global
        cir.CNOT(13, 2),                # local axis/lane
        cir.U2Q(11, 7, _rand_u4(rng)),  # local row/row
        cir.H(3),
    )
    single = StateVectorEngine(Register(L=n, M=0), dtype=jnp.complex64, backend="pallas")
    mesh = build_mesh(num_devices=1 << d)
    multi = ShardedStateVectorEngine(
        Register(L=n, M=0), dtype=jnp.complex64, mesh=mesh, backend="pallas"
    )
    psi = random_state(n, rng)
    s0 = jnp.stack([jnp.asarray(psi.real, jnp.float32), jnp.asarray(psi.imag, jnp.float32)])
    a = single.to_numpy(single.run(circ, s0 + 0))
    b = multi.to_numpy(multi.run(circ, jax.device_put(s0, multi.sharding)))
    np.testing.assert_allclose(a, b, atol=2e-6)


def test_u2q_complex32_storage(rng):
    """bf16-storage planes run the u2q kernel (f32 in-VMEM compute)."""
    n = 14
    circ = (cir.CNOT(13, 2), cir.U2Q(9, 4, _rand_u4(rng)), cir.SWAP(6, 1))
    e64 = StateVectorEngine(Register(L=n, M=0), dtype=jnp.complex64, backend="pallas")
    e32 = StateVectorEngine(Register(L=n, M=0), dtype="complex32", backend="pallas")
    psi = random_state(n, rng)
    s64 = jnp.stack([jnp.asarray(psi.real, jnp.float32), jnp.asarray(psi.imag, jnp.float32)])
    s32 = jnp.stack([jnp.asarray(psi.real, jnp.bfloat16), jnp.asarray(psi.imag, jnp.bfloat16)])
    a = e64.to_numpy(e64.run(circ, s64))
    b = e32.to_numpy(e32.run(circ, s32))
    assert np.abs(a - b).max() < 2e-2  # bf16 input rounding dominates
