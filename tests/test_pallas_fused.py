"""Fused multi-gate Pallas kernel (interpret mode) vs the CPU oracle.

The fused kernel must agree with gate-by-gate application for arbitrary
mixes of lane/row/axis butterflies and free-riding diagonals, and the
planner must respect the MAX_AXES budget and break on non-fusable gates."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from quantumcomputer_tpu.models import circuit as cir
from quantumcomputer_tpu.models.shor_circuit import shor_circuit
from quantumcomputer_tpu.ops import pallas_fused as pf
from quantumcomputer_tpu.sim import reference as ref
from quantumcomputer_tpu.sim.engine import Register, StateVectorEngine
from tests.conftest import random_state

N = 16  # lane (<=6), row (7..12), axis (>=13) classes all populated
ATOL = 3e-5


def run_fused(psi, gates, M=0):
    re = jnp.asarray(psi.real, jnp.float32)
    im = jnp.asarray(psi.imag, jnp.float32)
    segs = pf.plan_circuit(tuple(gates), N, M)
    assert all(s[0] == "fused" for s in segs), segs
    for _, ops, axes in segs:
        re, im = pf.apply_fused(re, im, ops, axes, N, M)
    return np.asarray(re) + 1j * np.asarray(im)


def apply_oracle(psi, gates, M=0):
    want = psi.copy()
    for g in gates:
        if g.name == "iqft_stage":
            l = g.qubits[0]
            want = ref.apply_hadamard(want, l)
            for k in range(l - 1, M - 1, -1):
                want = ref.apply_c_phase(want, l, k, math.pi / (1 << (l - k)))
        elif len(g.qubits) == 1:
            want = ref.apply_1q(want, cir.gate_matrix_1q(g), g.qubits[0])
        else:
            q_hi, q_lo = g.qubits if g.qubits[0] > g.qubits[1] else (g.qubits[1], g.qubits[0])
            want = ref.apply_2q(want, cir.gate_matrix_2q(cir.Gate(g.name, (q_hi, q_lo), g.params)), q_hi, q_lo)
        np_norm = np.sum(np.abs(want) ** 2)
        assert abs(np_norm - 1) < 1e-9
    return want


@pytest.mark.parametrize(
    "qubits",
    [
        (0, 3, 6),          # all lane
        (7, 9, 12),         # all row
        (13, 14, 15),       # all axis
        (2, 8, 13),         # one of each
        (15, 0, 10, 14, 5, 13),  # interleaved, axes out of order
    ],
)
def test_fused_hadamard_runs(qubits, rng):
    psi = random_state(N, rng)
    gates = [cir.H(q) for q in qubits]
    got = run_fused(psi, gates)
    want = apply_oracle(psi, gates)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_fused_dense_complex_unitaries(rng):
    psi = random_state(N, rng)
    gates = []
    for q in (1, 8, 13, 15, 4, 11):
        m = rng.standard_normal((2, 2)) + 1j * rng.standard_normal((2, 2))
        u, _ = np.linalg.qr(m)
        gates.append(cir.U1Q(q, u))
    got = run_fused(psi, gates)
    want = apply_oracle(psi, gates)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_fused_diagonal_free_riders(rng):
    psi = random_state(N, rng)
    gates = [
        cir.H(14),
        cir.PHASE(15, 0.37),      # gap/axis-adjacent diagonal, q >= 13 but NOT an axis
        cir.Z(3),                 # lane diagonal
        cir.RZ(9, 1.21),          # row diagonal
        cir.CPHASE(15, 2, 0.81),  # mixed high/lane
        cir.CPHASE(9, 8, 0.44),   # row/row
        cir.CZ(13, 12),           # axis(if exposed? 13 only exposed if some butterfly uses it)
        cir.H(13),
        cir.CPHASE(14, 13, 0.29),
    ]
    got = run_fused(psi, gates)
    want = apply_oracle(psi, gates)
    np.testing.assert_allclose(got, want, atol=ATOL)


@pytest.mark.parametrize("l,M", [(15, 4), (13, 8), (12, 3), (6, 0), (9, 9)])
def test_fused_iqft_stage(l, M, rng):
    psi = random_state(N, rng)
    gates = [cir.Gate("iqft_stage", (l,))]
    got = run_fused(psi, gates, M=M)
    want = apply_oracle(psi, gates, M=M)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_fused_full_iqft(rng):
    # Full inverse QFT on the top 8 qubits in one plan (multiple segments).
    M = 8
    psi = random_state(N, rng)
    gates = [cir.Gate("iqft_stage", (l,)) for l in range(N - 1, M - 1, -1)]
    got = run_fused(psi, gates, M=M)
    want = apply_oracle(psi, gates, M=M)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_fused_full_iqft_low_M(rng):
    """Full inverse QFT with M < 7: lane stages fold into the lane matrix,
    row stages split into the 64x64 row chain + ONE combined lane-cross
    phase table (xtable), axis stages stay per-stage."""
    M = 3
    psi = random_state(N, rng)
    gates = [cir.Gate("iqft_stage", (l,)) for l in range(N - 1, M - 1, -1)]
    segs = pf.plan_circuit(tuple(gates), N, M)
    got = run_fused(psi, gates, M=M)
    want = apply_oracle(psi, gates, M=M)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_row_stage_interleaved_dense(rng):
    """A dense row gate BETWEEN row stages on the residual's bit must not
    be reordered past the pending xtable (ordering guard)."""
    M = 0
    psi = random_state(N, rng)
    gates = [
        cir.Gate("iqft_stage", (10,)),
        cir.RY(10, 0.7),              # dense on bit 10: must flush the residual
        cir.Gate("iqft_stage", (9,)),
        cir.H(3),                      # dense lane op after residuals
    ]
    got = run_fused(psi, gates, M=M)
    want = apply_oracle(psi, gates, M=M)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_planner_budget_and_breaks():
    gates = [cir.H(13), cir.H(14), cir.H(15), cir.H(13), cir.CNOT(1, 0), cir.H(2)]
    # qubit 13,14,15 under the axis budget; the second H(13) MERGES with
    # the first (per-qubit 1q composition -> H@H = identity diagonal); the
    # CNOT fuses too (u2q op, round 3) — ONE segment for the whole run.
    segs = pf.plan_circuit(tuple(gates), 16, 0)
    assert [s[0] for s in segs] == ["fused"]
    assert segs[0][2] == (15, 14, 13)
    assert len(segs[0][1]) == 5  # H13+H13 merged; u2q and H(2) in-run
    # The modular-multiply gather is what still breaks runs.
    gates_b = [cir.H(13), cir.Gate("camodc", (8,), meta=(21, 2)), cir.H(2)]
    segs_b = pf.plan_circuit(tuple(gates_b), 16, 5)
    assert [s[0] for s in segs_b] == ["fused", "single", "fused"]
    gates2 = [cir.H(q) for q in (13, 14, 15, 12, 11, 10)] + [cir.RY(13, 0.3)]
    segs2 = pf.plan_circuit(tuple(gates2), 16, 0)
    assert [s[0] for s in segs2] == ["fused"] * len(segs2)
    # RY(13) merges with H(13); the rest are distinct qubits.
    assert sum(len(s[1]) for s in segs2) == 6


def test_compose_ops_merging(rng):
    """Interleaved 1q gates on distinct qubits merge per qubit and the
    merged segment matches the unmerged application."""
    psi = random_state(N, rng)
    gates = []
    for i in range(12):
        q = (0, 8, 14)[i % 3]
        gates.append(cir.RY(q, 0.1 + 0.07 * i))
    segs = pf.plan_circuit(tuple(gates), N, 0)
    assert len(segs) == 1 and segs[0][0] == "fused"
    assert len(segs[0][1]) == 3  # one composed op per qubit
    got = run_fused(psi, gates)
    want = apply_oracle(psi, gates)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_engine_pallas_backend_uses_fusion_full_shor():
    # n=15: C=33 with L=9, M=6.  End-to-end through the engine (planner +
    # fused kernels + oracle gathers) vs the c128 oracle.
    C, a, L, M = 33, 7, 9, 6
    eng = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex64, backend="pallas")
    got = eng.to_numpy(eng.run(shor_circuit(C, a, L, M)))
    want = ref.shor_circuit(C, a, L, M)
    np.testing.assert_allclose(got, want, atol=2e-5)
    assert abs(np.sum(np.abs(got) ** 2) - 1) < 1e-4


def test_fuse_off_matches_fuse_on(rng):
    C, a, L, M = 33, 7, 9, 6
    circ = shor_circuit(C, a, L, M)
    e_on = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex64, backend="pallas", fuse=True)
    e_off = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex64, backend="pallas", fuse=False)
    a_ = e_on.to_numpy(e_on.run(circ))
    b_ = e_off.to_numpy(e_off.run(circ))
    np.testing.assert_allclose(a_, b_, atol=2e-5)


@pytest.mark.parametrize("C,A,M,c_q", [(15, 7, 4, 9), (15, 13, 4, 15), (33, 29, 6, 13), (251, 13, 8, 14)])
def test_fused_benes_oracle(C, A, M, c_q, rng):
    psi = random_state(N, rng)
    gates = [cir.CAMODC(C, A, c_q)]
    re = jnp.asarray(psi.real, jnp.float32)
    im = jnp.asarray(psi.imag, jnp.float32)
    segs = pf.plan_circuit(tuple(gates), N, M, fuse_oracle=True)
    assert segs[0][0] == "fused" and segs[0][1][0][0] == "camodc"
    for _, ops, axes in segs:
        re, im = pf.apply_fused(re, im, ops, axes, N, M)
    got = np.asarray(re) + 1j * np.asarray(im)
    want = ref.apply_c_amodc(psi, C, A, c_q, M)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_fused_benes_oracle_in_mixed_run(rng):
    # The Shor pattern: H layer + modexp ladder fused together.
    C, a, M = 33, 7, 6
    psi = random_state(N, rng)
    gates = []
    for j, hq in enumerate((13, 14, 15, 7)):
        gates.append(cir.H(hq))             # some dense work interleaved
        gates.append(cir.CAMODC(C, pow(a, 1 << j, C), M + j))
    re = jnp.asarray(psi.real, jnp.float32)
    im = jnp.asarray(psi.imag, jnp.float32)
    for seg in pf.plan_circuit(tuple(gates), N, M, fuse_oracle=True):
        assert seg[0] == "fused"
        re, im = pf.apply_fused(re, im, seg[1], seg[2], N, M)
    got = np.asarray(re) + 1j * np.asarray(im)
    want = apply_oracle_with_camodc(psi, gates, M)
    np.testing.assert_allclose(got, want, atol=ATOL)


def apply_oracle_with_camodc(psi, gates, M):
    want = psi.copy()
    for g in gates:
        if g.name == "camodc":
            want = ref.apply_c_amodc(want, g.meta[0], g.meta[1], g.qubits[0], M)
        else:
            want = ref.apply_1q(want, cir.gate_matrix_1q(g), g.qubits[0])
    return want


def test_planner_camodc_table_budget():
    C, M = 251, 8
    gates = [cir.CAMODC(C, 13 + 2 * j, 14) for j in range(5)]
    segs = pf.plan_circuit(tuple(gates), 16, M, fuse_oracle=True)
    assert all(s[0] == "fused" for s in segs)
    for s in segs:
        assert sum(1 for op in s[1] if op[0] == "camodc") <= pf.MAX_CAMODC_PER_SEGMENT


def test_engine_full_shor_with_benes_oracle():
    # The whole period-finding circuit (H + ladder + iQFT) through the
    # engine with fusion: oracles now run as Benes stages, not gathers.
    C, a, L, M = 33, 7, 9, 6
    eng = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex64, backend="pallas", oracle="benes")
    segs = pf.plan_circuit(shor_circuit(C, a, L, M), L + M, M, fuse_oracle=True)
    assert all(s[0] == "fused" for s in segs), "oracle must fuse, not fall back"
    got = eng.to_numpy(eng.run(shor_circuit(C, a, L, M)))
    want = ref.shor_circuit(C, a, L, M)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_random_circuit_pallas_vs_oracle(rng):
    """BASELINE config #2 at kernel scale: a random dense/diagonal circuit
    through the fused pallas backend vs CPU linear algebra (n=14)."""
    n = 14
    eng = StateVectorEngine(Register(L=n, M=0), dtype=jnp.complex64, backend="pallas")
    psi = random_state(n, rng)
    from quantumcomputer_tpu.sim import statevec as sv

    state = sv.from_numpy_complex(psi, jnp.float32)
    gates = []
    names_1q = ["h", "x", "y", "z", "phase", "rx", "ry", "rz"]
    for _ in range(40):
        if rng.random() < 0.75:
            q = int(rng.integers(n))
            nm = names_1q[int(rng.integers(len(names_1q)))]
            gates.append(cir.Gate(nm, (q,), (float(rng.random() * 3),) if nm in ("phase", "rx", "ry", "rz") else ()))
        else:
            q0, q1 = map(int, rng.choice(n, size=2, replace=False))
            nm = ["cz", "cphase"][int(rng.integers(2))]
            gates.append(cir.Gate(nm, (q0, q1), (float(rng.random() * 3),) if nm == "cphase" else ()))
    out = eng.to_numpy(eng.run(tuple(gates), state))
    want = psi.copy()
    for g in gates:
        if len(g.qubits) == 1:
            want = ref.apply_1q(want, cir.gate_matrix_1q(g), g.qubits[0])
        else:
            hi, lo = (g.qubits if g.qubits[0] > g.qubits[1] else (g.qubits[1], g.qubits[0]))
            want = ref.apply_c_phase(want, hi, lo, g.params[0]) if g.name == "cphase" else ref.apply_2q(
                want, cir.gate_matrix_2q(cir.Gate("cz", (hi, lo))), hi, lo
            )
    np.testing.assert_allclose(out, want, atol=5e-5)


def test_camodc_table_disk_cache(tmp_path, monkeypatch):
    """Routed Benes tables persist to disk and reload identically (the
    Waksman walk is seconds at M>=16; recompiles must skip it)."""
    import numpy as np

    from quantumcomputer_tpu.ops import pallas_fused as pf

    monkeypatch.setattr(pf, "_TABLE_CACHE_DIR", str(tmp_path))
    pf._camodc_table.cache_clear()
    bits1, tab1 = pf._camodc_table(251, 13, 8, 2)
    assert any(f.suffix == ".npz" for f in tmp_path.iterdir())
    pf._camodc_table.cache_clear()
    bits2, tab2 = pf._camodc_table(251, 13, 8, 2)  # served from disk
    assert bits1 == bits2
    np.testing.assert_array_equal(tab1, tab2)
    pf._camodc_table.cache_clear()


def test_oversized_table_segment_splits(monkeypatch):
    """A fused segment whose matmul/mask tables exceed the VMEM budget
    splits in half recursively (two passes) instead of oversubscribing
    scoped VMEM — with identical results."""
    import numpy as np

    from quantumcomputer_tpu.models import circuit as cir
    from quantumcomputer_tpu.ops import pallas_fused as pf
    from quantumcomputer_tpu.sim import reference as ref
    from quantumcomputer_tpu.sim import statevec as sv

    n = 14
    gates = []
    for k in range(3):
        gates += [cir.H(1), cir.H(4), cir.CZ(13, 1)]  # CZ(axis, lane) flushes the chain
    segs = pf.plan_circuit(tuple(gates), n, 0)
    (kind, ops, axes) = segs[0]
    assert kind == "fused"
    bytes_full = pf._segment_table_bytes(ops, 0)
    assert bytes_full > 0

    rng = np.random.default_rng(0)
    z = rng.standard_normal(1 << n) + 1j * rng.standard_normal(1 << n)
    z /= np.linalg.norm(z)
    planar = sv.from_numpy_complex(z, jnp.float32)

    def run():
        re, im = pf.apply_fused(planar[0], planar[1], ops, axes, n, 0)
        return np.asarray(re) + 1j * np.asarray(im)

    full = run()
    monkeypatch.setattr(pf, "MAX_SEGMENT_TABLE_BYTES", 1)  # force max splitting
    split = run()
    np.testing.assert_allclose(split, full, atol=1e-6)
    # and both match the oracle
    want = z
    for g in gates:
        if g.name == "h":
            want = ref.apply_1q(want, ref.HADAMARD, g.qubits[0])
        else:
            cz = np.diag([1, 1, 1, -1]).astype(np.complex128)
            want = ref.apply_2q(want, cz, *sorted(g.qubits, reverse=True))
    np.testing.assert_allclose(split, want, atol=1e-6)
