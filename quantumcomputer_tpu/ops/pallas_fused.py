"""Fused multi-gate Pallas kernel: many gates per HBM pass.

Every gate kernel in pallas_gates.py is HBM-bound: one pass reads and
writes the full 2^n planar state.  A circuit of G such gates costs G
passes.  This module fuses a *run* of gates into ONE pass: the block is
loaded into VMEM once, all gates in the run are applied on-chip, and the
block is written back once — G passes become ceil(G / fusion factor).

Mechanics.  A kernel block must contain every butterfly partner of every
fused gate.  Qubit classes (state viewed with last dims (rows=64, 128)):

  * q <= 6   ("lane"): partner at lane offset 2^q — in-tile circular roll
    (setting bit q never carries; wraps never selected);
  * 7..12    ("row"): partner at sublane offset 2^(q-7) < 64 — in-block
    sublane roll, same no-carry argument;
  * q >= 13  ("axis"): the view exposes bit q as its own dimension of size
    2, blocked at full size — each block holds all 2^m combinations of the
    m exposed axis bits as sub-arrays (m <= MAX_AXES = 4).

Diagonal gates (phase/Z/RZ/CZ/CPHASE and the fused inverse-QFT ladder) are
FREE RIDERS: they never constrain the block shape, because any bit of the
global index is derivable in-kernel — lane iota (q<=6), row iota + row-block
offset (7 <= q < min axis), grid coordinates (gap bits between/above axes),
or the static sub-array index (axis bits).  Ladder angles are additive over
these disjoint bit fields, so each stage costs one (64,1) + one (1,128)
cos/sin — no per-element transcendentals, no table operands.

The planner (plan_circuit) greedily packs consecutive fusable gates until
MAX_AXES distinct axis targets accumulate; only the controlled-modular-
multiply gather breaks fusion runs (dense 2q gates fuse via the "u2q" op:
lane/lane and row/row pairs also compose into the MXU matmul groups).
"""

from __future__ import annotations

import math
from functools import partial
from itertools import product
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantumcomputer_tpu.models.circuit import (
    DENSE_1Q,
    DIAGONAL_1Q,
    Circuit,
    Gate,
    gate_matrix_1q,
    gate_matrix_2q,
)

LANE = 128
BI = 64            # block rows; rows cover bits [7, 13)
AXIS_MIN = 13      # targets >= this become exposed block axes
MAX_AXES = 4       # 2^4 sub-arrays per block (128 KB x 4 buffers in VMEM)
MIN_N = 14         # below this, single-gate paths are fine

_SQRT1_2 = 1.0 / math.sqrt(2.0)
_H2 = np.array([[_SQRT1_2, _SQRT1_2], [_SQRT1_2, -_SQRT1_2]])  # the one 2x2 Hadamard


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Op descriptors (hashable, static — baked into the kernel closure).
#   ("u1q",   q, u2 flattened 8-tuple of floats (re*4, im*4))
#   ("diag1", q, (re0, im0, re1, im1))
#   ("diag2", q_hi, q_lo, 8-tuple re/im of the 4 diagonal entries)
#   ("iqft",  l)   -- fused H(l) + ladder diagonal down to M


MAX_CAMODC_PER_SEGMENT = 2  # bounds VMEM spent on Benes mask tables


def gate_to_op(g: Gate, M: int = 0, fuse_oracle: bool = False) -> Optional[tuple]:
    name = g.name
    if name == "camodc" and fuse_oracle and 1 <= M <= 13:
        # Controlled modular multiply as a Benes network over the M register
        # (bits < 13 are lane/row-local); the control is a free-rider bit.
        # OFF by default: measured on v5e at M=13, the 2M-1 roll+select
        # stages are ~4x compute-bound (45 ms/apply) and lose to the XLA
        # gather (30 ms).  Select with StateVectorEngine(oracle="benes") —
        # the right primitive when M is small or VPU throughput grows.
        C, atox = g.meta
        return ("camodc", g.qubits[0], int(C), int(atox % C))
    if name in DENSE_1Q:
        u = gate_matrix_1q(g)
        return ("u1q", g.qubits[0], tuple(float(v) for v in np.concatenate([u.real.ravel(), u.imag.ravel()])))
    if name in DIAGONAL_1Q:
        d = np.diagonal(gate_matrix_1q(g))
        return ("diag1", g.qubits[0], (float(d[0].real), float(d[0].imag), float(d[1].real), float(d[1].imag)))
    if name in ("cz", "cphase"):
        d = np.diagonal(gate_matrix_2q(g))
        q_hi, q_lo = g.qubits if g.qubits[0] > g.qubits[1] else (g.qubits[1], g.qubits[0])
        vals = tuple(float(v) for v in np.concatenate([d.real, d.imag]))
        return ("diag2", q_hi, q_lo, vals)
    if name == "iqft_stage":
        return ("iqft", g.qubits[0])
    if name in ("cnot", "swap", "u2q"):
        # Generic dense 2q op (reference 2q construction: qc_shor.c:513-565
        # builds these as full sparse matrices).  Basis 2*bit(q_hi)+bit(q_lo)
        # with q_hi > q_lo (relabel the 4x4 when the gate lists them low-high).
        m4 = gate_matrix_2q(g)
        q_hi, q_lo = g.qubits
        if q_hi < q_lo:
            q_hi, q_lo = q_lo, q_hi
            p = [0, 2, 1, 3]
            m4 = m4[np.ix_(p, p)]
        vals = tuple(float(v) for v in np.concatenate([m4.real.ravel(), m4.imag.ravel()]))
        return ("u2q", q_hi, q_lo, vals)
    return None


def _op_axis_targets(op: tuple) -> List[int]:
    """Qubits this op needs as exposed axes (butterfly targets >= AXIS_MIN)."""
    if op[0] == "u1q" and op[1] >= AXIS_MIN:
        return [op[1]]
    if op[0] == "iqft" and op[1] >= AXIS_MIN:
        return [op[1]]
    if op[0] == "u2q":
        return [q for q in (op[1], op[2]) if q >= AXIS_MIN]
    return []


def _op_matrix_2x2(op: tuple) -> Optional[np.ndarray]:
    """2x2 complex matrix of a u1q/diag1 op (None for other kinds)."""
    if op[0] == "u1q":
        v = op[2]
        return np.array(v[:4], np.complex128).reshape(2, 2) + 1j * np.array(v[4:], np.complex128).reshape(2, 2)
    if op[0] == "diag1":
        r0, i0, r1, i1 = op[2]
        return np.array([[r0 + 1j * i0, 0.0], [0.0, r1 + 1j * i1]], np.complex128)
    return None


def _matrix_to_op(q: int, m: np.ndarray) -> tuple:
    if abs(m[0, 1]) == 0.0 and abs(m[1, 0]) == 0.0:
        return ("diag1", q, (float(m[0, 0].real), float(m[0, 0].imag), float(m[1, 1].real), float(m[1, 1].imag)))
    return ("u1q", q, tuple(float(v) for v in np.concatenate([m.real.ravel(), m.imag.ravel()])))


def compose_ops(ops) -> tuple:
    """Merge single-qubit ops per qubit inside a fused segment.

    1q gates on DISTINCT qubits commute, so each qubit's u1q/diag1 sequence
    composes into one 2x2 product regardless of interleaving — the standard
    gate-merging circuit simplification.  Multi-qubit ops (diag2, iqft,
    camodc) conservatively flush all pending products.  This bounds the
    fused kernel's VPU work per element at one dense butterfly per qubit,
    which is what makes long dense chains memory- rather than compute-bound.
    """
    out: list = []
    pending: dict = {}  # q -> (index in out of placeholder, matrix)
    order: list = []

    def flush_all():
        for q in order:
            idx, m = pending[q]
            out[idx] = _matrix_to_op(q, m)
        pending.clear()
        order.clear()

    for op in ops:
        m = _op_matrix_2x2(op)
        if m is None:
            flush_all()
            out.append(op)
            continue
        q = op[1]
        if q in pending:
            idx, acc = pending[q]
            pending[q] = (idx, m @ acc)
        else:
            out.append(None)  # placeholder, filled at flush
            pending[q] = (len(out) - 1, m)
            order.append(q)
    flush_all()
    return tuple(o for o in out if o is not None)


LANEMAT_MIN = 2  # lane-class ops per segment before they fuse to one MXU matmul
ROWMAT_MIN = 2


def _expand_1q(u: np.ndarray, bit: int, nbits: int) -> np.ndarray:
    """u acting on `bit` of an nbits-wide index as a dense 2^nbits matrix."""
    hi = np.eye(1 << (nbits - 1 - bit), dtype=np.complex128)
    lo = np.eye(1 << bit, dtype=np.complex128)
    return np.kron(hi, np.kron(u, lo))


def _expand_2q(u4: np.ndarray, b_hi: int, b_lo: int, nbits: int) -> np.ndarray:
    """u4 (basis 2*bit(b_hi)+bit(b_lo)) acting on two bits of an nbits-wide
    index as a dense 2^nbits matrix."""
    dim = 1 << nbits
    w = np.zeros((dim, dim), np.complex128)
    i = np.arange(dim)
    i_hi = (i >> b_hi) & 1
    i_lo = (i >> b_lo) & 1
    base = i & ~((1 << b_hi) | (1 << b_lo))
    for j_hi in (0, 1):
        for j_lo in (0, 1):
            j = base | (j_hi << b_hi) | (j_lo << b_lo)
            w[i, j] = u4[2 * i_hi + i_lo, 2 * j_hi + j_lo]
    return w


def _op_matrix_4x4(op: tuple):
    """(q_hi, q_lo, 4x4 complex) of a u2q op, or None."""
    if op[0] != "u2q":
        return None
    v = op[3]
    m = np.array(v[:16], np.float64).reshape(4, 4) + 1j * np.array(v[16:], np.float64).reshape(4, 4)
    return op[1], op[2], m


def _lane_op_matrix(op: tuple, M: int) -> Optional[np.ndarray]:
    """128x128 matrix of an op supported ENTIRELY on the lane bits [0, 7),
    or None.  Composition order is preserved, so non-commuting lane ops
    (e.g. iQFT stages) chain exactly."""
    m2 = _op_matrix_2x2(op)
    if m2 is not None:
        return _expand_1q(m2, op[1], 7) if op[1] <= 6 else None
    if op[0] == "diag2" and op[1] <= 6 and op[2] <= 6:
        v = op[3]
        d = np.array(v[:4]) + 1j * np.array(v[4:])
        lane = np.arange(LANE)
        return np.diag(d[2 * ((lane >> op[1]) & 1) + ((lane >> op[2]) & 1)])
    if op[0] == "u2q" and op[1] <= 6:
        q_hi, q_lo, m4 = _op_matrix_4x4(op)
        return _expand_2q(m4, q_hi, q_lo, 7)
    if op[0] == "iqft" and op[1] <= 6:
        # H(l) then the closed-form ladder diagonal down to M — the whole
        # stage lives on lane bits, so the iQFT's lane-stage suffix
        # composes into the lane matrix (it IS the 2^(l+1)-point no-swap
        # inverse QFT block).
        l = op[1]
        h = _expand_1q(_H2, l, 7)
        lane = np.arange(LANE)
        mask = (1 << l) - (1 << M) if l > M else 0
        theta = np.pi * (lane & mask) / float(1 << l)
        phase = np.where(((lane >> l) & 1) == 1, np.exp(1j * theta), 1.0)
        return np.diag(phase) @ h
    return None


def _row_op_matrix(op: tuple, M: int) -> Optional[np.ndarray]:
    """64x64 matrix of an op supported entirely on row bits [7, 13)."""
    m2 = _op_matrix_2x2(op)
    if m2 is not None:
        return _expand_1q(m2, op[1] - 7, 6) if 7 <= op[1] <= 12 else None
    if op[0] == "diag2" and 7 <= op[2] and op[1] <= 12:
        v = op[3]
        d = np.array(v[:4]) + 1j * np.array(v[4:])
        r = np.arange(64)
        return np.diag(d[2 * ((r >> (op[1] - 7)) & 1) + ((r >> (op[2] - 7)) & 1)])
    if op[0] == "u2q" and 7 <= op[2] and op[1] <= 12:
        q_hi, q_lo, m4 = _op_matrix_4x4(op)
        return _expand_2q(m4, q_hi - 7, q_lo - 7, 6)
    if op[0] == "iqft" and 7 <= op[1] <= 12 and M >= 7:
        l = op[1]
        h = _expand_1q(_H2, l - 7, 6)
        r = np.arange(64)
        mask = ((1 << l) - (1 << M)) >> 7
        theta = np.pi * (r & mask) / float(1 << (l - 7))
        phase = np.where(((r >> (l - 7)) & 1) == 1, np.exp(1j * theta), 1.0)
        return np.diag(phase) @ h
    return None


def _is_diagonal_op(op: tuple) -> bool:
    return op[0] in ("diag1", "diag2")


def _is_neutral(op: tuple) -> bool:
    """Ops on bits >= 13 only: commute with both lane and row chains, so
    they pass through a pending group without flushing it."""
    if op[0] in ("u1q", "diag1"):
        return op[1] >= 13
    if op[0] == "diag2":
        return op[2] >= 13
    if op[0] == "u2q":
        return op[2] >= 13  # q_hi > q_lo, so both qubits are axis-class
    return False


def _row_stage_parts(op: tuple, M: int):
    """Split an iQFT row stage (7 <= l <= 12, M < 7) into a 64x64 row
    operator (H(l) + the ROW part of the ladder diagonal) plus the
    lane-cross residual angles theta(row6, lane): the stage's phase on
    bit_l==1 elements factorizes exp(i(theta_row + theta_lane)), and the
    lane part — exp(i*pi*(lane & lanemask)/2^l) gated on row bit l —
    commutes with every other row/lane-diagonal op, so ALL stages'
    residuals combine into one (64, 128) phase table."""
    l = op[1]
    h = _expand_1q(_H2, l - 7, 6)
    r = np.arange(64)
    rowmask = ((1 << l) - (1 << M)) >> 7
    th_row = np.pi * (r & rowmask) / float(1 << (l - 7))
    gate = ((r >> (l - 7)) & 1) == 1
    w = np.diag(np.where(gate, np.exp(1j * th_row), 1.0)) @ h
    lanemask = ((1 << l) - (1 << M)) & (LANE - 1)
    lane = np.arange(LANE)
    th_lane = np.pi * (lane & lanemask) / float(1 << l)
    theta = np.where(gate[:, None], th_lane[None, :], 0.0)  # (64, 128)
    return w, theta


def matmul_group_ops(ops, M: int):
    """Rewrite each segment's lane-supported (bits < 7) and row-supported
    (bits 7..12) op chains into single MXU matmuls.

    Ops on disjoint bit classes commute, so the lane chain composes (in
    order — non-commuting ops within the chain are fine) into ONE 128x128
    operator on the lane index and the row chain into ONE 64x64 operator
    per sublane group; this includes the iQFT's lane-stage suffix and
    lane-local controlled phases.  iQFT ROW stages (whose ladder reaches
    into the lanes) split into a row operator + a lane-cross residual; all
    residuals in a chain combine into ONE (64, 128) phase-table multiply.
    The MXU applies the chains at a fraction of the VPU's roll+select cost
    (~12 ops/elem per butterfly on v5e), which otherwise bounds dense-chain
    throughput.  Returns (ops', matrices) with matrices[i] the f32 table
    operand for table index i."""
    out: list = []
    mats: list = []
    lane: list = []  # (op, matrix)
    rows: list = []
    xtheta = np.zeros((64, LANE))  # accumulated lane-cross residual angles
    has_xtheta = False
    xtheta_bits: set = set()  # row qubits the residual is conditioned on

    def emit_rows():
        nonlocal has_xtheta, xtheta
        _emit(rows, 64, ROWMAT_MIN)
        rows.clear()
        if has_xtheta:
            tab = np.stack([np.cos(xtheta), np.sin(xtheta)]).astype(np.float32)
            out.append(("xtable", len(mats)))
            mats.append(tab)
            xtheta = np.zeros((64, LANE))
            has_xtheta = False
        xtheta_bits.clear()

    def _emit(group, size, min_ops):
        if not group:
            return
        has_iqft = any(op[0] == "iqft" for op, _ in group)
        if len(group) < min_ops and not has_iqft:
            out.extend(op for op, _ in group)
            return
        w = np.eye(size, dtype=np.complex128)
        for _, wg in group:
            w = wg @ w
        wt = w.T  # kernel computes out = x @ W^T
        real_only = bool(np.all(np.abs(wt.imag) < 1e-300))
        tab = np.stack([wt.real, wt.imag]).astype(np.float32)
        out.append(("lanemat" if size == LANE else "rowmat", len(mats), real_only))
        mats.append(tab)

    def flush():
        emit_rows()
        _emit(lane, LANE, LANEMAT_MIN)
        lane.clear()

    for op in ops:
        wl = _lane_op_matrix(op, M)
        if wl is not None:
            # A pending lane-cross residual is diagonal in the lanes; a
            # dense lane op does not commute with it — flush rows first.
            if has_xtheta and not _is_diagonal_op(op):
                emit_rows()
            lane.append((op, wl))
            continue
        wr = _row_op_matrix(op, M)
        if wr is not None:
            # A dense row op on a bit the pending residual is conditioned
            # on cannot be reordered past it — flush first (u2q touches two
            # row bits; either may carry the residual's condition).
            op_bits = (op[1], op[2]) if op[0] == "u2q" else (op[1],)
            if not _is_diagonal_op(op) and any(q in xtheta_bits for q in op_bits):
                emit_rows()
            rows.append((op, wr))
            continue
        if op[0] == "iqft" and 7 <= op[1] <= 12 and M < 7:
            # The residual is lane-diagonal: it must not be reordered past a
            # pending DENSE lane chain that precedes it — flush lanes first.
            if any(not _is_diagonal_op(o) for o, _ in lane):
                _emit(lane, LANE, LANEMAT_MIN)
                lane.clear()
            if op[1] in xtheta_bits:  # repeated stage on the same bit
                emit_rows()
            w, theta = _row_stage_parts(op, M)
            rows.append((op, w))
            xtheta = xtheta + theta
            has_xtheta = True
            xtheta_bits.add(op[1])
            continue
        if _is_neutral(op):
            out.append(op)
            continue
        flush()
        out.append(op)
    flush()
    return tuple(out), mats


def plan_circuit(circuit: Circuit, n: int, M: int, max_axes: int = MAX_AXES, fuse_oracle: bool = False):
    """Segment a circuit into fused runs and single gates.

    Returns a list of ("fused", ops_tuple, axes_tuple) / ("single", gate).
    """
    if n < MIN_N:
        return [("single", g) for g in circuit]
    segments: List[tuple] = []
    run: List[tuple] = []
    axes: List[int] = []
    n_camodc = 0

    def flush():
        nonlocal run, axes, n_camodc
        if run:
            ops = compose_ops(tuple(run))
            # Per-qubit merging may have emptied axis butterflies? No — it
            # never removes ops, only merges same-qubit ones; axes stay valid
            # (a merged u1q on an axis qubit still needs that axis).
            segments.append(("fused", ops, tuple(sorted(axes, reverse=True))))
        run, axes, n_camodc = [], [], 0

    for g in circuit:
        op = gate_to_op(g, M, fuse_oracle)
        if op is None:
            flush()
            segments.append(("single", g))
            continue
        need = [a for a in _op_axis_targets(op) if a not in axes]
        over_axes = len(axes) + len(need) > max_axes
        over_tables = op[0] == "camodc" and n_camodc >= MAX_CAMODC_PER_SEGMENT
        if over_axes or over_tables:
            flush()
            need = _op_axis_targets(op)
        run.append(op)
        if op[0] == "camodc":
            n_camodc += 1
        for a in need:
            if a not in axes:
                axes.append(a)
    flush()
    return segments


# ---------------------------------------------------------------------------
# Benes oracle tables.


import os
from functools import lru_cache

# Waksman/Benes routing is an O(M * 2^M) host-side recursion (~0.2 s at
# M=13, ~2 s at M=16) paid once per distinct (C, A, M) at trace time; the
# routed tables persist here across processes so recompiles and fresh CLI
# invocations skip the walk.  Override/disable with QC_TPU_TABLE_CACHE
# (set to a path, or empty to disable).
_TABLE_CACHE_DIR = os.environ.get(
    "QC_TPU_TABLE_CACHE", os.path.join(os.path.expanduser("~"), ".cache", "qc_tpu_tables")
)


@lru_cache(maxsize=64)
def _camodc_table(C: int, A: int, M: int, bi: int):
    """Benes swap-mask tables for the controlled modular multiply.

    Returns (stage_bits tuple, table np.ndarray (S, bi, 128) f32): element at
    (row r, lane c) of a state block has M-register value (r*128 + c) mod 2^M
    (valid because bi is a multiple of 2^(M-7) and block row offsets are
    multiples of bi), so each stage's (2^M,) element mask tiles exactly."""
    from quantumcomputer_tpu.ops.benes import benes_route

    path = None
    if _TABLE_CACHE_DIR:
        path = os.path.join(_TABLE_CACHE_DIR, f"camodc_v1_{C}_{A}_{M}_{bi}.npz")
        try:
            z = np.load(path)
            return tuple(int(b) for b in z["bits"]), z["tab"]
        except Exception:
            pass  # miss/corrupt -> recompute (and overwrite)

    size = 1 << M
    f = np.arange(size, dtype=np.int64)
    pi = np.where(f < C, (A * f) % C, f)  # scatter form: element f -> slot A*f mod C
    stages = benes_route(pi)
    bits = tuple(b for b, _ in stages)
    tab = np.empty((len(stages), bi, LANE), dtype=np.float32)
    r = np.arange(bi, dtype=np.int64)[:, None]
    c = np.arange(LANE, dtype=np.int64)[None, :]
    fidx = (r * LANE + c) % size
    for si, (_, mask) in enumerate(stages):
        tab[si] = mask[fidx].astype(np.float32)
    if path:
        try:
            os.makedirs(_TABLE_CACHE_DIR, exist_ok=True)
            tmp = path + f".{os.getpid()}.tmp.npz"  # .npz suffix: savez won't rename
            np.savez(tmp, bits=np.asarray(bits, np.int32), tab=tab)
            os.replace(tmp, path)
        except Exception:
            pass  # cache write failures never affect correctness
    return bits, tab


# ---------------------------------------------------------------------------
# Kernel generation.


class _Layout:
    """View/block/grid geometry for a fused segment."""

    def __init__(self, n: int, axes: Sequence[int]):
        self.n = n
        self.axes = tuple(sorted(axes, reverse=True))  # descending
        m = len(self.axes)
        self.m = m
        # rows cover bits [7, rows_end)
        self.rows_end = self.axes[-1] if m else n
        self.ir = 1 << (self.rows_end - 7)
        # Block rows scale with the axis count so every block stays ~1 MB per
        # plane (2^(11-m) rows x 128 lanes x 4 B x 2^m sub-arrays): small
        # fixed-size blocks measured 2x below streaming roofline at n>=28
        # (grid-step overhead), while 2 MB blocks overflow the 16 MB scoped
        # VMEM budget (2 planes x in/out x double buffering = 8x the block).
        # In-block sublane rolls only need bi >= 64.
        self.bi = min(self.ir, max(BI, 1 << (11 - m)))
        # view dims, most-significant first:
        #   gap_above_a1, 2, gap_a1_a2, 2, ..., 2, ir_rows, 128
        dims: List[int] = []
        self.gap_bits: List[Tuple[int, int]] = []  # (low_bit, n_bits) per gap dim
        prev = n
        for a in self.axes:
            gap = prev - a - 1
            dims.append(1 << gap)
            self.gap_bits.append((a + 1, gap))
            dims.append(2)
            prev = a
        dims.append(self.ir)
        dims.append(LANE)
        self.view = tuple(dims)
        # grid: one dim per gap + the row-block dim
        self.grid = tuple(d for d in dims[:-2:2]) + (self.ir // self.bi,)
        block = []
        for i, d in enumerate(dims[:-2]):
            block.append(1 if i % 2 == 0 else 2)
        block += [self.bi, LANE]
        self.block = tuple(block)

    def index_map(self):
        m = self.m

        def imap(*pids):
            # pids = (gap_0, ..., gap_{m-1}, row_block)
            out = []
            for i in range(m):
                out.append(pids[i])  # gap dim (block size 1)
                out.append(0)        # axis dim (block size 2 = full)
            out.append(pids[m])      # row block
            out.append(0)            # lanes
            return tuple(out)

        return imap

    def spec(self):
        return pl.BlockSpec(self.block, self.index_map(), memory_space=pltpu.VMEM)


def _apply_ops_to_subs(subs_re: Dict, subs_im: Dict, ops, lay: _Layout, M: int, dtype, row_pid, tables=(), store_bf16: bool = False):
    """Apply the op list to the dict of (bi, 128) sub-arrays in place-ish."""
    m = lay.m
    bi = lay.bi
    axes = lay.axes
    # MXU precision for the composed lane/row matmuls: full f32 (6-pass
    # emulation) when the stored amplitudes are f32/f64.  Under bf16
    # storage each product runs as TWO native-MXU bf16 dots with f32
    # accumulation against a hi+lo table split (~3x faster; Mosaic lowers
    # only DEFAULT and HIGHEST).  Accuracy: the table split leaves ~2^-17
    # residual, but the ACTIVATIONS are also cast to bf16 per matmul group
    # — one extra ~2^-8-relative rounding per lanemat/rowmat beyond the
    # per-pass storage rounding (both within the mode's few-ulp envelope;
    # see tests/test_complex32.py bounds).
    hp = jax.lax.Precision.HIGHEST

    def mxu_dot(x, w_or_pair, transpose=False):
        """x @ W (or W @ x when transpose) honoring the storage mode."""
        if store_bf16:
            hi, lo = w_or_pair
            xb = x.astype(jnp.bfloat16)
            if transpose:
                return (
                    jnp.dot(hi, xb, preferred_element_type=jnp.float32)
                    + jnp.dot(lo, xb, preferred_element_type=jnp.float32)
                )
            return (
                jnp.dot(xb, hi, preferred_element_type=jnp.float32)
                + jnp.dot(xb, lo, preferred_element_type=jnp.float32)
            )
        w = w_or_pair
        return jnp.dot(w, x, precision=hp) if transpose else jnp.dot(x, w, precision=hp)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    row_local = jax.lax.broadcasted_iota(jnp.int32, (bi, 1), 0)
    row_global = row_local + row_pid * bi  # bits [7, rows_end) of the index

    def axis_pos(q):
        return axes.index(q)

    def get_bit(q, bits):
        """Bit q of the global index for sub-array `bits`: returns a Python
        int (static), or an int array broadcastable to (bi, 128)."""
        if q <= 6:
            return (lane_i >> q) & 1
        if q < lay.rows_end:
            return (row_global >> (q - 7)) & 1
        if q in axes:
            return bits[axis_pos(q)]
        # gap bit: from the grid coordinates
        for gi, (low, nbits) in enumerate(lay.gap_bits):
            if low <= q < low + nbits:
                return (pl.program_id(gi) >> (q - low)) & 1
        raise AssertionError(f"qubit {q} not addressable")

    def phase_mul(re, im, pc, ps, mask):
        """(re, im) * (pc + i ps) where mask else identity."""
        nre = re * pc - im * ps
        nim = re * ps + im * pc
        if mask is None:
            return nre, nim
        sel = mask == 1
        return jnp.where(sel, nre, re), jnp.where(sel, nim, im)

    def roll_pair(x, q):
        """Partner values for an in-block butterfly on qubit q (q < 13)."""
        if q <= 6:
            s = 1 << q
            bit1 = ((lane_i >> q) & 1) == 1
            return jnp.where(bit1, pltpu.roll(x, s, 1), pltpu.roll(x, LANE - s, 1)), bit1
        s = 1 << (q - 7)
        bit1 = ((row_local >> (q - 7)) & 1) == 1
        return jnp.where(bit1, pltpu.roll(x, s, 0), pltpu.roll(x, bi - s, 0)), bit1

    for op in ops:
        kind = op[0]
        if kind == "u1q":
            q, uf = op[1], op[2]
            # Python-float entries: weakly typed, no f64 promotion of planes.
            ur = [[uf[0], uf[1]], [uf[2], uf[3]]]
            ui = [[uf[4], uf[5]], [uf[6], uf[7]]]
            real_only = all(v == 0.0 for v in uf[4:])
            if q in axes:
                k = axis_pos(q)
                for bits in product((0, 1), repeat=m):
                    if bits[k] != 0:
                        continue
                    b1 = bits[:k] + (1,) + bits[k + 1 :]
                    xr0, xi0 = subs_re[bits], subs_im[bits]
                    xr1, xi1 = subs_re[b1], subs_im[b1]
                    if real_only:
                        subs_re[bits] = ur[0][0] * xr0 + ur[0][1] * xr1
                        subs_im[bits] = ur[0][0] * xi0 + ur[0][1] * xi1
                        subs_re[b1] = ur[1][0] * xr0 + ur[1][1] * xr1
                        subs_im[b1] = ur[1][0] * xi0 + ur[1][1] * xi1
                    else:
                        subs_re[bits] = (ur[0][0] * xr0 - ui[0][0] * xi0) + (ur[0][1] * xr1 - ui[0][1] * xi1)
                        subs_im[bits] = (ur[0][0] * xi0 + ui[0][0] * xr0) + (ur[0][1] * xi1 + ui[0][1] * xr1)
                        subs_re[b1] = (ur[1][0] * xr0 - ui[1][0] * xi0) + (ur[1][1] * xr1 - ui[1][1] * xi1)
                        subs_im[b1] = (ur[1][0] * xi0 + ui[1][0] * xr0) + (ur[1][1] * xi1 + ui[1][1] * xr1)
            else:
                for bits in product((0, 1), repeat=m):
                    xr, xi = subs_re[bits], subs_im[bits]
                    pr, bit1 = roll_pair(xr, q)
                    pi, _ = roll_pair(xi, q)
                    dr = jnp.where(bit1, float(ur[1][1]), float(ur[0][0])).astype(dtype)
                    orr = jnp.where(bit1, float(ur[1][0]), float(ur[0][1])).astype(dtype)
                    if real_only:
                        subs_re[bits] = dr * xr + orr * pr
                        subs_im[bits] = dr * xi + orr * pi
                    else:
                        di = jnp.where(bit1, float(ui[1][1]), float(ui[0][0])).astype(dtype)
                        oi = jnp.where(bit1, float(ui[1][0]), float(ui[0][1])).astype(dtype)
                        subs_re[bits] = (dr * xr - di * xi) + (orr * pr - oi * pi)
                        subs_im[bits] = (dr * xi + di * xr) + (orr * pi + oi * pr)
        elif kind == "u2q":
            # Dense 2q gate (cnot/swap/generic; basis 2*bit(q_hi)+bit(q_lo),
            # q_hi > q_lo).  Three class shapes: both qubits exposed axes
            # (4-sub-array combine), axis+in-block (pairwise combine with
            # one roll), both in-block (4-term roll combine, the in-VMEM
            # analog of ops/gates._apply_2q_roll).  Axis targets are always
            # exposed by the planner (_op_axis_targets), so q >= 13 => axis.
            q_hi, q_lo, v = op[1], op[2], op[3]
            ur4 = np.array(v[:16], np.float64).reshape(4, 4)
            ui4 = np.array(v[16:], np.float64).reshape(4, 4)
            real_only = not np.any(ui4)

            def cmul_sum(coeffs_r, coeffs_i, srcs_r, srcs_i):
                """sum_k (cr_k + i ci_k) * (xr_k + i xi_k) -> (re, im).
                Coefficients may be floats or arrays; zero floats skip."""
                nre = None
                nim = None

                def acc(a, b):
                    return b if a is None else a + b

                for cr, ci, xr_, xi_ in zip(coeffs_r, coeffs_i, srcs_r, srcs_i):
                    static_cr = isinstance(cr, float)
                    static_ci = isinstance(ci, float)
                    if not (static_cr and cr == 0.0):
                        nre = acc(nre, xr_ * cr)
                        nim = acc(nim, xi_ * cr)
                    if not (static_ci and ci == 0.0):
                        nre = acc(nre, -(xi_ * ci))
                        nim = acc(nim, xr_ * ci)
                z = jnp.zeros_like(srcs_r[0])
                return (z if nre is None else nre), (z if nim is None else nim)

            if q_lo in axes:  # q_hi > q_lo >= AXIS_MIN: both are axes
                kh, kl = axis_pos(q_hi), axis_pos(q_lo)
                for bits in product((0, 1), repeat=m):
                    if bits[kh] or bits[kl]:
                        continue
                    quad = []
                    for bh_, bl_ in ((0, 0), (0, 1), (1, 0), (1, 1)):
                        bb = list(bits)
                        bb[kh], bb[kl] = bh_, bl_
                        quad.append(tuple(bb))
                    xs_r = [subs_re[b] for b in quad]
                    xs_i = [subs_im[b] for b in quad]
                    for r_i, b in enumerate(quad):
                        subs_re[b], subs_im[b] = cmul_sum(
                            [float(ur4[r_i][c]) for c in range(4)],
                            [float(ui4[r_i][c]) for c in range(4)],
                            xs_r, xs_i,
                        )
            elif q_hi in axes:  # axis + in-block
                k = axis_pos(q_hi)

                def sel(bit1, v1, v0):
                    if v1 == v0:
                        return float(v0)
                    return jnp.where(bit1, float(v1), float(v0)).astype(dtype)

                for bits in product((0, 1), repeat=m):
                    if bits[k]:
                        continue
                    b1 = bits[:k] + (1,) + bits[k + 1:]
                    x0r, x0i = subs_re[bits], subs_im[bits]
                    x1r, x1i = subs_re[b1], subs_im[b1]
                    r0r, bl1 = roll_pair(x0r, q_lo)
                    r0i, _ = roll_pair(x0i, q_lo)
                    r1r, _ = roll_pair(x1r, q_lo)
                    r1i, _ = roll_pair(x1i, q_lo)
                    srcs_r = [x0r, r0r, x1r, r1r]
                    srcs_i = [x0i, r0i, x1i, r1i]
                    # row for axis bit a, element bit beta: 2a + beta;
                    # columns per source: x0->beta, r0->1-beta, x1->2+beta,
                    # r1->2+(1-beta), selected elementwise via bl1.
                    col_pairs = [((1, 1), (0, 0)), ((1, 0), (0, 1)),
                                 ((1, 3), (0, 2)), ((1, 2), (0, 3))]
                    out0 = cmul_sum(
                        [sel(bl1, ur4[p1[0]][p1[1]], ur4[p0[0]][p0[1]]) for p1, p0 in col_pairs],
                        [sel(bl1, ui4[p1[0]][p1[1]], ui4[p0[0]][p0[1]]) for p1, p0 in col_pairs],
                        srcs_r, srcs_i,
                    )
                    col_pairs1 = [((3, 1), (2, 0)), ((3, 0), (2, 1)),
                                  ((3, 3), (2, 2)), ((3, 2), (2, 3))]
                    out1 = cmul_sum(
                        [sel(bl1, ur4[p1[0]][p1[1]], ur4[p0[0]][p0[1]]) for p1, p0 in col_pairs1],
                        [sel(bl1, ui4[p1[0]][p1[1]], ui4[p0[0]][p0[1]]) for p1, p0 in col_pairs1],
                        srcs_r, srcs_i,
                    )
                    subs_re[bits], subs_im[bits] = out0
                    subs_re[b1], subs_im[b1] = out1
            else:  # both in-block (lane/row classes)
                for bits in product((0, 1), repeat=m):
                    xr, xi = subs_re[bits], subs_im[bits]
                    rhr, bh1 = roll_pair(xr, q_hi)
                    rhi_, _ = roll_pair(xi, q_hi)
                    rlr, bl1 = roll_pair(xr, q_lo)
                    rli, _ = roll_pair(xi, q_lo)
                    rbr, _ = roll_pair(rhr, q_lo)
                    rbi, _ = roll_pair(rhi_, q_lo)

                    def csel(m_, dh, dl):
                        """m_[2bh+bl, 2(bh^dh)+(bl^dl)] elementwise."""
                        v00 = float(m_[0, 2 * dh + dl])
                        v01 = float(m_[1, 2 * dh + (1 ^ dl)])
                        v10 = float(m_[2, 2 * (1 ^ dh) + dl])
                        v11 = float(m_[3, 2 * (1 ^ dh) + (1 ^ dl)])
                        if v00 == v01 == v10 == v11:
                            return v00
                        return jnp.where(
                            bh1,
                            jnp.where(bl1, v11, v10),
                            jnp.where(bl1, v01, v00),
                        ).astype(dtype)

                    srcs_r = [xr, rlr, rhr, rbr]  # (dh, dl) = 00, 01, 10, 11
                    srcs_i = [xi, rli, rhi_, rbi]
                    deltas2 = [(0, 0), (0, 1), (1, 0), (1, 1)]
                    subs_re[bits], subs_im[bits] = cmul_sum(
                        [csel(ur4, dh, dl) for dh, dl in deltas2],
                        [csel(ui4, dh, dl) for dh, dl in deltas2],
                        srcs_r, srcs_i,
                    )
        elif kind == "diag1":
            q, (r0, i0, r1, i1) = op[1], op[2]
            for bits in product((0, 1), repeat=m):
                b = get_bit(q, bits)
                if isinstance(b, int):
                    pc, ps = (r1, i1) if b else (r0, i0)
                    if pc == 1.0 and ps == 0.0:
                        continue
                    subs_re[bits], subs_im[bits] = phase_mul(subs_re[bits], subs_im[bits], pc, ps, None)
                else:
                    pc = jnp.where(b == 1, r1, r0).astype(dtype)
                    ps = jnp.where(b == 1, i1, i0).astype(dtype)
                    subs_re[bits], subs_im[bits] = phase_mul(subs_re[bits], subs_im[bits], pc, ps, None)
        elif kind == "diag2":
            q_hi, q_lo, v = op[1], op[2], op[3]
            dr, di = np.array(v[:4]), np.array(v[4:])
            # General diagonal over two bits: value d[2*b_hi + b_lo].
            for bits in product((0, 1), repeat=m):
                bh = get_bit(q_hi, bits)
                bl = get_bit(q_lo, bits)
                if isinstance(bh, int) and isinstance(bl, int):
                    k = 2 * bh + bl
                    if dr[k] == 1.0 and di[k] == 0.0:
                        continue
                    subs_re[bits], subs_im[bits] = phase_mul(subs_re[bits], subs_im[bits], float(dr[k]), float(di[k]), None)
                else:
                    # Nested selects (no in-kernel gather): d[2*b_hi + b_lo].
                    bh_a = jnp.asarray(bh, jnp.int32)
                    bl_a = jnp.asarray(bl, jnp.int32)
                    hi1 = bh_a == 1
                    lo1 = bl_a == 1
                    pc = jnp.where(
                        hi1,
                        jnp.where(lo1, float(dr[3]), float(dr[2])),
                        jnp.where(lo1, float(dr[1]), float(dr[0])),
                    ).astype(dtype)
                    ps = jnp.where(
                        hi1,
                        jnp.where(lo1, float(di[3]), float(di[2])),
                        jnp.where(lo1, float(di[1]), float(di[0])),
                    ).astype(dtype)
                    subs_re[bits], subs_im[bits] = phase_mul(subs_re[bits], subs_im[bits], pc, ps, None)
        elif kind == "iqft":
            l = op[1]
            mask = (1 << l) - (1 << M)
            inv = math.pi / float(1 << l)
            # Angle contributions from disjoint bit fields (all & mask):
            th_lane = ((lane_i & (mask & (LANE - 1))).astype(dtype)) * inv  # (1,128)
            th_row = (((row_global << 7) & mask).astype(dtype)) * inv  # (bi,1)
            th_gap = jnp.asarray(0.0, dtype)
            for gi, (low, nbits) in enumerate(lay.gap_bits):
                if nbits and low < l:
                    th_gap = th_gap + ((pl.program_id(gi) << low) & mask).astype(dtype) * inv
            lc, ls_ = jnp.cos(th_lane), jnp.sin(th_lane)

            def stage_phase(bits):
                th_ax = 0
                for k2, a in enumerate(axes):
                    th_ax += ((bits[k2] << a) & mask) * inv
                th_r = th_row + th_gap + jnp.asarray(th_ax, dtype)
                rc, rs = jnp.cos(th_r), jnp.sin(th_r)
                pc = rc * lc - rs * ls_
                ps = rc * ls_ + rs * lc
                return pc, ps

            s = _SQRT1_2
            if l in axes:
                k = axis_pos(l)
                for bits in product((0, 1), repeat=m):
                    if bits[k] != 0:
                        continue
                    b1 = bits[:k] + (1,) + bits[k + 1 :]
                    ur0, ui0 = subs_re[bits], subs_im[bits]
                    ur1, ui1 = subs_re[b1], subs_im[b1]
                    subs_re[bits] = s * (ur0 + ur1)
                    subs_im[bits] = s * (ui0 + ui1)
                    tre = s * (ur0 - ur1)
                    tim = s * (ui0 - ui1)
                    if l > M:
                        pc, ps = stage_phase(b1)
                        subs_re[b1] = tre * pc - tim * ps
                        subs_im[b1] = tre * ps + tim * pc
                    else:
                        subs_re[b1], subs_im[b1] = tre, tim
            else:
                for bits in product((0, 1), repeat=m):
                    xr, xi = subs_re[bits], subs_im[bits]
                    pr, bit1 = roll_pair(xr, l)
                    pi, _ = roll_pair(xi, l)
                    nre = jnp.where(bit1, s * (pr - xr), s * (xr + pr))
                    nim = jnp.where(bit1, s * (pi - xi), s * (xi + pi))
                    if l > M:
                        pc, ps = stage_phase(bits)
                        subs_re[bits] = jnp.where(bit1, nre * pc - nim * ps, nre)
                        subs_im[bits] = jnp.where(bit1, nre * ps + nim * pc, nim)
                    else:
                        subs_re[bits], subs_im[bits] = nre, nim
        elif kind == "lanemat":
            # Composed lane-class (q <= 6) 1q ops as ONE 128x128 MXU matmul
            # per sub-array: out = x @ W^T (see matmul_group_ops).
            ti, real_only = op[1], op[2]
            tab = tables[ti]
            # bf16 storage stages tables as (2 hi/lo, 2 re/im, n, n) bf16.
            wrt = (tab[0, 0], tab[1, 0]) if store_bf16 else tab[0]
            for bits in product((0, 1), repeat=m):
                xr, xi = subs_re[bits], subs_im[bits]
                if real_only:
                    subs_re[bits] = mxu_dot(xr, wrt)
                    subs_im[bits] = mxu_dot(xi, wrt)
                else:
                    wit = (tab[0, 1], tab[1, 1]) if store_bf16 else tab[1]
                    subs_re[bits] = mxu_dot(xr, wrt) - mxu_dot(xi, wit)
                    subs_im[bits] = mxu_dot(xr, wit) + mxu_dot(xi, wrt)
        elif kind == "rowmat":
            # Composed row-class (7..12) 1q ops as a 64x64 operator on each
            # 64-sublane group: out_g = V @ x_g (W^T operand => V = tab^T).
            ti, real_only = op[1], op[2]
            tab = tables[ti]
            if store_bf16:
                vr = (tab[0, 0].T, tab[1, 0].T)
                vi = None if real_only else (tab[0, 1].T, tab[1, 1].T)
            else:
                vr = tab[0].T
                vi = None if real_only else tab[1].T
            for bits in product((0, 1), repeat=m):
                xr, xi = subs_re[bits], subs_im[bits]
                nre, nim = [], []
                for g2 in range(bi // 64):
                    sl = slice(g2 * 64, (g2 + 1) * 64)
                    xrg, xig = xr[sl], xi[sl]
                    if real_only:
                        nre.append(mxu_dot(xrg, vr, transpose=True))
                        nim.append(mxu_dot(xig, vr, transpose=True))
                    else:
                        nre.append(mxu_dot(xrg, vr, transpose=True) - mxu_dot(xig, vi, transpose=True))
                        nim.append(mxu_dot(xrg, vi, transpose=True) + mxu_dot(xig, vr, transpose=True))
                subs_re[bits] = jnp.concatenate(nre, 0) if len(nre) > 1 else nre[0]
                subs_im[bits] = jnp.concatenate(nim, 0) if len(nim) > 1 else nim[0]
        elif kind == "xtable":
            # Combined lane-cross residual of the iQFT row stages: one
            # elementwise complex multiply by a (64, 128) phase table that
            # tiles over 64-sublane groups (row6 = row index mod 64).
            ti = op[1]
            tab = tables[ti]
            pc64, ps64 = tab[0], tab[1]  # (64, 128)
            reps = bi // 64
            for bits in product((0, 1), repeat=m):
                xr = subs_re[bits].reshape(reps, 64, LANE)
                xi = subs_im[bits].reshape(reps, 64, LANE)
                nre = xr * pc64[None] - xi * ps64[None]
                nim = xr * ps64[None] + xi * pc64[None]
                subs_re[bits] = nre.reshape(bi, LANE)
                subs_im[bits] = nim.reshape(bi, LANE)
        elif kind == "camodc_k":
            # Controlled modular multiply as a Benes network: a palindrome of
            # conditional pair exchanges over the M-register bits, gated by
            # this op's precomputed stage masks AND the control bit.
            c_q, stage_bits, ti = op[1], op[2], op[3]
            tab_ref = tables[ti]  # (S, 64, 128) f32 of 0/1, tiles over rows
            reps = bi // 64
            for bits in product((0, 1), repeat=m):
                ctrl = get_bit(c_q, bits)
                if isinstance(ctrl, int) and ctrl == 0:
                    continue  # identity on this sub-array
                xr, xi = subs_re[bits], subs_im[bits]
                if isinstance(ctrl, int):
                    gate = None  # statically on
                else:
                    gate = ctrl == 1
                for si, b in enumerate(stage_bits):
                    mask64 = tab_ref[si]
                    mask = (
                        jnp.broadcast_to(mask64[None], (reps, 64, LANE)).reshape(bi, LANE)
                        if reps > 1
                        else mask64
                    )
                    cond = mask > 0.5
                    if gate is not None:
                        cond = jnp.logical_and(cond, gate)
                    pr, _ = roll_pair(xr, b)
                    pi_, _ = roll_pair(xi, b)
                    xr = jnp.where(cond, pr, xr)
                    xi = jnp.where(cond, pi_, xi)
                subs_re[bits], subs_im[bits] = xr, xi
        else:  # pragma: no cover
            raise ValueError(f"unknown fused op {op}")


def _fused_kernel(*refs, ops, lay: _Layout, M: int, n_tables: int = 0):
    re_ref, im_ref = refs[0], refs[1]
    tables = refs[2 : 2 + n_tables]
    ore_ref, oim_ref = refs[2 + n_tables], refs[3 + n_tables]
    m = lay.m
    bi = lay.bi
    row_pid = pl.program_id(m)  # grid = (gaps..., row_block)
    shape_subs = (2,) * m + (bi, LANE)
    store_dtype = re_ref.dtype
    # bf16 ("complex32") is STORAGE-only: tiles upcast to f32 on load, gate
    # arithmetic runs at f32, and the result rounds to bf16 at the HBM
    # store.  Exception: lanemat/rowmat groups re-cast their activations to
    # bf16 for the native-MXU dots (see mxu_dot), so a segment with k
    # matmul groups incurs k extra ~2^-8-relative roundings on top of the
    # per-pass storage rounding.
    dtype = jnp.float32 if store_dtype == jnp.bfloat16 else store_dtype
    xre = re_ref[...].astype(dtype).reshape(shape_subs)
    xim = im_ref[...].astype(dtype).reshape(shape_subs)
    subs_re = {bits: xre[bits] for bits in product((0, 1), repeat=m)}
    subs_im = {bits: xim[bits] for bits in product((0, 1), repeat=m)}

    _apply_ops_to_subs(
        subs_re, subs_im, ops, lay, M, dtype, row_pid, tables,
        store_bf16=(store_dtype == jnp.bfloat16),
    )

    def assemble(subs):
        def build(prefix):
            if len(prefix) == m:
                return subs[prefix]
            return jnp.stack([build(prefix + (0,)), build(prefix + (1,))])

        return build(()).reshape(lay.block).astype(store_dtype)

    ore_ref[...] = assemble(subs_re)
    oim_ref[...] = assemble(subs_im)


# Per-segment table-operand budget.  Mask + matmul tables are simultaneous
# full-shape VMEM operands of one pallas_call; a generic circuit that
# interleaves dense lane ops with chain-flushing ops (e.g. repeated
# [H(lane), CZ(axis, lane)]) emits one ~128 KB lanemat per flush with no
# bound from the planner (MAX_CAMODC_PER_SEGMENT caps only Benes tables).
# Over budget, the segment splits in half recursively — two HBM passes
# instead of a Mosaic scoped-VMEM compile failure.  10 MB leaves the
# kernel's own block buffers comfortable headroom in 16 MB VMEM.
MAX_SEGMENT_TABLE_BYTES = 10 << 20


def _segment_table_bytes(ops, M: int) -> int:
    """Actual table bytes apply_fused would stage for `ops` (runs the same
    host-side grouping; cheap — numpy on <=128x128 matrices)."""
    total = 0
    kops = []
    for op in ops:
        if op[0] == "camodc":
            total += (2 * M - 1) * 64 * LANE * 4  # Benes masks at 64-row tiling
            kops.append(("camodc_k", op[1], (), 0))
        else:
            kops.append(op)
    _, mats = matmul_group_ops(tuple(kops), M)
    total += sum(t.nbytes for t in mats)
    return total


def apply_fused(re: jax.Array, im: jax.Array, ops: tuple, axes: tuple, n: int, M: int):
    """One fused pass applying `ops` (with exposed `axes`) to the planes."""
    if len(ops) > 1 and _segment_table_bytes(ops, M) > MAX_SEGMENT_TABLE_BYTES:
        mid = len(ops) // 2
        re, im = apply_fused(re, im, ops[:mid], axes, n, M)
        return apply_fused(re, im, ops[mid:], axes, n, M)
    lay = _Layout(n, axes)
    view = lay.view
    spec = lay.spec()
    # Materialize Benes mask tables for any oracle ops (constant operands,
    # loaded into VMEM once — the index map never changes across the grid).
    tables = []
    table_specs = []
    kops = []
    for op in ops:
        if op[0] == "camodc":
            assert lay.bi % 64 == 0, "Benes oracle requires 64-row-aligned blocks"
            # The mask table always tiles at 64 rows (64*128 = 2^13 >= 2^M
            # covers a whole period); the kernel broadcasts it over larger
            # blocks — a bi-sized table at bi=2048 would be ~26 MB of VMEM.
            stage_bits, tab = _camodc_table(op[2], op[3], M, 64)
            kops.append(("camodc_k", op[1], stage_bits, len(tables)))
            # Mask tables stay f32 under bf16 storage (the kernel computes
            # at f32; table dtype is independent of the plane dtype).
            tables.append(jnp.asarray(tab, jnp.float32 if re.dtype == jnp.bfloat16 else re.dtype))
            table_specs.append(
                pl.BlockSpec(tab.shape, lambda *p: (0, 0, 0), memory_space=pltpu.VMEM)
            )
        else:
            kops.append(op)
    # Compose lane/row 1q chains into MXU matmuls.  f32 planes stage the
    # matrices as f32 operands (HIGHEST-precision dots); bf16 storage
    # stages each matmul table as a hi+lo bf16 split (~2^-17 residual on
    # the table) — shape (2 hi/lo, 2 re/im, n, n) — so the kernel runs two
    # native-MXU bf16 dots per product.  xtable phase tables stay f32 in
    # both modes.
    if re.dtype in (jnp.float32, jnp.bfloat16):
        grouped, mats = matmul_group_ops(tuple(kops), M)
        off = len(tables)
        kops = [
            (op[0], op[1] + off) + op[2:] if op[0] in ("lanemat", "rowmat", "xtable") else op
            for op in grouped
        ]
        matmul_idx = {
            op[1] - off for op in kops if op[0] in ("lanemat", "rowmat")
        }
        for i, tab in enumerate(mats):
            if re.dtype == jnp.bfloat16 and i in matmul_idx:
                import ml_dtypes

                hi = tab.astype(ml_dtypes.bfloat16)
                lo = (tab - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
                staged = jnp.asarray(np.stack([hi, lo]))
            else:
                staged = jnp.asarray(tab)
            tables.append(staged)
            table_specs.append(
                pl.BlockSpec(
                    staged.shape,
                    (lambda nd: lambda *p: (0,) * nd)(staged.ndim),
                    memory_space=pltpu.VMEM,
                )
            )
    kernel = partial(_fused_kernel, ops=tuple(kops), lay=lay, M=M, n_tables=len(tables))
    ore, oim = pl.pallas_call(
        kernel,
        grid=lay.grid,
        in_specs=[spec, spec] + table_specs,
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(view, re.dtype),
            jax.ShapeDtypeStruct(view, im.dtype),
        ),
        input_output_aliases={0: 0, 1: 1},
        interpret=_interpret(),
    )(re.reshape(view), im.reshape(view), *tables)
    return ore.reshape(re.shape), oim.reshape(im.shape)


def apply_segment(state: jax.Array, ops: tuple, axes: tuple, M: int) -> jax.Array:
    """Apply one fused segment to a (traced) complex state."""
    n = int(state.shape[0]).bit_length() - 1
    re = jnp.real(state)
    im = jnp.imag(state)
    ore, oim = apply_fused(re, im, ops, axes, n, M)
    return jax.lax.complex(ore, oim)
