"""Pallas TPU kernels: the native gate-application engine (single-gate API).

The reference's one native component is its gate engine — O(4^N) sparse
matrix builds + COO SpMV (qc_shor.c:370-690).  These entry points are its
TPU-native replacement (SURVEY.md §2, "Native-component obligation"):
single-pass strided butterflies on the planar state, with the inverse-QFT
stage (Hadamard + full controlled-phase ladder) fused into ONE HBM pass.

Since round 2, single gates execute through the SAME kernel geometry as the
multi-gate planner (ops/pallas_fused.py: view (..gaps.., 2, .., bi, 128),
m-dependent ~2 MB blocks) — a one-op fused segment.  This matters beyond
code reuse: all gate and oracle kernels now share a bitcast-compatible
physical layout (last dim exactly 128 lanes, second-minor a multiple of 8
sublanes), so the reshapes between consecutive passes are free.  The old
single-gate kernels used a 1024-lane row view whose XLA:TPU tiling
LINEARIZES DIFFERENTLY — every transition between the two families forced
a full-state relayout copy, measured at n=29 on v5e as 655 -> 333 GB/s for
alternating-view gate sequences.

All kernels run in interpret mode off-TPU so the same code path is
differential-tested on CPU against the XLA ops (tests/test_pallas.py).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from quantumcomputer_tpu.models.circuit import DENSE_1Q, Gate, gate_matrix_1q

LANE = 128

_SQRT1_2 = 1.0 / math.sqrt(2.0)


def _min_n_for_pallas() -> int:
    return 13  # need >= 64 sublane rows of 128 lanes; below this XLA is instant


def _fused_axes(q: int):
    from quantumcomputer_tpu.ops import pallas_fused as pf

    return (q,) if q >= pf.AXIS_MIN else ()


def apply_1q_planar(re: jax.Array, im: jax.Array, u: np.ndarray, q: int):
    """Dense 1q gate on planar planes: a one-op fused segment."""
    from quantumcomputer_tpu.ops import pallas_fused as pf

    n = int(re.shape[0]).bit_length() - 1
    uf = tuple(float(v) for v in np.concatenate([u.real.ravel(), u.imag.ravel()]))
    return pf.apply_fused(re, im, (("u1q", q, uf),), _fused_axes(q), n, 0)


def apply_iqft_stage_planar(re: jax.Array, im: jax.Array, l: int, M: int):
    """Fused H(l) + stage-l ladder diagonal (qc_shor.c:678-690), one pass."""
    from quantumcomputer_tpu.ops import pallas_fused as pf

    n = int(re.shape[0]).bit_length() - 1
    return pf.apply_fused(re, im, (("iqft", l),), _fused_axes(l), n, M)


# ---------------------------------------------------------------------------
# Engine dispatch hook.


def try_apply_gate_planes(re: jax.Array, im: jax.Array, g: Gate, M: int):
    """Apply gate g to planar planes via a Pallas kernel, or return None to
    fall back to the XLA ops path.  This is the dtype-complete dispatch:
    f32/f64 planes AND bf16 "complex32" storage (which has no complex
    counterpart) all route here."""
    dim = re.shape[0]
    n = dim.bit_length() - 1
    if n < _min_n_for_pallas():
        return None
    itemsize = jnp.dtype(re.dtype).itemsize
    if g.name in DENSE_1Q:
        u = gate_matrix_1q(g)
        return apply_1q_planar(re, im, u, g.qubits[0])
    if g.name in ("cnot", "swap", "u2q"):
        # Dense 2q as a one-op fused segment (pallas_fused "u2q" kind):
        # both butterflies combine in-VMEM in a single HBM pass (cf. the
        # XLA 4-term roll fallback, ops/gates.apply_2q; reference builds
        # these as full sparse matrices, qc_shor.c:513-565).
        from quantumcomputer_tpu.ops import pallas_fused as pf

        op = pf.gate_to_op(g, M)
        axes = tuple(q for q in (op[1], op[2]) if q >= pf.AXIS_MIN)
        return pf.apply_fused(re, im, (op,), axes, n, M)
    if g.name == "iqft_stage":
        l = g.qubits[0]
        if l == M:  # no ladder; plain H — still one fused pass
            u = np.array([[_SQRT1_2, _SQRT1_2], [_SQRT1_2, -_SQRT1_2]], dtype=np.complex128)
            return apply_1q_planar(re, im, u, l)
        return apply_iqft_stage_planar(re, im, l, M)
    if g.name == "camodc_high":
        C, atox, m_reg = g.meta
        rows = 1 << m_reg
        rest = dim // rows
        if rows >= 8 and rest >= 1024:
            from quantumcomputer_tpu.ops import pallas_oracle

            if pallas_oracle.perm_supported(g.qubits[0], m_reg, n, itemsize):
                # High control (stride >= 32 KB of sub-rows): pure in-place
                # row permutation over the control==1 column half —
                # 0.5R+0.5W.
                return pallas_oracle.apply_camodc_high_perm_planar(
                    re, im, C, atox, g.qubits[0], m_reg
                )
            # Cycle-ordered kernel: 1R+1W in place, any control position
            # (6.3 ms/apply at n=28 on v5e vs 9.8 blocked-mixed).
            return pallas_oracle.apply_camodc_high_cycle_planar(
                re, im, C, atox, g.qubits[0], m_reg
            )
        return None
    if g.name == "camodc_ladder_high":
        from quantumcomputer_tpu.ops import pallas_oracle

        C, m_reg = g.meta[0], g.meta[1]
        if len(g.qubits) == 2 and pallas_oracle.pair_inplace_supported(g.qubits, m_reg, n, itemsize):
            # K=2 composed pass, IN PLACE and 0.75R+0.75W — beats the
            # out-of-place ladder kernel (1R+1W + a second state buffer)
            # whenever both control strides reach the perm threshold.
            return pallas_oracle.apply_camodc_pair_inplace_planar(
                re, im, C, g.meta[2:], g.qubits, m_reg
            )
        if pallas_oracle.ladder_high_supported(g.qubits, m_reg, n, itemsize):
            return pallas_oracle.apply_camodc_ladder_high_planar(
                re, im, C, g.meta[2:], g.qubits, m_reg
            )
        return None
    return None


def try_apply_gate(state: jax.Array, g: Gate, M: int) -> Optional[jax.Array]:
    """Complex-state wrapper over try_apply_gate_planes (f32/f64 planes:
    real/imag and lax.complex are free — XLA stores complex as planes)."""
    out = try_apply_gate_planes(jnp.real(state), jnp.imag(state), g, M)
    if out is None:
        return None
    return jax.lax.complex(*out)
