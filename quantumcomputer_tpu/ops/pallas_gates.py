"""Pallas TPU kernels: the native gate-application engine.

The reference's one native component is its gate engine — O(4^N) sparse
matrix builds + COO SpMV (qc_shor.c:370-690).  These kernels are its
TPU-native replacement (SURVEY.md §2, "Native-component obligation"):
single-pass strided butterflies on the planar state, with the inverse-QFT
stage (Hadamard + full controlled-phase ladder) fused into ONE HBM pass.

Layout rules (XLA:TPU pads a materialized array's last two dims to (8, 128)
tiles in HBM — shapes with tiny minor dims explode memory, so every kernel
operand keeps minor dims >= (8, 128)):

  * q <= log2(W)-1 (W = 1024-wide rows): the butterfly partner lives in the
    same row at offset ±2^q.  Setting bit q of an in-row index never
    carries, so a circular pltpu.roll moves every partner into place and
    wrapped lanes are never selected.  View: (dim/W, W).
  * q >= 10: view (outer, 2, 2^(q-7), 128) — the butterfly pair axis
    becomes a *leading* block dimension, each block (1, 2, BI, 128) holds
    both halves, every element read and written exactly once.

iQFT stage fusion.  The stage-l ladder diagonal has angle
theta(i) = pi * (i & mask) / 2^l on the bit-l==1 half (see
ops/gates.iqft_stage_phases).  Row (i >> 7) and lane (i & 127) bit fields
are disjoint, so theta is additive and the phase factorizes
phase(i) = rowphase[i >> 7] * lanephase[i & 127].  Both factors are
computed *in-kernel* from iotas of shape (BI, 1) and (1, 128) — a few
vregs of transcendentals per block, no table operands, no extra HBM
traffic.

All kernels run in interpret mode off-TPU so the same code path is
differential-tested on CPU against the XLA ops (tests/test_pallas.py).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantumcomputer_tpu.models.circuit import DENSE_1Q, Gate, gate_matrix_1q

LANE = 128
ROW_W = 1024          # row width for the roll kernels
MAX_BLOCK_ROWS = 256  # sublane rows per block (f32 tile: multiples of 8)

_SQRT1_2 = 1.0 / math.sqrt(2.0)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _min_n_for_pallas() -> int:
    return 13  # need dim/ROW_W >= 8 rows; below this XLA is instant anyway


# ---------------------------------------------------------------------------
# 1-qubit dense gate, low/mid target (2^(q+1) <= ROW_W): in-row lane roll.


def _kernel_1q_roll(re_ref, im_ref, ore_ref, oim_ref, *, u: np.ndarray, q: int, real_only: bool):
    s = 1 << q
    w = re_ref.shape[-1]
    xre = re_ref[...]
    xim = im_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    bit1 = ((lane >> q) & 1) == 1
    # Partner for bit==0 lanes sits at +s (circular roll by w-s brings it
    # here); for bit==1 at -s (roll by +s).  No carry => wraps never selected.
    pre = jnp.where(bit1, pltpu.roll(xre, s, 1), pltpu.roll(xre, w - s, 1))
    pim = jnp.where(bit1, pltpu.roll(xim, s, 1), pltpu.roll(xim, w - s, 1))
    diag_r = jnp.where(bit1, float(u[1, 1].real), float(u[0, 0].real)).astype(xre.dtype)
    off_r = jnp.where(bit1, float(u[1, 0].real), float(u[0, 1].real)).astype(xre.dtype)
    if real_only:
        ore_ref[...] = diag_r * xre + off_r * pre
        oim_ref[...] = diag_r * xim + off_r * pim
    else:
        diag_i = jnp.where(bit1, float(u[1, 1].imag), float(u[0, 0].imag)).astype(xre.dtype)
        off_i = jnp.where(bit1, float(u[1, 0].imag), float(u[0, 1].imag)).astype(xre.dtype)
        ore_ref[...] = (diag_r * xre - diag_i * xim) + (off_r * pre - off_i * pim)
        oim_ref[...] = (diag_r * xim + diag_i * xre) + (off_r * pim + off_i * pre)


# ---------------------------------------------------------------------------
# 1-qubit dense gate, high target (q >= 10): leading pair-axis view.


def _kernel_1q_pair(re_ref, im_ref, ore_ref, oim_ref, *, u: np.ndarray, real_only: bool):
    u00r, u01r, u10r, u11r = (float(u[i, j].real) for i in (0, 1) for j in (0, 1))
    u00i, u01i, u10i, u11i = (float(u[i, j].imag) for i in (0, 1) for j in (0, 1))
    xre0 = re_ref[0, 0]
    xre1 = re_ref[0, 1]
    xim0 = im_ref[0, 0]
    xim1 = im_ref[0, 1]
    if real_only:
        ore_ref[0, 0] = u00r * xre0 + u01r * xre1
        oim_ref[0, 0] = u00r * xim0 + u01r * xim1
        ore_ref[0, 1] = u10r * xre0 + u11r * xre1
        oim_ref[0, 1] = u10r * xim0 + u11r * xim1
    else:
        ore_ref[0, 0] = (u00r * xre0 - u00i * xim0) + (u01r * xre1 - u01i * xim1)
        oim_ref[0, 0] = (u00r * xim0 + u00i * xre0) + (u01r * xim1 + u01i * xre1)
        ore_ref[0, 1] = (u10r * xre0 - u10i * xim0) + (u11r * xre1 - u11i * xim1)
        oim_ref[0, 1] = (u10r * xim0 + u10i * xre0) + (u11r * xim1 + u11i * xre1)


def _roll_call(kernel, re: jax.Array, im: jax.Array):
    dim = re.shape[0]
    rows = dim // ROW_W
    br = min(rows, MAX_BLOCK_ROWS)
    view = (rows, ROW_W)
    spec = pl.BlockSpec((br, ROW_W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ore, oim = pl.pallas_call(
        kernel,
        grid=(rows // br,),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(view, re.dtype),
            jax.ShapeDtypeStruct(view, im.dtype),
        ),
        input_output_aliases={0: 0, 1: 1},
        interpret=_interpret(),
    )(re.reshape(view), im.reshape(view))
    return ore.reshape(dim), oim.reshape(dim)


def _pair_call(kernel, re: jax.Array, im: jax.Array, q: int, extra_grid_kernel=None):
    dim = re.shape[0]
    ir = 1 << (q - 7)
    outer = dim // (2 * ir * LANE)
    bi = min(ir, MAX_BLOCK_ROWS)
    view = (outer, 2, ir, LANE)
    spec = pl.BlockSpec((1, 2, bi, LANE), lambda o, i: (o, 0, i, 0), memory_space=pltpu.VMEM)
    ore, oim = pl.pallas_call(
        kernel,
        grid=(outer, ir // bi),
        in_specs=[spec, spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(view, re.dtype),
            jax.ShapeDtypeStruct(view, im.dtype),
        ),
        input_output_aliases={0: 0, 1: 1},
        interpret=_interpret(),
    )(re.reshape(view), im.reshape(view))
    return ore.reshape(dim), oim.reshape(dim)


def apply_1q_planar(re: jax.Array, im: jax.Array, u: np.ndarray, q: int):
    """Dense 1q gate on planar planes; picks the roll or pair-axis kernel."""
    real_only = bool(np.all(np.abs(u.imag) < 1e-300))
    if (1 << (q + 1)) <= ROW_W:
        return _roll_call(partial(_kernel_1q_roll, u=u, q=q, real_only=real_only), re, im)
    return _pair_call(partial(_kernel_1q_pair, u=u, real_only=real_only), re, im, q)


# ---------------------------------------------------------------------------
# Fused inverse-QFT stage: H(l) butterfly + full ladder diagonal, one pass.


def _kernel_iqft_roll(re_ref, im_ref, ore_ref, oim_ref, *, l: int, M: int):
    s = _SQRT1_2
    sl = 1 << l
    w = re_ref.shape[-1]
    xre = re_ref[...]
    xim = im_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    bit1 = ((lane >> l) & 1) == 1
    pre = jnp.where(bit1, pltpu.roll(xre, sl, 1), pltpu.roll(xre, w - sl, 1))
    pim = jnp.where(bit1, pltpu.roll(xim, sl, 1), pltpu.roll(xim, w - sl, 1))
    # H butterfly: bit0 half gets s*(x + partner); bit1 half s*(partner - x).
    nre = jnp.where(bit1, s * (pre - xre), s * (xre + pre))
    nim = jnp.where(bit1, s * (pim - xim), s * (xim + pim))
    # Ladder phase on bit-l==1 lanes; all ladder bits [M, l) are in-row.
    mask = (1 << l) - (1 << M)
    theta = (lane & mask).astype(xre.dtype) * (math.pi / float(sl))
    pc = jnp.cos(theta)
    ps = jnp.sin(theta)
    ore_ref[...] = jnp.where(bit1, nre * pc - nim * ps, nre)
    oim_ref[...] = jnp.where(bit1, nre * ps + nim * pc, nim)


def _kernel_iqft_pair(re_ref, im_ref, ore_ref, oim_ref, *, l: int, M: int, bi: int):
    s = _SQRT1_2
    ure = re_ref[0, 0]
    vre = re_ref[0, 1]
    uim = im_ref[0, 0]
    vim = im_ref[0, 1]
    nre0 = s * (ure + vre)
    nim0 = s * (uim + vim)
    tre = s * (ure - vre)
    tim = s * (uim - vim)
    # Ladder phase, (row x lane)-factorized, computed in-kernel from iotas.
    mask = (1 << l) - (1 << M)
    inv = math.pi / float(1 << l)
    row0 = pl.program_id(1) * bi
    r = (jax.lax.broadcasted_iota(jnp.int32, (bi, 1), 0) + row0) << 7
    c = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    tr = (r & mask).astype(ure.dtype) * inv
    tc = (c & mask).astype(ure.dtype) * inv
    rc, rs = jnp.cos(tr), jnp.sin(tr)
    lc, ls = jnp.cos(tc), jnp.sin(tc)
    pc = rc * lc - rs * ls
    ps = rc * ls + rs * lc
    ore_ref[0, 0] = nre0
    oim_ref[0, 0] = nim0
    ore_ref[0, 1] = tre * pc - tim * ps
    oim_ref[0, 1] = tre * ps + tim * pc


def apply_iqft_stage_planar(re: jax.Array, im: jax.Array, l: int, M: int):
    """Fused H(l) + stage-l ladder diagonal (qc_shor.c:678-690), one pass."""
    if (1 << (l + 1)) <= ROW_W:
        return _roll_call(partial(_kernel_iqft_roll, l=l, M=M), re, im)
    dim = re.shape[0]
    ir = 1 << (l - 7)
    bi = min(ir, MAX_BLOCK_ROWS)
    return _pair_call(partial(_kernel_iqft_pair, l=l, M=M, bi=bi), re, im, l)


# ---------------------------------------------------------------------------
# Engine dispatch hook.


def try_apply_gate(state: jax.Array, g: Gate, M: int) -> Optional[jax.Array]:
    """Apply gate g to a (traced) complex state via a Pallas kernel, or
    return None to fall back to the XLA ops path."""
    dim = state.shape[0]
    n = dim.bit_length() - 1
    if n < _min_n_for_pallas():
        return None
    re = jnp.real(state)
    im = jnp.imag(state)
    if g.name in DENSE_1Q:
        u = gate_matrix_1q(g)
        ore, oim = apply_1q_planar(re, im, u, g.qubits[0])
        return jax.lax.complex(ore, oim)
    if g.name == "iqft_stage":
        l = g.qubits[0]
        if l == M:  # no ladder; plain H — still one fused pass
            u = np.array([[_SQRT1_2, _SQRT1_2], [_SQRT1_2, -_SQRT1_2]], dtype=np.complex128)
            ore, oim = apply_1q_planar(re, im, u, l)
        else:
            ore, oim = apply_iqft_stage_planar(re, im, l, M)
        return jax.lax.complex(ore, oim)
    if g.name == "camodc_high":
        C, atox, m_reg = g.meta
        rows = 1 << m_reg
        rest = dim // rows
        if rows >= 8 and rest >= 1024:
            from quantumcomputer_tpu.ops import pallas_oracle

            ore, oim = pallas_oracle.apply_camodc_high_planar(re, im, C, atox, g.qubits[0], m_reg)
            return jax.lax.complex(ore, oim)
        return None
    return None
