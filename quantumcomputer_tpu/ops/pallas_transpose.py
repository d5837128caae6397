"""Pallas tiled 2D transpose: the fast-layout primitive XLA lacks.

XLA's transpose of plan-shaped views — (Q, u) with u ~ sqrt(C), not a
multiple of 128 — measures 29-34 GB/s on a v5e even when padded
(scripts/prof_rowperm.py), an order of magnitude off the ~380 GB/s copy
rate.  The structured modular permutation (ops/modperm.py) needs exactly
such transposes on both legs, so they dominate its cost.

This kernel tiles the transpose into (br, bc) VMEM blocks: each program
reads one aligned block, transposes it in-register, and writes the
mirrored block — pure streaming DMA in both directions.  Block defaults
(256, 256) keep 512 KB of VMEM per program (f32, in + out) with room for
double buffering.

The public entry pads to block multiples and slices back; the `_padded`
variant returns the padded result for callers (modperm's legs) whose
index arithmetic can consume a padded row pitch directly and skip the
slice-back relayout pass.

No reference counterpart: the reference's gate path is a build-then-SpMV
over COO matrices (qc_shor.c:370-420) with no layout transforms at all;
this primitive exists for the TPU-side data-movement design.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tr_kernel(x_ref, o_ref):
    o_ref[...] = jnp.swapaxes(x_ref[...], -1, -2)


def _transpose_divisible(
    x: jax.Array, br: int, bc: int, extra_rows: int = 0
) -> jax.Array:
    """(B, R, C) -> (B, C + extra_rows, R) with R % br == 0, C % bc == 0.

    extra_rows > 0 allocates UNWRITTEN trailing output rows (contents
    undefined): modperm's _row_compact needs one pseudo-row past the live
    region purely as DMA slack whose lanes are never selected — allocating
    it here replaces a full-array jnp.pad copy downstream."""
    B, R, C = x.shape
    return pl.pallas_call(
        _tr_kernel,
        grid=(B, R // br, C // bc),
        in_specs=[pl.BlockSpec((1, br, bc), lambda b, i, j: (b, i, j))],
        out_specs=pl.BlockSpec((1, bc, br), lambda b, i, j: (b, j, i)),
        out_shape=jax.ShapeDtypeStruct((B, C + extra_rows, R), x.dtype),
        interpret=_interpret(),
    )(x)


def tiled_transpose_padded(
    x: jax.Array, block: tuple[int, int] = (256, 256), extra_rows: int = 0
) -> jax.Array:
    """Transpose the last two dims, returning the PADDED result.

    x: (..., R, C) -> (..., Cp + extra_rows, Rp) where Rp/Cp round R/C up
    to the block multiples; the valid region is [..., :C, :R] and the
    padding is zero (the extra_rows, if any, are undefined — see
    _transpose_divisible).  Callers that index with an explicit row pitch
    (modperm's legs) use this form to skip the slice-back pass.

    When the input dims are already block multiples the jnp.pad below is
    a no-op; otherwise it materializes a FULL copy of x (measured 5.8 GB
    at the M=28 deal-leg shape) — block-align the feeding arrays.
    """
    br, bc = block
    lead = x.shape[:-2]
    R, C = x.shape[-2:]
    xf = x.reshape((-1, R, C))
    Rp = -(-R // br) * br
    Cp = -(-C // bc) * bc
    if Rp != R or Cp != C:
        xf = jnp.pad(xf, ((0, 0), (0, Rp - R), (0, Cp - C)))
    out = _transpose_divisible(xf, br, bc, extra_rows)
    return out.reshape(lead + (Cp + extra_rows, Rp))


def tiled_transpose(x: jax.Array, block: tuple[int, int] = (256, 256)) -> jax.Array:
    """Transpose the last two dims: (..., R, C) -> (..., C, R).

    Drop-in for jnp.swapaxes(x, -1, -2) at streaming rates on TPU for
    layouts XLA handles badly.  Off-TPU the kernel runs in interpreter
    mode (tests); production CPU callers should prefer jnp.swapaxes.
    """
    R, C = x.shape[-2:]
    out = tiled_transpose_padded(x, block)
    if out.shape[-2:] != (C, R):
        out = out[..., :C, :R]
    return out
