"""Pallas measurement kernel: |amp|^2 block reduction + hierarchical sample.

Replaces the reference's serial O(2^N) cumulative-probability scan
(measure_state, qc_shor.c:272-306) with a two-level inverse-CDF:

  1. ONE fused pass over the planar state computes per-block probability
     sums (|re|^2 + |im|^2 reduced in-kernel — the probability vector is
     never materialized in HBM);
  2. a tiny cumulative scan over the block sums picks the block, a local
     scan inside the picked block picks the element.

Semantics match the reference's convention: smallest index whose cumulative
probability reaches the draw, falling through to the last index.  (With
finite-precision partial sums the hierarchical and flat scans can differ at
knife-edge draws; both are valid inverse-CDF samplers of the same
distribution.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
BLOCK_ROWS = 64
BLOCK = BLOCK_ROWS * LANE  # elements per block


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _block_sums_kernel(re_ref, im_ref, out_ref):
    # out_ref maps the FULL (nblocks, 1) array every grid step (TPU block
    # shapes must be (8,128)-divisible or whole-array); each program writes
    # only its own element.
    xre = re_ref[...]
    xim = im_ref[...]
    out_ref[pl.program_id(0), 0] = jnp.sum(xre * xre + xim * xim)


def block_prob_sums(planar: jax.Array) -> jax.Array:
    """Per-block sums of |amp|^2: one fused pass, output (dim/BLOCK,)."""
    dim = planar.shape[-1]
    assert dim % BLOCK == 0, "state too small for the pallas measurement path"
    rows = dim // LANE
    nblocks = rows // BLOCK_ROWS
    view = (rows, LANE)
    spec = pl.BlockSpec((BLOCK_ROWS, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((nblocks, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    sums = pl.pallas_call(
        _block_sums_kernel,
        grid=(nblocks,),
        in_specs=[spec, spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nblocks, 1), planar.dtype),
        interpret=_interpret(),
    )(planar[0].reshape(view), planar[1].reshape(view))
    return sums[:, 0]


def sample_indices(planar: jax.Array, rs: jax.Array) -> jax.Array:
    """Batched hierarchical inverse-CDF sampling: `rs` uniform draws in
    [0, 1) -> basis indices, WITHOUT materializing the full probability
    vector or its cumsum (one fused block-sum pass + per-shot work bounded
    by one block)."""
    sums = block_prob_sums(planar)
    cum = jnp.cumsum(sums)
    total = cum[-1]
    scaled = rs.astype(cum.dtype) * total
    b = jnp.minimum(jnp.searchsorted(cum, scaled, side="left"), sums.shape[0] - 1)
    offset = cum[b] - sums[b]

    def local(bi, ri):
        start = bi * BLOCK
        re = jax.lax.dynamic_slice(planar[0], (start,), (BLOCK,))
        im = jax.lax.dynamic_slice(planar[1], (start,), (BLOCK,))
        cs = jnp.cumsum(re * re + im * im)
        li = jnp.minimum(jnp.searchsorted(cs, ri, side="left"), BLOCK - 1)
        return start + li

    return jax.vmap(local)(b, scaled - offset)


def sample_index(planar: jax.Array, r: jax.Array) -> jax.Array:
    """Hierarchical inverse-CDF sample from a planar state (traced)."""
    dim = planar.shape[-1]
    sums = block_prob_sums(planar)
    cum = jnp.cumsum(sums)
    b = jnp.minimum(jnp.searchsorted(cum, r.astype(cum.dtype), side="left"), sums.shape[0] - 1)
    offset = cum[b] - sums[b]
    # local scan within the picked block
    start = b * BLOCK
    re = jax.lax.dynamic_slice(planar[0], (start,), (BLOCK,))
    im = jax.lax.dynamic_slice(planar[1], (start,), (BLOCK,))
    local = jnp.cumsum(re * re + im * im)
    li = jnp.minimum(jnp.searchsorted(local, (r - offset).astype(local.dtype), side="left"), BLOCK - 1)
    return start + li
