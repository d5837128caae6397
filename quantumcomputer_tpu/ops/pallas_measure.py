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
BLOCK = BLOCK_ROWS * LANE  # elements per block (floor; grows with state size)
MAX_BLOCKS = 1024  # cap on the number of block sums: the (nblocks, 1)
                   # reduction output is SMEM-padded to 512 B per scalar on
                   # TPU, so unbounded nblocks blows the 1 MB SMEM window at
                   # n>=30; larger blocks keep the output tiny instead.
TILE_ROWS = 2048   # VMEM tile height: blocks larger than this accumulate
                   # over an inner grid dimension (bounds double-buffered
                   # VMEM at 2 x 2 planes x 1 MB).


def _block_geom(dim: int) -> tuple:
    """(block_rows, block) for a state of `dim` amplitudes: BLOCK_ROWS for
    small states, scaled up so nblocks <= MAX_BLOCKS for large ones.

    Index-width bound: the samplers compute start = block_index * block and
    start + local in int32, which fits EXACTLY up to dim = 2^31 (largest
    index 2^31 - 1 = int32 max); beyond that the arithmetic would wrap
    silently, so it is an explicit error (tests/test_index_width.py)."""
    if dim > (1 << 31):
        raise ValueError(
            f"dim = 2^{dim.bit_length() - 1} exceeds the int32 index budget "
            "(2^31) of the hierarchical sampler; shard the state instead"
        )
    rows = dim // LANE
    block_rows = max(BLOCK_ROWS, rows // MAX_BLOCKS)
    return block_rows, block_rows * LANE


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _acc_dtype(rdtype):
    """Accumulation dtype: probabilities from bf16 planes sum in f32 (a
    bf16 accumulator loses the sum entirely); f32/f64 accumulate as-is."""
    return jnp.float32 if jnp.dtype(rdtype) == jnp.bfloat16 else jnp.dtype(rdtype)


def _block_sums_kernel(re_ref, im_ref, out_ref):
    # out_ref maps the FULL (nblocks, 1) array every grid step (TPU block
    # shapes must be (8,128)-divisible or whole-array); each program
    # accumulates into its own element across the inner tile dimension.
    b = pl.program_id(0)

    @pl.when(pl.program_id(1) == 0)
    def _():
        out_ref[b, 0] = 0.0

    xre = re_ref[...].astype(out_ref.dtype)
    xim = im_ref[...].astype(out_ref.dtype)
    out_ref[b, 0] += jnp.sum(xre * xre + xim * xim)


def block_prob_sums_planes(re: jax.Array, im: jax.Array) -> jax.Array:
    """Per-block sums of |amp|^2 from separate planes: one fused pass,
    output (dim/BLOCK,).  The plane-based entry point avoids ever stacking
    a (2, dim) planar array — stacking is a full-state copy under the TPU
    (2,128) tiling, which matters at the single-chip memory ceiling."""
    dim = re.shape[-1]
    block_rows, block = _block_geom(dim)
    assert dim % block == 0, "state too small for the pallas measurement path"
    rows = dim // LANE
    nblocks = rows // block_rows
    tile_rows = min(block_rows, TILE_ROWS)
    inner = block_rows // tile_rows
    view = (rows, LANE)
    spec = pl.BlockSpec((tile_rows, LANE), lambda b, i: (b * inner + i, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((nblocks, 1), lambda b, i: (0, 0), memory_space=pltpu.SMEM)
    sums = pl.pallas_call(
        _block_sums_kernel,
        grid=(nblocks, inner),
        in_specs=[spec, spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nblocks, 1), _acc_dtype(re.dtype)),
        interpret=_interpret(),
    )(re.reshape(view), im.reshape(view))
    return sums[:, 0]


def block_prob_sums(planar: jax.Array) -> jax.Array:
    """Per-block sums of |amp|^2 from a planar state (wrapper)."""
    return block_prob_sums_planes(planar[0], planar[1])


def sample_indices_planes(re: jax.Array, im: jax.Array, rs: jax.Array) -> jax.Array:
    """Batched hierarchical inverse-CDF sampling: `rs` uniform draws in
    [0, 1) -> basis indices, WITHOUT materializing the full probability
    vector or its cumsum (one fused block-sum pass + per-shot work bounded
    by one block).

    The shot batch is CHUNKED so the vmapped per-shot block slices stay
    bounded: blocks grow to dim/MAX_BLOCKS at large n (2^20 elements at
    n=30), and a few hundred vmapped shots would otherwise materialize
    shots x block x ~3 transient buffers — GiB of peak memory at exactly
    the ceiling this path serves (advisor r2).  Chunks hold the transient
    at ~3 x 32 MB regardless of shots."""
    sums = block_prob_sums_planes(re, im)
    cum = jnp.cumsum(sums)
    total = cum[-1]
    scaled = rs.astype(cum.dtype) * total
    b = jnp.minimum(jnp.searchsorted(cum, scaled, side="left"), sums.shape[0] - 1)
    offset = cum[b] - sums[b]

    _, block = _block_geom(re.shape[-1])

    def local(bi, ri):
        start = bi * block
        acc = _acc_dtype(re.dtype)
        lre = jax.lax.dynamic_slice(re, (start,), (block,)).astype(acc)
        lim = jax.lax.dynamic_slice(im, (start,), (block,)).astype(acc)
        cs = jnp.cumsum(lre * lre + lim * lim)
        li = jnp.minimum(jnp.searchsorted(cs, ri, side="left"), block - 1)
        return start + li

    shots = rs.shape[0]
    chunk = max(1, min(shots, (1 << 23) // block))  # ~8M sliced elements/chunk
    if chunk >= shots:
        return jax.vmap(local)(b, scaled - offset)
    k = -(-shots // chunk)
    pad = k * chunk - shots
    bp = jnp.pad(b, (0, pad))
    rp = jnp.pad(scaled - offset, (0, pad))
    out = jax.lax.map(
        lambda args: jax.vmap(local)(*args),
        (bp.reshape(k, chunk), rp.reshape(k, chunk)),
    )
    return out.reshape(-1)[:shots]


def sample_indices(planar: jax.Array, rs: jax.Array) -> jax.Array:
    return sample_indices_planes(planar[0], planar[1], rs)


def sample_index_planes(re: jax.Array, im: jax.Array, r: jax.Array) -> jax.Array:
    """Hierarchical inverse-CDF sample from separate planes (traced).

    The draw is scaled by the total probability, matching the batched
    sampler above: for a bf16 state whose |amp|^2 total drifts below 1,
    an unscaled draw in (total, 1) would fall through to the LAST basis
    index with the excess probability — the two samplers must agree."""
    sums = block_prob_sums_planes(re, im)
    cum = jnp.cumsum(sums)
    scaled = r.astype(cum.dtype) * cum[-1]
    b = jnp.minimum(jnp.searchsorted(cum, scaled, side="left"), sums.shape[0] - 1)
    offset = cum[b] - sums[b]
    # local scan within the picked block
    _, block = _block_geom(re.shape[-1])
    start = b * block
    acc = _acc_dtype(re.dtype)
    lre = jax.lax.dynamic_slice(re, (start,), (block,)).astype(acc)
    lim = jax.lax.dynamic_slice(im, (start,), (block,)).astype(acc)
    local = jnp.cumsum(lre * lre + lim * lim)
    li = jnp.minimum(jnp.searchsorted(local, (scaled - offset).astype(local.dtype), side="left"), block - 1)
    return start + li


def sample_index(planar: jax.Array, r: jax.Array) -> jax.Array:
    """Hierarchical inverse-CDF sample from a planar state (wrapper)."""
    return sample_index_planes(planar[0], planar[1], r)
