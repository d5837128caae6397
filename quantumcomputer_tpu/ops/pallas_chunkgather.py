"""Double-buffered Pallas chunk gather: W-wide slices at arbitrary
element offsets, streamed at DMA rates.

The structured modular permutation (ops/modperm.py) reduces the
semiclassical oracle's j -> (a_inv*j) mod C to transposes plus W-wide
contiguous slices at computed offsets.  XLA realizes those slices as
vmapped lax.dynamic_slice, measured at 21 GB/s (W=2048) to ~61 GB/s
(W=16384) on a v5e — an order of magnitude under the ~650 GB/s streaming
rate, and after the Pallas tiled transpose (~515 GB/s) they are the
remaining cost of a semiclassical step (docs/PERF.md).

This kernel issues the slices as scalar-prefetched HBM->VMEM DMAs,
double-buffered so chunk i+1's copy overlaps chunk i's realignment
(single-buffered measured ~148 GB/s — the DMA latency serializes;
scripts/prof_chunkgather.py).  Offsets are arbitrary ELEMENTS: the DMA
lands at 128-element row granularity and the sub-row offset is realigned
in-register with a dynamic LANE roll (exact on v5e; dynamic SUBLANE rolls
mis-lower — measured wrong results — which is why the DMA is row-granular
and the only in-register shift is along lanes).

Two entry points:
  chunk_gather(x, starts, W)            out[b, c, e] = x[b, starts[c] + e]
  chunk_gather_blend(x, s0, s1, istar, W)
      out[b, c, e] = x[b, s0[c] + e] if e < istar[c] else x[b, s1[c] + e]

The blend form serves the deal leg of ops/modperm.py, whose every output
chunk is two slices split at the single mod-C wrap point; the plain form
serves the collect leg's row gathers, and with identity offsets it is the
repo's honest streaming-floor probe (a pure double-buffered copy with the
same block structure as the production kernels — bench.py's
`pallas_copy` metric).

Reference anchor: this movement realizes the same controlled
modular-multiply permutation as the reference's explicit permutation
matrix + SpMV (qc_shor.c:595-660, :370-420), for the semiclassical
work-register regime.

Contract (asserted in the wrappers):
  * x is (B, P) with P % 128 == 0; starts are int32 in [0, P - W]
    (P < 2^31 so flat offsets stay int32);
  * W % 128 == 0; for the blend form istar in [0, W];
  * out is (B, NC, W), NC = len(starts).

Safety at the array tail: the DMA window is WR+1 rows from
min(start >> 7, T - WR - 1).  start <= P - W gives row0 <= T - WR, and
row0 == T - WR forces start % 128 == 0 — so the clamp distance d is 0 or
1, and d == 1 only with lane offset 0, handled by a two-way static
select (no dynamic sublane shift anywhere).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _extract(slab, s, lane, *, T: int, WR: int):
    """Realign one (WR+1, LANE) slab DMA'd from row min(s>>7, T-WR-1) into
    the W elements starting at flat offset s (module docstring contract)."""
    row0 = jnp.minimum(s >> 7, T - WR - 1)
    d = (s >> 7) - row0  # 0, or 1 with s % 128 == 0 (tail clamp)
    r = s & 127
    rot = pltpu.roll(slab, -r, 1)  # lane r -> lane 0, per row
    g = jnp.where(lane < LANE - r, rot[:WR], rot[1 : WR + 1])
    return jnp.where(d == 0, g, slab[1 : WR + 1])


def _gather_kernel(
    *args, T: int, WR: int, NC: int, B: int, nsrc: int, nbuf: int,
    affine=None, T2=None,
):
    if T2 is not None:
        # Two-INPUT single-slab form: each chunk is one straight read
        # from either x (flag 0) or the small alternate buffer x2
        # (flag 1) — the collect leg's cyclic boundary chunks read a
        # 2*Wc cyclic-join [x[C-Wc:C] | x[:Wc]] instead of forcing a
        # full cyclically-extended copy of the state.
        s_ref, f_ref, x_any, x2_any, o_ref, slabs, sems = args

        def offsets(j):
            return (s_ref[j],), None

    elif affine is not None:
        # Offsets computed IN KERNEL from the chunk index — the
        # _row_compact law.  At M=28+ the compaction has NC ~ 175-760k
        # chunks; three NC-sized scalar-prefetch arrays exceed SMEM
        # (measured on a v5e: s32[174763] x 3 fails scoped allocation),
        # while this form carries only 4 static ints.  Mosaic lowers
        # scalar s32 div/rem exactly (probed on hardware).
        v, vpad, Wt, P2 = affine
        x_any, o_ref, slabs, sems = args
        # int32 constants: under x64 a bare Python int promotes the
        # scalar arithmetic to int64, which lax.div rejects against the
        # int32 program_id (and Mosaic's scalar core is 32-bit anyway).
        vv, vp = jnp.int32(v), jnp.int32(vpad)
        wt, smax = jnp.int32(Wt), jnp.int32(P2 - Wt)
        zero = jnp.int32(0)

        def offsets(j):
            f0 = j * wt
            q0 = lax.div(f0, vv)
            t0 = f0 - q0 * vv
            ist = jnp.clip(vv - t0, zero, wt)
            s0 = jnp.clip(q0 * vp + t0, zero, smax)
            s1 = jnp.clip((q0 + 1) * vp - ist, zero, smax)
            return (s0, s1), ist

    elif nsrc == 2:
        s0_ref, s1_ref, istar_ref, x_any, o_ref, slabs, sems = args

        def offsets(j):
            return (s0_ref[j], s1_ref[j]), istar_ref[j]

    else:
        (s0_ref, x_any, o_ref, slabs, sems) = args

        def offsets(j):
            return (s0_ref[j],), None

    i = pl.program_id(0)

    def copy(j, slot, k, b, ref=None, rows=None):
        # Clamped into [0, rows-WR-1]: out-of-contract starts (callers
        # that patch boundary chunks afterwards, e.g. the deal leg's
        # shifted row view) stay MEMORY-SAFE; their chunk content is
        # unspecified.
        ref = x_any if ref is None else ref
        rows = T if rows is None else rows
        row0 = jnp.clip(offsets(j)[0][k] >> 7, 0, rows - WR - 1)
        return pltpu.make_async_copy(
            ref.at[b, pl.ds(row0, WR + 1), :],
            slabs.at[slot, k, b],
            sems.at[slot, k, b],
        )

    def start_all(j, slot):
        if T2 is not None:
            # Source chosen per chunk; exactly one start per (j, slot, b)
            # either way, so the unconditional wait below matches (both
            # descriptors move the same byte count into the same slab).
            @pl.when(f_ref[j] == 0)
            def _():
                for b in range(B):
                    copy(j, slot, 0, b).start()

            @pl.when(f_ref[j] != 0)
            def _():
                for b in range(B):
                    copy(j, slot, 0, b, ref=x2_any, rows=T2).start()

            return
        for k in range(nsrc):
            for b in range(B):
                copy(j, slot, k, b).start()

    # Fill the pipeline nbuf deep: chunk j's DMA starts at step
    # max(0, j - nbuf + 1), so up to nbuf chunks are in flight while one
    # is realigned (slot j % nbuf was last consumed at step j - nbuf,
    # strictly before the start at j - nbuf + 1).
    @pl.when(i == 0)
    def _():
        for j in range(min(nbuf - 1, NC)):
            start_all(j, j)

    @pl.when(i + nbuf - 1 < NC)
    def _():
        start_all(i + nbuf - 1, (i + nbuf - 1) % nbuf)

    slot = i % nbuf
    lane = lax.broadcasted_iota(jnp.int32, (WR, LANE), 1)
    for k in range(nsrc):
        for b in range(B):
            copy(i, slot, k, b).wait()
    starts, ist = offsets(i)
    if T2 is not None:
        # The realignment clamp depends on the source's row count, so
        # extract both ways in-register and select by the chunk's flag.
        for b in range(B):
            gm = _extract(slabs[slot, 0, b], starts[0], lane, T=T, WR=WR)
            ga = _extract(slabs[slot, 0, b], starts[0], lane, T=T2, WR=WR)
            o_ref[b, 0] = jnp.where(f_ref[i] != 0, ga, gm)
    elif nsrc == 2:
        e = lax.broadcasted_iota(jnp.int32, (WR, LANE), 0) * LANE + lane
        for b in range(B):
            g0 = _extract(slabs[slot, 0, b], starts[0], lane, T=T, WR=WR)
            g1 = _extract(slabs[slot, 1, b], starts[1], lane, T=T, WR=WR)
            o_ref[b, 0] = jnp.where(e < ist, g0, g1)
    else:
        for b in range(B):
            o_ref[b, 0] = _extract(slabs[slot, 0, b], starts[0], lane, T=T, WR=WR)


# Slab VMEM cap for choosing the pipeline depth: deep enough to hide the
# per-DMA issue latency (2 buffers measured ~250 GB/s, the DMA engine
# needs several outstanding descriptors to stream), small enough to stay
# far inside scoped VMEM next to the output double buffer.
_SLAB_VMEM_BUDGET = 12 << 20


def _pick_nbuf(W: int, nsrc: int, B: int, itemsize: int) -> int:
    slab = nsrc * B * (W + LANE) * itemsize
    return max(2, min(8, _SLAB_VMEM_BUDGET // max(slab, 1)))


def _call(
    x: jax.Array, scalars, W: int, nsrc: int, nbuf=None,
    NC=None, affine=None, x2=None,
) -> jax.Array:
    B, P = x.shape
    if P % LANE or W % LANE or W <= 0:
        raise ValueError(f"P={P} and W={W} must be positive multiples of {LANE}")
    if P >= (1 << 31):
        raise ValueError(f"P={P} exceeds the int32 flat-offset budget")
    T, WR = P // LANE, W // LANE
    if T < WR + 1:
        raise ValueError(f"x too short for W={W}: need P >= W + {LANE}")
    T2 = None
    if x2 is not None:
        B2, P2 = x2.shape
        if B2 != B or P2 % LANE or x2.dtype != x.dtype:
            raise ValueError(f"x2 shape/dtype mismatch: {x2.shape} {x2.dtype}")
        T2 = P2 // LANE
        if T2 < WR + 1:
            raise ValueError(f"x2 too short for W={W}: need P2 >= W + {LANE}")
    if NC is None:
        NC = scalars[0].shape[0]
    if nbuf is None:
        nbuf = _pick_nbuf(W, nsrc, B, jnp.dtype(x.dtype).itemsize)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(NC,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (1 if x2 is None else 2),
        out_specs=pl.BlockSpec(
            (B, 1, WR, LANE), (lambda i, *_: (0, i, 0, 0)) if scalars
            else (lambda i: (0, i, 0, 0))
        ),
        scratch_shapes=[
            pltpu.VMEM((nbuf, nsrc, B, WR + 1, LANE), x.dtype),
            pltpu.SemaphoreType.DMA((nbuf, nsrc, B)),
        ],
    )
    kernel = partial(
        _gather_kernel, T=T, WR=WR, NC=NC, B=B, nsrc=nsrc, nbuf=nbuf,
        affine=affine, T2=T2,
    )
    operands = (*scalars, x.reshape(B, T, LANE))
    if x2 is not None:
        operands = (*operands, x2.reshape(B, T2, LANE))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, NC, WR, LANE), x.dtype),
        interpret=_interpret(),
    )(*operands)
    return out.reshape(B, NC, W)


def chunk_gather(x: jax.Array, starts: jax.Array, W: int, nbuf=None) -> jax.Array:
    """out[b, c, :] = x[b, starts[c] : starts[c] + W] as pipelined DMAs.
    x: (B, P); starts: (NC,) int32 in [0, P - W]; out (B, NC, W)."""
    return _call(x, (starts.astype(jnp.int32),), W, 1, nbuf)


def chunk_gather_src2(
    x: jax.Array, x2: jax.Array, starts: jax.Array, flags: jax.Array,
    W: int, nbuf=None,
) -> jax.Array:
    """out[b, c, :] = src[b, starts[c] : starts[c] + W] where src is x
    when flags[c] == 0 and the (small) alternate buffer x2 otherwise —
    one DMA per chunk from the chosen source.  Lets the collect leg of
    ops/modperm.py read its cyclic wrap chunks from a 2*Wc cyclic-join
    buffer instead of materializing a full cyclically-extended copy of
    the state (a read+write plane pass per step)."""
    return _call(
        x,
        (starts.astype(jnp.int32), flags.astype(jnp.int32)),
        W,
        1,
        nbuf,
        x2=x2,
    )


def chunk_gather_blend(
    x: jax.Array, s0: jax.Array, s1: jax.Array, istar: jax.Array, W: int, nbuf=None
) -> jax.Array:
    """Two-source chunk gather split at a per-chunk element index:

        out[b, c, e] = x[b, s0[c] + e]  if e < istar[c]
                       x[b, s1[c] + e]  otherwise

    (istar in [0, W]).  One output pass, two input DMAs per chunk — the
    deal leg of ops/modperm.py, where every output chunk is a straight
    slice up to the single mod-C wrap and a second slice after it."""
    return _call(
        x,
        (s0.astype(jnp.int32), s1.astype(jnp.int32), istar.astype(jnp.int32)),
        W,
        2,
        nbuf,
    )


def chunk_gather_blend_rowlaw(
    x: jax.Array, NC: int, v: int, vpad: int, Wt: int, nbuf=None
) -> jax.Array:
    """chunk_gather_blend with the row-compaction offset LAW computed in
    kernel from the chunk index (all of v, vpad, Wt static):

        f0 = c*Wt; q0 = f0 // v; t0 = f0 - q0*v
        istar = clip(v - t0, 0, Wt)
        s0 = clip(q0*vpad + t0, 0, P - Wt)      # straight slice
        s1 = clip((q0+1)*vpad - istar, 0, P - Wt)  # next-row wrap

    Exists because the compaction's chunk count NC ~ dim/v reaches
    175k-760k at M=28-30: three NC-sized scalar-prefetch arrays exceed
    SMEM scoped memory (measured failure on a v5e at s32[174763] x 3),
    where this form prefetches nothing.  Serves _row_compact
    (ops/modperm.py); the prefetched blend form remains for the deal
    leg, whose offsets are genuinely data-dependent but whose NC is
    dim/W ~ 16k."""
    return _call(x, (), Wt, 2, nbuf, NC=NC, affine=(v, vpad, Wt, x.shape[1]))
