"""Structured modular-stride permutation: out[j] = x[(m*j) mod C] at
transpose/DMA rates instead of element-gather rates.

The semiclassical oracle (algorithms/semiclassical.py) applies the work
register permutation j -> (a_inv * j) mod C (j < C; identity above — the
reference's index walk, qc_shor.c:595-660).  XLA lowers an element gather
of that map to ~0.6 GB/s on a v5e (measured, PERF.md) — three orders of
magnitude off the 819 GB/s HBM roofline, and the entire cost of a
semiclassical step at large M.

This module applies the SAME permutation with structured data movement
only — reshapes, transposes, and wide contiguous slices, all of which run
at 220-320 GB/s on the same part:

  1. Rational reconstruction (continued fractions of a_inv/C) writes
     a_inv = eps * u * v^{-1} (mod C) with u, v ~ sqrt(C).  Multiplier
     permutations F_m(x)[j] = x[(m*j) mod C] compose multiplicatively
     (F_m1 . F_m2 = F_m1*m2, all commuting), so
         F_a_inv = F_eps . F_u . F_{v^{-1}}.
  2. F_u for SMALL u ("deal" leg): the source index (u*j) mod C, split as
     q*u + t, walks columns of the (ceil(C/u), u) row-major view of x.
     Transposing that view makes every output chunk of W lanes TWO
     contiguous row slices (the mod-C wrap crosses a W-chunk at most once
     when W*u <= C) blended by a lane predicate.
  3. F_{v^{-1}} for SMALL v ("collect" leg): with the output index split
     as q*v + t, out[q*v + t] = x[(j0(t) + q) mod C] where
     j0(t) = (v^{-1} t) mod C — whole contiguous rows from a cyclically
     extended copy of x, then one transpose back to flat order.
  4. F_{-1} is an index reversal (contiguous flip).

Every array op is dtype-agnostic data movement; all index arithmetic runs
in int32 via the shift-add modular multiply (ops/gates.modmul_onchip), so
the path is exact for any C < 2^30 without x64.

C, a_inv, M are STATIC here (compiled per step value); the semiclassical
driver caches programs per (C, a_inv, M, dtype).

TPU layout notes (measured on a v5e, scripts/prof_modperm.py /
prof_rowperm.py / prof_ptranspose.py): XLA lowers the plan-shaped
transposes — (Q, u) with u ~ sqrt(C) not a multiple of 128 — at
29-34 GB/s even padded, and vmapped dynamic slices at 21 GB/s (W=2048) to
~60 GB/s (W=8192), vs 380 GB/s copy and 180 GB/s whole-row gathers.  So
on TPU both legs route their transposes through the Pallas tiled
transpose (ops/pallas_transpose.py) and use the widest chunk the
no-second-wrap invariant allows; element-granular lane shuffles are
avoided entirely (XLA lane rolls and Mosaic dynamic rotates both measured
< 35 GB/s).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from quantumcomputer_tpu.ops.gates import modmul_onchip

# Output-chunk width for the deal leg: wider chunks = fewer, bigger slice
# DMAs (vmapped dynamic-slice throughput roughly doubles per 4x width on
# a v5e: 21 GB/s at 2048, ~61 at 8192) but the no-second-wrap invariant
# needs W*u <= C, so W adapts downward for large u.  On the kernel path
# the pad-free junk-lane view makes the leg's footprint and traffic
# W-independent; on the XLA path the y0 padding the slices need is
# 2*W*u elements, <= 2 extra streamed state passes at the cap.
_MAX_CHUNK = 16384
_MIN_CHUNK = 128

# Collect-leg rows wider than this split into Wc-wide kernel chunks (VMEM
# slab bound on the pipelined gather); rows at or below it DMA whole.
_ROW_W_CAP = 131072
_ROW_SPLIT_W = 32768

# Minimum non-unit split factor accepted on real TPU.  Both factors
# appear as the minor dim of a padded row view, and XLA's generic
# relayout for (N,) <-> (R, f) with f an odd non-lane multiple compiles
# in 10-30 s PER DISTINCT SHAPE with 50-500 GB/s runtime scatter
# (measured, v5e: v=49 -> 32 s compile; v=257..1023 -> 9-15 s) — a
# whole-attempt program pays that per step.  At f >= 256 the row
# expansion/compaction instead runs as pipelined chunk DMAs
# (deal-leg chunk_gather rows/_row_compact: ~1 s compile, DMA-rate
# runtime), so the
# plan policy on TPU is: factors are 1 or >= 256, else fall back to the
# element gather.  Off-TPU (and in interpret-mode tests) the XLA
# reshape is exact and compiles fine, so the floor stays at 32.
_TPU_MIN_FACTOR = 256


def _use_chunk_kernel() -> bool:
    """Route the legs' slice DMAs through the pipelined Pallas chunk
    gather (ops/pallas_chunkgather: ~340-380 GB/s on a v5e vs 21-61 GB/s
    for XLA's vmapped dynamic_slice).  On TPU by default
    (QC_MODPERM_KERNEL=0 restores the XLA slices); off-TPU only when
    QC_MODPERM_KERNEL=1 forces interpret-mode coverage in tests."""
    import os

    flag = os.environ.get("QC_MODPERM_KERNEL")
    if jax.default_backend() == "tpu":
        return flag != "0"
    return flag == "1"


def _tr(x3: jax.Array, extra_rows: int = 0) -> jax.Array:
    """(B, R, Cc) -> (B, Cc + extra_rows, R), possibly PADDED on both
    output dims.  extra_rows allocates undefined trailing rows (DMA
    slack for _row_compact's pseudo-row) without a pad copy.

    On TPU this is the Pallas tiled transpose (XLA's transpose emitter
    runs at 29-34 GB/s on these shapes — module docstring); callers must
    index only the valid [:Cc, :R] region.  Elsewhere XLA's transpose is
    fine and the result is exact.

    Degenerate plans (one factor far below the tile size) would blow the
    padded footprint up by the pad ratio — a (2^25, 2) view padded to
    (2^25, 256) is 128x the state, an instant OOM at any real M — so the
    Pallas path is gated on the padding staying ~<= 30%; thin views take
    the XLA transpose (slow pass, but proportional memory).

    QC_MODPERM_KERNEL=1 forces the Pallas path off-TPU (interpret mode)
    so tests cover the padded layouts the chunk-gather kernel consumes."""
    import os

    if jax.default_backend() == "tpu" or os.environ.get("QC_MODPERM_KERNEL") == "1":
        R, Cc = x3.shape[-2:]
        blk = 128
        pad_ratio = (-(-R // blk) * blk * (-(-Cc // blk) * blk)) / float(R * Cc)
        # 1.6 admits the worst lane pad of a _TPU_MIN_FACTOR-floor plan
        # (v in [256, 384) -> <= 1.5) while still rejecting degenerate
        # thin-minor views (the 128x blowup class below).
        if pad_ratio <= 1.6:
            from quantumcomputer_tpu.ops.pallas_transpose import (
                tiled_transpose_padded,
            )

            return tiled_transpose_padded(
                x3, block=(blk, blk), extra_rows=extra_rows
            )
    out = jnp.swapaxes(x3, 1, 2)
    if extra_rows:
        out = jnp.pad(out, ((0, 0), (0, extra_rows), (0, 0)))
    return out


def tile_ratio(f: int) -> float:
    """Lane-tiling expansion of materializing a factor as the minor dim
    of a planar intermediate.  TPU arrays are tiled T(8,128): a (N, f)
    array with f far from a lane multiple pads every row to
    ceil(f/128)*128 lanes — at f=2 that is a 64x expansion, which turned
    a 256 MB intermediate into a 16 GB allocation.  Both split factors
    appear as minor dims (u in the deal view, v in the collect
    transpose)."""
    return 1.0 if f == 1 else (-(-f // 128) * 128) / f


def _tile_friendly(f: int, min_factor: int = 32) -> bool:
    """Acceptance floor for rational_split: reject only the catastrophic
    zone (> 4x expansion, f < 32) — or, on TPU, anything under
    _TPU_MIN_FACTOR (see that constant's rationale).  Memory-ceiling
    callers (the semiclassical driver at the largest M) apply a stricter
    per-plan tile_ratio gate and fall back to the element gather instead
    — a blanket strict filter here would reject most multipliers whose
    continued fraction jumps over the balanced sqrt(C) region."""
    return f == 1 or f >= min_factor


def rational_split(
    a_inv: int, C: int, min_factor: int = 32
) -> Optional[Tuple[int, int, int]]:
    """Write a_inv = eps * u * v^{-1} (mod C) with u, v as balanced as the
    continued-fraction lattice allows (both ~sqrt(C) generically).

    Returns (eps, u, v) with u, v > 0, eps in {+1, -1}, or None when every
    balanced convergent shares a factor with C (then gcd(u, C) > 1 would
    make v non-invertible — in Shor's setting that shared factor would
    itself be an answer, but this layer stays a pure permutation op and
    lets the caller fall back).

    Extended Euclid on (C, a_inv) maintains r_i = s_i*C + t_i*a_inv, i.e.
    a_inv * t_i = r_i (mod C): u = r_i, v = |t_i|, eps = sign(t_i).
    |r_i| shrinks as |t_i| grows, so the best split minimizes
    max(r_i, |t_i|) over the remainder sequence.
    """
    a_inv %= C
    if a_inv == 0 or math.gcd(a_inv, C) != 1:
        return None
    r0, r1 = C, a_inv
    t0, t1 = 0, 1
    best = None
    best_cost = None
    while r1 > 0:
        cost = max(r1, abs(t1))
        if (
            math.gcd(r1, C) == 1
            and _tile_friendly(r1, min_factor)
            and _tile_friendly(abs(t1), min_factor)
            and (best_cost is None or cost < best_cost)
        ):
            best, best_cost = (1 if t1 > 0 else -1, r1, abs(t1)), cost
        q = r0 // r1
        r0, r1 = r1, r0 - q * r1
        t0, t1 = t1, t0 - q * t1
    return best


@dataclass(frozen=True)
class StridePlan:
    """Static plan for one structured permutation (per (C, a_inv, M))."""

    C: int
    M: int
    eps: int
    u: int       # deal-leg multiplier (1 = skip)
    v: int       # collect-leg structure parameter (1 = skip)
    vinv: int    # v^{-1} mod C (the collect leg's row-start multiplier)
    W: int       # deal-leg output chunk width


def plan_stride_permute(
    C: int, a_inv: int, M: int, max_chunk: int = _MAX_CHUNK,
    min_factor: Optional[int] = None,
) -> Optional[StridePlan]:
    """Build the static plan, or None when the structured path does not
    apply: the permutation must be nontrivial, the deal chunking needs
    W*u <= C with a DMA-worthy W, and the collect rows (width ~C/v) must
    be wide enough to beat element gathers.

    max_chunk caps the deal-leg chunk width W: on the XLA path the leg's
    transient padding is 2*W*u elements, so memory-ceiling callers (the
    semiclassical driver at the largest M, off the kernel path) pass a
    lower cap to trade slice throughput for peak footprint; the kernel
    path's pad-free view is W-independent and keeps the plan maximum.

    min_factor (None = auto): acceptance floor for non-unit split
    factors — _TPU_MIN_FACTOR on real TPU (XLA's small-odd-minor
    relayouts compile pathologically there; the kernel-row forms want
    DMA-wide factors), 32 elsewhere."""
    dim = 1 << M
    if C > dim or C >= (1 << 30):
        return None
    a_inv %= C
    if a_inv <= 1:
        return None
    if min_factor is None:
        min_factor = (
            _TPU_MIN_FACTOR if jax.default_backend() == "tpu" else 32
        )
    split = rational_split(a_inv, C, min_factor)
    if split is None:
        return None
    eps, u, v = split
    # Chunk width for the deal leg: largest power of two with W*u <= C.
    W = max_chunk
    while W > dim:
        W //= 2
    while W >= _MIN_CHUNK and W * u > C:
        W //= 2
    if u > 1 and W < _MIN_CHUNK:
        return None
    # Collect rows are ceil(C/v) wide; below 128 elements the slice DMAs
    # degenerate toward the element-gather regime this path replaces.
    if v > 1 and (C - 1) // v + 1 < _MIN_CHUNK:
        return None
    vinv = pow(v, -1, C) if v > 1 else 1
    return StridePlan(C=C, M=M, eps=eps, u=u, v=v, vinv=vinv, W=W)


def _flip_full_mxu(x: jax.Array) -> jax.Array:
    """Reverse the last dim via row-reverse + MXU lane-reverse.

    XLA's lane-dim reverse measured 8.7 GB/s on a v5e; reversing the
    128-row order (a take) then multiplying by the reversed identity runs
    at ~80 GB/s.  EXACT for every dtype: each output element is one
    product x*1.0 summed with zeros (precision=HIGHEST keeps the MXU from
    rounding the pass-through).  Requires the last dim % 128 == 0."""
    dim = x.shape[-1]
    lead = x.shape[:-1]
    rows = dim // LANE_REV.shape[0]
    zz = x.reshape(lead + (rows, LANE_REV.shape[0]))
    zz = jnp.take(zz, rows - 1 - lax.iota(jnp.int32, rows), axis=len(lead))
    out = lax.dot_general(
        zz,
        LANE_REV.astype(x.dtype),
        (((len(lead) + 1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
    )
    return out.reshape(lead + (dim,))


LANE_REV = jnp.eye(128, dtype=jnp.float32)[::-1]


def _negate_mod(x: jax.Array, C: int) -> jax.Array:
    """F_{-1}: out[0] = x[0], out[j] = x[C - j] for 0 < j < C, identity
    above.

    On TPU the segment reverse is realized as a FULL reverse (row-reverse
    + MXU lane-reverse, _flip_full_mxu) plus a static re-slice: out[1:C]
    = full_reverse(x)[dim-C : dim-1].  XLA's native lane reverse
    (jnp.flip on the minor dim) measured 8.7 GB/s on a v5e — 14x slower
    than this composition."""
    dim = x.shape[-1]
    head = x[..., :1]
    if jax.default_backend() == "tpu" and dim % 128 == 0:
        full = _flip_full_mxu(x)
        body = lax.slice_in_dim(full, dim - C, dim - 1, axis=-1)
    else:
        body = jnp.flip(x[..., 1:C], axis=-1)
    if C == dim:
        return jnp.concatenate([head, body], axis=-1)
    return jnp.concatenate([head, body, x[..., C:]], axis=-1)


LANE = 128


def collect_chunking(C: int, v: int, use_kernel: bool) -> Tuple[int, int, int]:
    """Single source of truth for the collect-leg row chunking.

    Rows of the collect view are Qpv = ceil(C/v) elements of real data,
    gathered at a lane-rounded width Qpr (the cyclic extension provides
    valid continuation data past Qpv, discarded by the compaction).  On
    the kernel path, rows wider than _ROW_W_CAP split into Wc-wide VMEM
    chunks; Qpr then rounds up to a multiple of Wc so K = Qpr // Wc
    chunks tile each row EXACTLY (round 4 shipped this arithmetic
    duplicated and disagreeing — Wc recomputed as min(Qpr, _ROW_W_CAP)
    after the split had already chosen _ROW_SPLIT_W — which crashed every
    plan with Qpr > cap not divisible by the cap, e.g. M=28, v=1543,
    Qpr=196608).

    Returns (Wc, Qpr, K) with Qpr % Wc == 0 by construction.
    """
    Qpv = (C - 1) // v + 1
    Qpr = -(-Qpv // LANE) * LANE
    Wc = Qpr
    if use_kernel and Qpr > _ROW_W_CAP:
        # Halving candidates below the slab cap: a narrower Wc rounds
        # Qpv up less (less gather/transpose surplus — 13% -> 3.6% at
        # the M=28 bench plan), while the chunk DMA stays >= Wc/8 lanes
        # (16 KB f32 at 4096 — comfortably stream-sized).  Ties take the
        # wider chunk (fewer DMA issues).
        best = None
        cand = _ROW_SPLIT_W
        while cand >= max(_ROW_SPLIT_W // 8, LANE):
            q = -(-Qpv // cand) * cand
            if best is None or q < best[1]:
                best = (cand, q)
            cand //= 2
        Wc, Qpr = best
    K = Qpr // Wc
    assert Qpr % Wc == 0 and K * Wc == Qpr, (C, v, Wc, Qpr, K)
    return Wc, Qpr, K


def _row_compact(w2: jax.Array, v: int, dim: int) -> jax.Array:
    """(B, rows, vpad) padded row view -> (B, dim) flat with
    flat[q*v + t] = w2[b, q, t] (t < v); flat positions past rows*v are
    in-bounds garbage the caller selects away.  The inverse of the deal
    leg's row view — every Wt-wide flat chunk is two contiguous slices of
    w2's flat storage split at the single row boundary it crosses
    (Wt <= v), exactly the deal leg's wrap structure, so it runs on the
    blend kernel instead of XLA's pathological relayout.  The offsets
    follow one law in the chunk index, so they are computed IN KERNEL
    (chunk_gather_blend_rowlaw): the compaction's NC ~ dim/v reaches
    175k-760k at M=28-30 and NC-sized scalar-prefetch arrays exceed SMEM
    (measured scoped-allocation failure on a v5e at s32[174763] x 3)."""
    from quantumcomputer_tpu.ops.pallas_chunkgather import (
        chunk_gather_blend_rowlaw,
    )

    B, rows, vpad = w2.shape
    # The caller supplies AT LEAST ONE slack row past the live region
    # (via _tr's extra_rows, no pad copy) so every LIVE chunk's slices
    # are passed exactly: a straight slice s0 = q0*vpad + t0 with live
    # q0 <= rows-2 reads up to (rows-2)*vpad + (vpad-1) + Wt < rows*vpad,
    # and a wrap slice up to (rows)*vpad (Wt <= vpad).  Without the
    # slack, a last-row chunk with t0 > vpad - Wt had s0 clamp-SHIFTED,
    # silently corrupting output positions < C whenever Qpv % 128 == 0
    # (rows == Qpv, no pad rows — e.g. v=899, C in (114688, 115072]).
    # The in-kernel clamps only bound garbage chunks past the live rows,
    # whose output the caller's pos < C select discards; the slack row's
    # UNDEFINED contents are read only by discarded lanes.  Exactness is
    # guaranteed for flat positions < (rows-1)*v (>= C for the collect
    # caller: rows-1 = Qpr >= Qpv); beyond that, garbage.
    assert rows >= 2, rows
    w2f = w2.reshape(B, rows * vpad)
    Wt = min((v // LANE) * LANE, _MAX_CHUNK)
    NCt = -(-dim // Wt)
    out = chunk_gather_blend_rowlaw(w2f, NCt, v, vpad, Wt)
    return out.reshape(B, NCt * Wt)[:, :dim]


def _deal_leg(x: jax.Array, C: int, u: int, M: int, W: int) -> jax.Array:
    """F_u for small u: out[j] = x[(u*j) mod C] (j < C), x[j] above.

    Source flat index rem(j) = (u*j) mod C, split rem = q*u + t
    (t in [0, u)).  In the transposed (u, Qp) view y0[t, q] = x[q*u + t],
    one W-lane output chunk starting at j0 is:

        lanes i <  i*: y0[t1, q1 + i]      (t1 = rem0 % u, q1 = rem0 // u)
        lanes i >= i*: y0[t2, i - i*]      (the single mod-C wrap)

    with rem0 = (u*j0) mod C, i* = ceil((C - rem0)/u) clamped to [0, W],
    t2 = rem0 + i**u - C.  W*u <= C guarantees at most one wrap per chunk.
    Both sides are W-wide contiguous row slices; a lane select blends.
    """
    dim = 1 << M
    lead = x.shape[:-1]
    xf = x.reshape((-1, dim))
    B = xf.shape[0]
    Qp = (C - 1) // u + 1
    used = min(dim, Qp * u)
    upad = -(-u // LANE) * LANE

    # Only chunks touching the live region j < C are computed: the
    # identity tail is appended as a STATIC concat (C is static), which
    # both drops the garbage chunks' DMA and replaces the full-plane
    # where-select read of xf with a read of just the tail.
    NC = -(-C // W)
    j0 = lax.iota(jnp.int32, NC) * W
    nbits = max(1, u.bit_length())
    rem0 = modmul_onchip(u, j0, C, nbits)
    t1 = rem0 % u
    q1 = rem0 // u
    istar = jnp.clip((C - rem0 + u - 1) // u, 0, W)
    t2 = jnp.clip(rem0 + istar * u - C, 0, u - 1)
    zero = jnp.zeros((), jnp.int32)
    lane = lax.iota(jnp.int32, W)

    # Kernel path: PAD-FREE overlapping row view.  The old layout carried
    # W zero-columns on BOTH sides of y0 (2*W*u elements ~ 2 full planes
    # at the plan maximum W*u ~ C), and its row/lane counts missed the
    # transpose tile grid, so every pass over the view moved ~3x the
    # state and the transpose pre-pad materialized a full copy (measured
    # 5.8 GB at M=28).  Instead:
    #   - each w2 row r carries LANE junk lanes in FRONT of its data
    #     (row r = xext[r*u : r*u + WIDTH], data at lane LANE + t): the
    #     transpose turns them into LANE junk ROWS of y0, so the wrap
    #     slice start s1 = (LANE + t2)*pitch - istar stays >= 0 even at
    #     t2 = 0 (junk is read only by lanes the blend discards);
    #   - rows round up to the tile grid (Qp2) and WIDTH to a lane
    #     multiple, so _tr pads nothing;
    #   - no right pad: a straight slice's USED lanes i < istar satisfy
    #     q1 + i <= Qp - 1 (rem < C), so row overruns only feed
    #     discarded lanes, and WIDTH >= u + 2*LANE bounds the flat DMA.
    Qp2 = -(-Qp // LANE) * LANE
    WIDTH = upad + 2 * LANE
    if _use_chunk_kernel() and u >= LANE and WIDTH * Qp2 < (1 << 31):
        from quantumcomputer_tpu.ops.pallas_chunkgather import (
            chunk_gather,
            chunk_gather_blend,
        )

        # Rows DMA straight from the STATE (no extended copy: the old
        # [zeros | x | zeros] concat cost a full read+write plane pass).
        # Row r = xf[r*u - LANE : .. + WIDTH]; the kernel clamps
        # out-of-contract windows memory-safe, and the <= 3 boundary
        # rows whose windows leave [0, dim) — row 0 (start -LANE) and
        # the last live row(s) reading past dim — are overwritten with
        # exact content by dynamic_update_slice (in-place on the fresh
        # kernel output).  Junk rows r >= Qp stay unpatched (no
        # consumer).
        starts = lax.iota(jnp.int32, Qp2) * u - LANE
        w2 = chunk_gather(xf, starts, WIDTH)  # (B, Qp2, WIDTH)
        row0 = jnp.concatenate(
            [jnp.zeros((B, LANE), xf.dtype), xf[:, : WIDTH - LANE]], axis=1
        )
        w2 = lax.dynamic_update_slice(w2, row0[:, None, :], (0, 0, 0))
        r_lo = max(1, (dim + LANE - WIDTH) // u + 1)
        for r in range(r_lo, Qp):
            s = r * u - LANE
            take = max(0, min(dim - s, WIDTH))
            row = xf[:, s : s + take]
            if take < WIDTH:
                row = jnp.pad(row, ((0, 0), (0, WIDTH - take)))
            w2 = lax.dynamic_update_slice(w2, row[:, None, :], (0, r, 0))
        y0 = _tr(w2)                            # (B, WIDTH, Qp2), pad-free
        pitch = y0.shape[2]
        y0f = y0.reshape(B, y0.shape[1] * pitch)
        s0 = (t1 + LANE) * pitch + q1
        s1 = (t2 + LANE) * pitch - istar
        out = chunk_gather_blend(y0f, s0, s1, istar, W)  # (B, NC, W)
        flat = out.reshape(B, NC * W)
        if C < dim:
            flat = jnp.concatenate([flat[:, :C], xf[:, C:]], axis=-1)
        return flat.reshape(lead + (dim,))

    # XLA path: [W*u zeros | x viewed (Qp, u), zero-padded past dim |
    # W*u zeros] as ONE flat concatenation, then the (W + Qp + W, u) view
    # transposed.  The W-row pads become column pads of y0: W on the left
    # (the wrapped slice starts at W - i* >= 0) and W on the right (the
    # straight slice ends at q1 + W <= Qp + W - 1).  The reshape row view
    # is free here (contiguous); only the kernel path can realize the
    # overlapping junk-lane view above.
    mid = xf[:, :used]
    if Qp * u > used:
        mid = jnp.pad(mid, ((0, 0), (0, Qp * u - used)))
    zpad = jnp.zeros((B, W * u), xf.dtype)
    flatpad = jnp.concatenate([zpad, mid, zpad], axis=1)
    R = W + Qp + W
    w2 = flatpad.reshape(B, R, u)
    y0 = _tr(w2)  # (B, u[pad], W + Qp + W), possibly padded past both dims

    pitch = y0.shape[2]
    if y0.shape[1] * pitch < (1 << 31):
        # Flat 1D-start slices lower ~25% faster than 2D (t, col) starts
        # (scripts/prof_legs.py); int32 flat indexing bounds the option.
        y0f = y0.reshape(B, y0.shape[1] * pitch)
        s0 = t1 * pitch + (W + q1)
        s1 = t2 * pitch + (W - istar)

        # Blend INSIDE the vmapped chunk: the two W-slices fuse into
        # the select without materializing dim-sized g0/g1 (2 state
        # passes of transient HBM at the memory ceiling).
        def chunk1(a, b, isc):
            g0 = lax.dynamic_slice(y0f, (zero, a), (B, W))
            g1 = lax.dynamic_slice(y0f, (zero, b), (B, W))
            return jnp.where(lane[None, :] < isc, g0, g1)

        out = jax.vmap(chunk1, in_axes=(0, 0, 0), out_axes=1)(s0, s1, istar)
    else:

        def chunk(t1c, q1c, isc, t2c):
            g0 = lax.dynamic_slice(y0, (zero, t1c, W + q1c), (B, 1, W))
            g1 = lax.dynamic_slice(y0, (zero, t2c, W - isc), (B, 1, W))
            return jnp.where(lane[None, None, :] < isc, g0, g1)

        out = jax.vmap(chunk, in_axes=(0, 0, 0, 0), out_axes=2)(t1, q1, istar, t2)
    flat = out.reshape(B, NC * W)
    if C < dim:
        flat = jnp.concatenate([flat[:, :C], xf[:, C:]], axis=-1)
    return flat.reshape(lead + (dim,))


def _collect_leg(x: jax.Array, C: int, v: int, vinv: int, M: int) -> jax.Array:
    """F_{v^{-1}} for small v: out[j] = x[(v^{-1}*j) mod C] (j < C).

    Split the OUTPUT index j = q*v + t: out[q*v + t] =
    x[(v^{-1}*t + q) mod C] — for each t, a contiguous (mod C) run of
    length ~C/v starting at j0(t) = (v^{-1}*t) mod C.  A cyclic extension
    x_ext = [x[:C], x[:Qpv]] absorbs the single wrap, so every row is one
    wide slice; transposing (v, Qpv) -> (Qpv, v) restores flat order.
    """
    dim = 1 << M
    lead = x.shape[:-1]
    xf = x.reshape((-1, dim))
    B = xf.shape[0]
    Qpv = (C - 1) // v + 1
    # Slices of a lane-aligned width run markedly faster than odd widths
    # (scripts/prof_legs.py): gather rows rounded up to 128 — the cyclic
    # extension provides valid (discarded) continuation data — and drop
    # the surplus in the post-transpose compaction slice.  Rows wider
    # than the VMEM slab cap split into Wc-wide kernel chunks; the
    # chunking triple (Wc, Qpr, K) is computed ONCE here (collect_chunking
    # guarantees Qpr % Wc == 0).
    use_kernel = _use_chunk_kernel()
    Wc, Qpr, K = collect_chunking(C, v, use_kernel)

    t = lax.iota(jnp.int32, v)
    nbits = max(1, C.bit_length())
    j0 = modmul_onchip(vinv, t, C, nbits)

    zero = jnp.zeros((), jnp.int32)

    vpad = -(-v // LANE) * LANE
    if use_kernel:
        from quantumcomputer_tpu.ops.pallas_chunkgather import chunk_gather_src2

        # Row slices [j0, j0 + Qpr) wrap mod C at most once (Qpr <= C).
        # Rather than materializing a cyclically-extended copy of the
        # state (a full read+write plane pass per step), every chunk is
        # ONE straight read from one of two sources:
        #   - base <= C - Wc:        the state at base;
        #   - C - Wc < base < C:     the 2*Wc cyclic join
        #                            [x[C-Wc : C] | x[:Wc]] at
        #                            base - (C - Wc)  (covers the wrap
        #                            AND keeps the DMA window inside the
        #                            buffer when C + Wc > dim);
        #   - base >= C:             the state at base - C (the
        #                            post-wrap run is x[0:...] itself).
        # Gather vpad rows, not v: rows [v, vpad) are junk (start 0) the
        # compaction never selects, and the tile-aligned row count makes
        # the transpose's pre-pad a no-op (a (B, v, Qpr) input at v=1543
        # forced a full 2.4 GB pad copy at M=28).
        xjoin = jnp.concatenate([xf[:, C - Wc : C], xf[:, :Wc]], axis=-1)
        j0p = jnp.concatenate([j0, jnp.zeros((vpad - v,), jnp.int32)])
        base = (j0p[:, None] + Wc * lax.iota(jnp.int32, K)[None, :]).reshape(-1)
        in_join = (base > C - Wc) & (base < C)
        starts = jnp.where(
            in_join, base - (C - Wc), jnp.where(base < C, base, base - C)
        )
        y0 = chunk_gather_src2(
            xf, xjoin, starts, in_join.astype(jnp.int32), Wc
        ).reshape(B, vpad, Qpr)
    else:
        x_ext = jnp.concatenate([xf[:, :C], xf[:, : min(Qpr, dim)]], axis=-1)
        if Qpr > dim:
            x_ext = jnp.pad(x_ext, ((0, 0), (0, Qpr - dim)))

        def row(j0c):
            return lax.dynamic_slice(x_ext, (zero, j0c), (B, Qpr))

        y0 = jax.vmap(row, out_axes=1)(j0)      # (B, v, Qpr)
    compact = (
        use_kernel
        and v >= LANE
        and vpad % LANE == 0
        and (Qpr + 2) * vpad < (1 << 31)
    )
    # The compaction path needs one slack row past the live region (DMA
    # bound for last-row chunks — the ADVICE r4 clamp-corruption fix);
    # _tr allocates it as an undefined extra output row instead of the
    # full-array jnp.pad copy it used to cost.
    w2 = _tr(y0, extra_rows=1 if compact else 0)  # (B, Qpr[+1], vpad)
    if compact:
        # Flat order via the blend kernel (_row_compact): XLA's
        # (Qpv, v) -> flat relayout for odd v compiles in 10-30 s per
        # shape and scatters at 50-500 GB/s.  Rows past Qpv and lanes
        # past C of the last chunk carry transpose-pad/cyclic-surplus
        # garbage, dropped by the static [:C] slice; the identity tail
        # is a static concat (reads only the tail, not a full plane).
        flat = _row_compact(w2, v, C)[:, :C]
        if C < dim:
            flat = jnp.concatenate([flat, xf[:, C:]], axis=-1)
        return flat.reshape(lead + (dim,))
    if w2.shape[1:] != (Qpv, v):
        w2 = w2[:, :Qpv, :v]                    # compaction back to exact
    flat = w2.reshape(B, Qpv * v)[:, :C]
    if C < dim:
        flat = jnp.concatenate([flat, xf[:, C:]], axis=-1)
    return flat.reshape(lead + (dim,))


def apply_stride_permute(x: jax.Array, plan: StridePlan) -> jax.Array:
    """out[..., j] = x[..., (a_inv*j) mod C] for j < C, x[..., j] above —
    the modmul_inverse_permutation gather (ops/gates.py:271-288) as
    structured movement.  Traceable; all plan fields are static."""
    out = x
    if plan.v > 1:
        out = _collect_leg(out, plan.C, plan.v, plan.vinv, plan.M)
    if plan.u > 1:
        out = _deal_leg(out, plan.C, plan.u, plan.M, plan.W)
    if plan.eps < 0:
        out = _negate_mod(out, plan.C)
    return out


def modmul_stride_permute(x: jax.Array, C: int, a_inv: int, M: int) -> jax.Array:
    """Convenience one-shot form (plan + apply); returns x permuted, or
    raises if the structured path does not apply (callers that need a
    fallback should use plan_stride_permute directly)."""
    plan = plan_stride_permute(C, a_inv, M)
    if plan is None:
        raise ValueError(
            f"structured stride permutation unsupported for C={C}, "
            f"a_inv={a_inv}, M={M}"
        )
    return apply_stride_permute(x, plan)
