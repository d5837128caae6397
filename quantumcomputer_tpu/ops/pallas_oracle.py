"""Pallas row-gather oracle for the M-high layout.

In the M-high layout (models/shor_circuit.py) the controlled modular
multiply is: OUT[j, col] = ctrl(col) ? X[ginv[j], col] : X[j, col] over the
(2^M, 2^(n-M)) view — a permutation of whole contiguous rows, gated by one
low column bit.  XLA's gather measured ~4.5 effective state passes; this
kernel does it with manual DMAs at 2-3 passes:

  * the permutation indices arrive via scalar prefetch
    (PrefetchScalarGridSpec), so each program DMAs exactly the rows it
    needs from HBM — row ginv[j] for the control==1 columns, row j for the
    control==0 columns;
  * when the column-block width divides 2^c_phys, every block is PURE
    (all-control-0 or all-control-1): the kernel predicates the DMAs with
    @pl.when and moves only ONE source row per output row — 1 read + 1
    write, the roofline for a permutation;
  * mixed blocks (control bit inside the block) fetch both rows and blend.

Alignment: Mosaic requires DMA slices tile-aligned in their last two dims,
so the state is viewed 3D as (2^M rows, rest/128, 128) — a sliced row is a
(CB2, 128) slab (CB2 a multiple of 8) and only leading dims take size-1
slices.  Output rows are grouped in 8s for the same reason.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantumcomputer_tpu.ops.gates import modmul_inverse_permutation

LANE = 128
ROWS_PER_BLOCK = 8
MAX_CB2 = 128  # column sub-rows per block: (8, 128, 128) f32 = 512 KB per plane
MIN_REST = 1024  # need >= 8 aligned sub-rows of 128 lanes per state row


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(ginv_ref, re_any, im_any, ore_ref, oim_ref, sre, sim, sems, *, cb2: int, c_phys: int, pure: bool, group: int):
    """One program = one 8-row strip x `group` column blocks; the DMAs for
    column block i+1 start while block i is blended and written."""
    j0 = pl.program_id(0) * ROWS_PER_BLOCK
    cb0 = pl.program_id(1) * group  # first column block of this program

    def dmas_for(ci: int, bank: int):
        """DMA descriptors for column block cb0+ci into scratch bank `bank`.
        kind 0 = source rows for control==0 (identity), kind 1 = permuted;
        the pure path uses kind 0 only, with a predicated row choice."""
        c2_0 = (cb0 + ci) * cb2
        out = []
        kinds = (0,) if pure else (0, 1)
        for kind in kinds:
            for k in range(ROWS_PER_BLOCK):
                if pure:
                    is_perm = (((c2_0 * LANE) >> c_phys) & 1) == 1
                    row = jnp.where(is_perm, ginv_ref[j0 + k], j0 + k)
                else:
                    row = ginv_ref[j0 + k] if kind else j0 + k
                out.append(
                    pltpu.make_async_copy(
                        re_any.at[row, pl.ds(c2_0, cb2), :], sre.at[bank, kind, k], sems.at[bank, kind, 0, k]
                    )
                )
                out.append(
                    pltpu.make_async_copy(
                        im_any.at[row, pl.ds(c2_0, cb2), :], sim.at[bank, kind, k], sems.at[bank, kind, 1, k]
                    )
                )
        return out

    for d in dmas_for(0, 0):
        d.start()
    for ci in range(group):
        bank = ci % 2
        if ci + 1 < group:
            for d in dmas_for(ci + 1, 1 - bank):
                d.start()
        for d in dmas_for(ci, bank):
            d.wait()
        loc = ci * cb2  # offset within this program's output block
        if pure:
            ore_ref[:, pl.ds(loc, cb2), :] = sre[bank, 0]
            oim_ref[:, pl.ds(loc, cb2), :] = sim[bank, 0]
        else:
            c2_0 = (cb0 + ci) * cb2
            sub = jax.lax.broadcasted_iota(jnp.int32, (1, cb2, LANE), 1) + c2_0
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, cb2, LANE), 2)
            ctrl = (((sub * LANE + lane) >> c_phys) & 1) == 1
            ore_ref[:, pl.ds(loc, cb2), :] = jnp.where(ctrl, sre[bank, 1], sre[bank, 0])
            oim_ref[:, pl.ds(loc, cb2), :] = jnp.where(ctrl, sim[bank, 1], sim[bank, 0])


def _ladder_kernel(combos_ref, re_any, im_any, ore_ref, oim_ref, sre, sim, sems, *, cb2: int, controls, C: int, group: int):
    """Composed-oracle pure path: every column block is control-pure for ALL
    K fused oracles (their strides >= the block width), so each output row
    has exactly ONE source row — (combo * j) mod C, computed on the scalar
    core from the 2^K-entry combo table (a full per-mask row table would
    blow the 1 MB SMEM scalar-prefetch budget).  One pass: 1R + 1W."""
    j0 = pl.program_id(0) * ROWS_PER_BLOCK
    cb0 = pl.program_id(1) * group

    def dmas_for(ci: int, bank: int):
        c2_0 = (cb0 + ci) * cb2
        col0 = c2_0 * LANE
        mask = 0
        for k, c in enumerate(controls):
            mask = mask + (((col0 >> c) & 1) << k)
        combo = combos_ref[mask]
        out = []
        for k in range(ROWS_PER_BLOCK):
            j = j0 + k
            row = jnp.where(j < C, (combo * j) % C, j)
            out.append(
                pltpu.make_async_copy(
                    re_any.at[row, pl.ds(c2_0, cb2), :], sre.at[bank, k], sems.at[bank, 0, k]
                )
            )
            out.append(
                pltpu.make_async_copy(
                    im_any.at[row, pl.ds(c2_0, cb2), :], sim.at[bank, k], sems.at[bank, 1, k]
                )
            )
        return out

    for d in dmas_for(0, 0):
        d.start()
    for ci in range(group):
        bank = ci % 2
        if ci + 1 < group:
            for d in dmas_for(ci + 1, 1 - bank):
                d.start()
        for d in dmas_for(ci, bank):
            d.wait()
        loc = ci * cb2
        ore_ref[:, pl.ds(loc, cb2), :] = sre[bank]
        oim_ref[:, pl.ds(loc, cb2), :] = sim[bank]


def ladder_high_supported(controls, M: int, n: int, itemsize: int = 4) -> bool:
    """True when the fused-run DMA kernel can run this ladder: all control
    strides cover at least an 8 KB DMA slab, the state is large enough for
    aligned DMAs, and the mask table stays small."""
    rest = 1 << (n - M)
    if rest < MIN_REST or (1 << M) < ROWS_PER_BLOCK:
        return False
    if len(controls) > 8:  # 2^K combo-table entries; 8 is far beyond the circuit's need
        return False
    if (1 << M) * (1 << M) >= (1 << 31):  # in-kernel combo*j must fit int32
        return False
    # stride 2^11 lanes = 16 aligned f32 sub-rows: (16, 128) 8 KB DMA
    # slabs.  c=10 would give 4 KB slabs, measured 5x slower on v5e (the
    # per-DMA overhead dominates) — leave those on the per-gate mixed path.
    # The bound is in BYTES, so bf16 planes need one more stride bit.
    c_min = min(controls)
    return c_min >= 7 and (1 << (c_min - 7)) * LANE * itemsize >= 8192


def apply_camodc_ladder_high_planar(re: jax.Array, im: jax.Array, C: int, A_list, controls, M: int):
    """A fused RUN of controlled modular multiplies (m_high layout) in ONE
    HBM pass.  The multiplications commute, so the run composes into a
    single permutation per control-bit pattern; with every control stride
    >= the column-block width, each block is pure and each output row needs
    exactly one source row (1R + 1W total — K gates for the price of one).
    """
    dim = re.shape[0]
    rows = 1 << M
    rest = dim // rows
    r2 = rest // LANE
    itemsize = jnp.dtype(re.dtype).itemsize
    assert ladder_high_supported(controls, M, dim.bit_length() - 1, itemsize)
    # Block width limited by the SMALLEST control stride (purity for all)
    # and capped at 64 KB slabs (VMEM scratch scales with cb2*itemsize).
    cb2 = min(_max_slab_cb2(itemsize), r2, 1 << (min(controls) - 7))
    group = min(2, r2 // cb2)
    from quantumcomputer_tpu.ops.gates import modexp_combo_multipliers

    combos = jnp.asarray(modexp_combo_multipliers(C, A_list), jnp.int32)
    view = (rows, r2, LANE)
    out_spec = pl.BlockSpec(
        (ROWS_PER_BLOCK, group * cb2, LANE), lambda j, c, g: (j, c, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows // ROWS_PER_BLOCK, r2 // (group * cb2)),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS_PER_BLOCK, cb2, LANE), re.dtype),
            pltpu.VMEM((2, ROWS_PER_BLOCK, cb2, LANE), im.dtype),
            pltpu.SemaphoreType.DMA((2, 2, ROWS_PER_BLOCK)),
        ],
    )
    kernel = partial(_ladder_kernel, cb2=cb2, controls=tuple(controls), C=C, group=group)
    ore, oim = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(view, re.dtype),
            jax.ShapeDtypeStruct(view, im.dtype),
        ),
        interpret=_interpret(),
    )(combos, re.reshape(view), im.reshape(view))
    return ore.reshape(dim), oim.reshape(dim)


STRIP = 8  # schedule steps per grid iteration (also the bank slot count)


def cycle_schedule(ginv: np.ndarray):
    """Order output rows along the permutation's cycles.

    Output row j needs source row ginv[j] (control==1 columns) and itself
    (control==0 columns).  Walking each cycle j -> ginv[j] -> ... makes
    step t's IDENTITY row equal step t-1's freshly-read SOURCE row, so the
    kernel reads each input row exactly once: 1R + 1W total instead of the
    blocked 2R + 1W.

    Returns (out_row, src_row, prev_kind) int32 arrays; prev_kind:
    0 = chain (previous step's source), 1 = fresh read of out_row (cycle
    head; the kernel saves this original value), 2 = self (fixed point:
    source IS the row), 3 = cycle-closing step: its source is the head's
    ORIGINAL value (already overwritten under in-place execution), served
    from the saved head slot — no DMA.

    The kind-3 convention makes the schedule safe for IN-PLACE execution
    (output aliasing input): every row's only read precedes its write.

    Computed by the native C++ layer when available (large M means a
    2^M-step walk; native/qc_classical.cpp:qc_cycle_schedule), with this
    Python walk as the behavioral reference and fallback."""
    from quantumcomputer_tpu.algorithms import _native

    if _native.available():
        return _native.cycle_schedule(np.asarray(ginv, np.int32))
    rows = len(ginv)
    out_row = np.empty(rows, np.int32)
    src_row = np.empty(rows, np.int32)
    prev_kind = np.empty(rows, np.int32)
    visited = np.zeros(rows, bool)
    t = 0
    for j0 in range(rows):
        if visited[j0]:
            continue
        if ginv[j0] == j0:
            out_row[t], src_row[t], prev_kind[t] = j0, j0, 2
            visited[j0] = True
            t += 1
            continue
        j, first = j0, True
        while not visited[j]:
            visited[j] = True
            out_row[t] = j
            src_row[t] = ginv[j]
            prev_kind[t] = 1 if first else 0
            first = False
            t += 1
            j = int(ginv[j])
        prev_kind[t - 1] = 3  # closes the cycle: source = saved head original
    assert t == rows
    return out_row, src_row, prev_kind


def _cycle_kernel(sched_ref, x_any, ox_any, slots, stage, head, sems, fsems, osems, *, cb2: int, c_phys: int, n_strips: int):
    """Cycle-ordered IN-PLACE oracle pass over ONE plane (output aliases
    the input).

    Grid = (col_groups, n_strips); strips iterate fastest.  Per strip: 8
    source-row DMAs into this strip's bank (+ predicated fresh reads for
    cycle heads), then 8 blends staged and DMA'd to their output rows.
    Three banks rotate so the chain row (the previous strip's last source)
    survives the next strip's prefetch.

    In-place safety: the schedule guarantees every row's single source
    read (chain property: src_row[s] = out_row[s+1]) lands exactly one
    step before that row's write, and fresh/self reads are waited before
    the same step's write starts.  The one backward reference — a cycle's
    closing step needs the HEAD row, overwritten at the cycle's first
    step — is served from `head`, a VMEM slot capturing the head's
    original value when it is fresh-read (kind==1).  Cycles are contiguous
    in the schedule, so at most one head is live at a time."""
    cg = pl.program_id(0)
    t = pl.program_id(1)
    c0 = cg * cb2

    def src_dma(ts, bank, k):
        src = sched_ref[1, ts * STRIP + k]
        return pltpu.make_async_copy(
            x_any.at[src, pl.ds(c0, cb2), :], slots.at[bank, 0, k], sems.at[bank, k]
        )

    def fresh_dma(ts, bank, k):
        out = sched_ref[0, ts * STRIP + k]
        return pltpu.make_async_copy(
            x_any.at[out, pl.ds(c0, cb2), :], slots.at[bank, 1, k], fsems.at[bank, k]
        )

    def out_dma(ts, bank, k):
        out = sched_ref[0, ts * STRIP + k]
        return pltpu.make_async_copy(
            stage.at[bank, k], ox_any.at[out, pl.ds(c0, cb2), :], osems.at[bank, k]
        )

    def start_strip(ts, bank):
        for k in range(STRIP):
            kind = sched_ref[2, ts * STRIP + k]

            @pl.when(kind != 3)  # closing steps read the head slot, not HBM
            def _():
                src_dma(ts, bank, k).start()

            @pl.when(kind == 1)
            def _():
                fresh_dma(ts, bank, k).start()

    bank = t % 3
    nbank = (t + 1) % 3
    pbank = (t - 1) % 3

    @pl.when(t == 0)
    def _():
        start_strip(0, 0)

    # Prefetch strip t+1; its bank's staging buffers were last used by
    # strip t-2, whose output DMAs must complete first.
    @pl.when(t + 1 < n_strips)
    def _():
        @pl.when(t >= 2)
        def _():
            for k in range(STRIP):
                out_dma(t - 2, nbank, k).wait()
        start_strip(t + 1, nbank)

    sub = jax.lax.broadcasted_iota(jnp.int32, (cb2, LANE), 0) + c0
    lane = jax.lax.broadcasted_iota(jnp.int32, (cb2, LANE), 1)
    ctrl = (((sub * LANE + lane) >> c_phys) & 1) == 1

    for k in range(STRIP):
        kind = sched_ref[2, t * STRIP + k]

        @pl.when(kind != 3)
        def _():
            src_dma(t, bank, k).wait()

        @pl.when(kind == 1)
        def _():
            fresh_dma(t, bank, k).wait()
            head[...] = slots[bank, 1, k]  # capture the head's original value

        src_val = jnp.where(kind == 3, head[...], slots[bank, 0, k])
        chain_val = slots[pbank, 0, STRIP - 1] if k == 0 else slots[bank, 0, k - 1]
        is_chain = jnp.logical_or(kind == 0, kind == 3)
        prev_val = jnp.where(is_chain, chain_val, jnp.where(kind == 1, slots[bank, 1, k], src_val))
        stage[bank, k] = jnp.where(ctrl, src_val, prev_val)
        out_dma(t, bank, k).start()

    # Drain the tail strips' output DMAs (no successor waits for them).
    @pl.when(t >= n_strips - 3)
    def _():
        for k in range(STRIP):
            out_dma(t, bank, k).wait()


def apply_camodc_high_cycle_planar(re: jax.Array, im: jax.Array, C: int, atox: int, c_phys: int, M: int):
    """Controlled modular multiply, m_high layout, cycle-ordered and
    IN-PLACE: 1R + 1W (vs 2R + 1W for the blocked mixed path) for ANY
    control position, with the output aliasing the input — no second
    state-sized buffer, which is what lets full-circuit programs run at
    the single-chip HBM ceiling.  CONSUMES re/im (XLA inserts copies only
    if they are still live elsewhere)."""
    dim = re.shape[0]
    rows = 1 << M
    rest = dim // rows
    r2 = rest // LANE
    ginv = np.asarray(modmul_inverse_permutation(C, atox, M))
    out_row, src_row, prev_kind = cycle_schedule(ginv)
    sched = jnp.asarray(np.stack([out_row, src_row, prev_kind]))
    # (3 banks x [src|fresh] x 8 slots + 3 x 8 staging + 1 head)
    # x cb2 x 128 x itemsize must stay under the 16 MB scoped-VMEM budget:
    # 64 KB slabs -> 4.6 MB (cb2 = 128 f32 / 256 bf16; bf16 slabs narrower
    # than 64 KB measured ~30% below the f32 kernel's bandwidth).
    cb2 = min(_max_slab_cb2(jnp.dtype(re.dtype).itemsize), r2)
    n_strips = rows // STRIP
    view = (rows, r2, LANE)

    def one_plane(x):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(r2 // cb2, n_strips),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((3, 2, STRIP, cb2, LANE), x.dtype),  # [src | fresh] slots
                pltpu.VMEM((3, STRIP, cb2, LANE), x.dtype),     # out staging
                pltpu.VMEM((cb2, LANE), x.dtype),               # cycle-head original
                pltpu.SemaphoreType.DMA((3, STRIP)),
                pltpu.SemaphoreType.DMA((3, STRIP)),
                pltpu.SemaphoreType.DMA((3, STRIP)),
            ],
        )
        kernel = partial(_cycle_kernel, cb2=cb2, c_phys=c_phys, n_strips=n_strips)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(view, x.dtype),
            input_output_aliases={1: 0},
            interpret=_interpret(),
        )(sched, x.reshape(view))

    return one_plane(re).reshape(dim), one_plane(im).reshape(dim)


# Measured on v5e at n=29 f32 (ms/apply): 8 KB slabs -> 25.3, 16 KB -> 12.9
# (wash vs the 12.6 full-traffic cycle kernel), 32 KB -> 7.8, 64 KB ->
# 6.6-6.8.  32 KB slabs are where halved traffic beats per-DMA overhead, so
# the threshold is in BYTES: cb2 >= 64 sub-rows for f32 (c >= 13), >= 128
# for bf16 (c >= 14).
MIN_PERM_SLAB_BYTES = 32768


def _min_perm_cb2(itemsize: int) -> int:
    return MIN_PERM_SLAB_BYTES // (LANE * itemsize)


# Column-block slab cap: 64 KB per DMA keeps every kernel's scratch inside
# the scoped-VMEM budget while staying on the flat part of the per-DMA
# overhead curve (see the measurements above MIN_PERM_SLAB_BYTES).
MAX_SLAB_BYTES = 65536


def _max_slab_cb2(itemsize: int) -> int:
    return MAX_SLAB_BYTES // (LANE * itemsize)


def perm_supported(c_phys: int, M: int, n: int, itemsize: int = 4) -> bool:
    """True when the half-traffic pure-permutation kernel can run this gate:
    the control stride must cover enough aligned sub-rows that control-pure
    column blocks reach MIN_PERM_SLAB_BYTES, with at least two blocks."""
    min_cb2 = _min_perm_cb2(itemsize)
    rest = 1 << (n - M)
    if rest < max(MIN_REST, 2 * min_cb2 * LANE) or (1 << M) < ROWS_PER_BLOCK:
        return False
    return (1 << (c_phys - 7)) >= min_cb2 if c_phys >= 7 else False


def apply_camodc_high_perm_planar(re: jax.Array, im: jax.Array, C: int, atox: int, c_phys: int, M: int):
    """Controlled modular multiply with a HIGH control (stride wide enough
    for MIN_PERM_SLAB_BYTES column blocks): touch only the control==1
    column half — 0.5R + 0.5W of the state, in place.

    Runs through the generalized _cycle_masked_kernel with a SINGLE
    schedule and one inserted mask bit: the grid enumerates only the
    control==1 column blocks, so control==0 blocks are never touched."""
    dim = re.shape[0]
    rows = 1 << M
    rest = dim // rows
    r2 = rest // LANE
    n = dim.bit_length() - 1
    itemsize = jnp.dtype(re.dtype).itemsize
    assert perm_supported(c_phys, M, n, itemsize)
    ginv = np.asarray(modmul_inverse_permutation(C, atox, M))
    sched = jnp.asarray(np.stack(cycle_schedule(ginv))[None])  # (1, 3, rows)
    # Block width limited by the control stride (blocks must be pure), by
    # r2/2 (at least two blocks so the control bit is a block-index bit),
    # and capped at 64 KB slabs (VMEM: scratch scales with cb2*itemsize).
    cb2 = min(_max_slab_cb2(itemsize), r2 // 2, 1 << (c_phys - 7))
    ca_bit = c_phys - 7 - (cb2.bit_length() - 1)
    n_strips = rows // STRIP
    view = (rows, r2, LANE)

    def one_plane(x):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            # (masks, control==1 blocks, strips): mask==0 blocks never run.
            grid=(1, r2 // cb2 // 2, n_strips),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((3, STRIP, cb2, LANE), x.dtype),  # src slots
                pltpu.VMEM((3, STRIP, cb2, LANE), x.dtype),  # out staging
                pltpu.VMEM((cb2, LANE), x.dtype),            # cycle-head original
                pltpu.SemaphoreType.DMA((3, STRIP)),
                pltpu.SemaphoreType.DMA((3, STRIP)),
                pltpu.SemaphoreType.DMA((3, STRIP)),
            ],
        )
        kernel = partial(_cycle_masked_kernel, cb2=cb2, insert_bits=((ca_bit, 0),), n_strips=n_strips)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(view, x.dtype),
            input_output_aliases={1: 0},
            interpret=_interpret(),
        )(sched, x.reshape(view))

    return one_plane(re).reshape(dim), one_plane(im).reshape(dim)


def pair_member_supported(c_phys: int, M: int, n: int, itemsize: int = 4) -> bool:
    """Per-gate test: any two gates with DISTINCT controls both passing
    this form a pair_inplace_supported pair (the fusion planner's
    eligibility predicate when the out-of-place ladder doesn't fit)."""
    min_cb2 = _min_perm_cb2(itemsize)
    rest = 1 << (n - M)
    if rest < max(MIN_REST, 4 * min_cb2 * LANE) or (1 << M) < ROWS_PER_BLOCK:
        return False
    return c_phys >= 7 and (1 << (c_phys - 7)) >= min_cb2


def pair_inplace_supported(controls, M: int, n: int, itemsize: int = 4) -> bool:
    """True when TWO fused oracles can run as one in-place masked-permutation
    pass: both control strides must cover a MIN_PERM_SLAB_BYTES column
    block (blocks pure for BOTH controls), so each block's composed
    permutation is selected by its 2-bit control mask and the mask==0
    quarter is untouched — 0.75R + 0.75W for two gates."""
    if len(controls) != 2 or controls[0] == controls[1]:
        return False
    return all(pair_member_supported(c, M, n, itemsize) for c in controls)


def _cycle_masked_kernel(sched_ref, x_any, ox_any, slots, stage, head, sems, fsems, osems, *, cb2: int, insert_bits, n_strips: int):
    """In-place masked-permutation oracle: one or two fused controlled
    multiplies whose column blocks are pure for every control.

    The grid enumerates ONLY the active (mask != 0) column blocks:
    program_id(0) selects the nonzero control mask m = sel + 1, and the
    kernel re-inserts m's bits at the controls' block-index positions
    (`insert_bits`, ascending (position, mask_bit) pairs) to recover the
    actual block index — mask==0 blocks are never visited, and in-place
    aliasing provides their identity for free.  One schedule per nonzero
    mask (multiply by combo[m]); a single-control gate is the one-mask
    case (0.5R+0.5W), a fused pair the three-mask case (0.75R+0.75W).

    Cycle-order in-place hazard logic is identical to _cycle_kernel; the
    one backward reference (each cycle's closing step needs the
    overwritten head row) reads `head`, captured by a fresh DMA at the
    cycle head."""
    mi = pl.program_id(0)  # schedule row; control mask m = mi + 1
    t = pl.program_id(2)
    m = mi + 1
    cg = pl.program_id(1)
    for pos, mask_bit in insert_bits:  # ascending positions: see docstring
        cg = ((cg >> pos) << (pos + 1)) | (((m >> mask_bit) & 1) << pos) | (cg & ((1 << pos) - 1))
    c0 = cg * cb2

    def src_dma(ts, bank, k):
        src = sched_ref[mi, 1, ts * STRIP + k]
        return pltpu.make_async_copy(
            x_any.at[src, pl.ds(c0, cb2), :], slots.at[bank, k], sems.at[bank, k]
        )

    def head_dma(ts, bank, k):
        out = sched_ref[mi, 0, ts * STRIP + k]
        return pltpu.make_async_copy(
            x_any.at[out, pl.ds(c0, cb2), :], head, fsems.at[bank, k]
        )

    def out_dma(ts, bank, k):
        out = sched_ref[mi, 0, ts * STRIP + k]
        return pltpu.make_async_copy(
            stage.at[bank, k], ox_any.at[out, pl.ds(c0, cb2), :], osems.at[bank, k]
        )

    def start_strip(ts, bank):
        for k in range(STRIP):
            kind = sched_ref[mi, 2, ts * STRIP + k]

            @pl.when(jnp.logical_or(kind == 0, kind == 1))
            def _():
                src_dma(ts, bank, k).start()

    bank = t % 3
    nbank = (t + 1) % 3

    @pl.when(t == 0)
    def _():
        start_strip(0, 0)

    @pl.when(t + 1 < n_strips)
    def _():
        @pl.when(t >= 2)
        def _():
            for k in range(STRIP):
                kind2 = sched_ref[mi, 2, (t - 2) * STRIP + k]

                @pl.when(kind2 != 2)
                def _():
                    out_dma(t - 2, nbank, k).wait()
        start_strip(t + 1, nbank)

    for k in range(STRIP):
        kind = sched_ref[mi, 2, t * STRIP + k]

        @pl.when(jnp.logical_or(kind == 0, kind == 1))
        def _():
            src_dma(t, bank, k).wait()

        @pl.when(kind == 1)
        def _():
            head_dma(t, bank, k).start()
            head_dma(t, bank, k).wait()

        stage[bank, k] = jnp.where(kind == 3, head[...], slots[bank, k])

        @pl.when(kind != 2)
        def _():
            out_dma(t, bank, k).start()

    @pl.when(t >= n_strips - 3)
    def _():
        for k in range(STRIP):
            kind = sched_ref[mi, 2, t * STRIP + k]

            @pl.when(kind != 2)
            def _():
                out_dma(t, bank, k).wait()


def apply_camodc_pair_inplace_planar(re: jax.Array, im: jax.Array, C: int, A_pair, controls, M: int):
    """TWO fused controlled modular multiplies in one in-place masked pass
    (0.75R + 0.75W): per column block the 2-bit control mask selects the
    composed permutation (multiply by A_a^{bit_a} * A_b^{bit_b} mod C), and
    mask==0 blocks never move.  The replacement for the out-of-place
    ladder kernel when TWO state buffers don't fit (the single-chip memory
    ceiling: n=30 complex64 / n=31 complex32)."""
    dim = re.shape[0]
    rows = 1 << M
    rest = dim // rows
    r2 = rest // LANE
    n = dim.bit_length() - 1
    itemsize = jnp.dtype(re.dtype).itemsize
    assert pair_inplace_supported(tuple(controls), M, n, itemsize)
    c_a, c_b = controls
    from quantumcomputer_tpu.ops.gates import modexp_combo_multipliers

    # combo[mask] is the composed INVERSE multiplier (bit k of mask = gate
    # k in ladder order), so mask m = bit_a + 2*bit_b matches the kernel's
    # m = ctrl(c_a) + 2*ctrl(c_b), and the gather is ginv_m[j] = combo[m]*j
    # mod C directly (identity for j >= C).
    combos = modexp_combo_multipliers(C, list(A_pair))
    f = np.arange(rows, dtype=np.int32)
    scheds = []
    for m in (1, 2, 3):
        ginv = np.where(f < C, (int(combos[m]) * f) % C, f).astype(np.int32)
        scheds.append(np.stack(cycle_schedule(ginv)))
    sched = jnp.asarray(np.stack(scheds))  # (3, 3, rows)
    cb2 = min(_max_slab_cb2(itemsize), r2 // 4, 1 << (min(c_a, c_b) - 7))
    lb = cb2.bit_length() - 1
    ca_bit = c_a - 7 - lb
    cb_bit = c_b - 7 - lb
    # Ascending insert positions, each tagged with its control-mask bit.
    insert_bits = tuple(sorted(((ca_bit, 0), (cb_bit, 1))))
    n_strips = rows // STRIP
    view = (rows, r2, LANE)

    def one_plane(x):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            # (masks, blocks per mask, strips): mask==0 blocks never run.
            grid=(3, r2 // cb2 // 4, n_strips),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((3, STRIP, cb2, LANE), x.dtype),  # src slots
                pltpu.VMEM((3, STRIP, cb2, LANE), x.dtype),  # out staging
                pltpu.VMEM((cb2, LANE), x.dtype),            # cycle-head original
                pltpu.SemaphoreType.DMA((3, STRIP)),
                pltpu.SemaphoreType.DMA((3, STRIP)),
                pltpu.SemaphoreType.DMA((3, STRIP)),
            ],
        )
        kernel = partial(_cycle_masked_kernel, cb2=cb2, insert_bits=insert_bits, n_strips=n_strips)
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(view, x.dtype),
            input_output_aliases={1: 0},
            interpret=_interpret(),
        )(sched, x.reshape(view))

    return one_plane(re).reshape(dim), one_plane(im).reshape(dim)


def apply_camodc_high_planar(re: jax.Array, im: jax.Array, C: int, atox: int, c_phys: int, M: int):
    """Controlled modular multiply on planar planes, M-high layout."""
    dim = re.shape[0]
    rows = 1 << M
    rest = dim // rows
    assert rows >= ROWS_PER_BLOCK, "M too small for the pallas oracle"
    assert rest >= MIN_REST, "state rows too short for aligned DMA slabs"
    r2 = rest // LANE  # aligned sub-rows per state row
    stride = 1 << c_phys
    cb2 = min(MAX_CB2, r2)
    # Pure only when full-width blocks stay inside one control run: shrinking
    # cb2 to match a smaller stride measured far worse (25.8 ms vs 11.7 ms at
    # c=10, n=28) — small row slabs drown in per-DMA overhead, so narrower
    # strides take the mixed fetch-both path at full width instead.
    pure = stride >= cb2 * LANE
    group = min(2, r2 // cb2)  # column blocks per program (double-buffered)
    ginv = jnp.asarray(modmul_inverse_permutation(C, atox, M), jnp.int32)
    view = (rows, r2, LANE)
    out_spec = pl.BlockSpec(
        (ROWS_PER_BLOCK, group * cb2, LANE), lambda j, c, g: (j, c, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(rows // ROWS_PER_BLOCK, r2 // (group * cb2)),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(out_spec, out_spec),
        scratch_shapes=[
            pltpu.VMEM((2, 2, ROWS_PER_BLOCK, cb2, LANE), re.dtype),
            pltpu.VMEM((2, 2, ROWS_PER_BLOCK, cb2, LANE), im.dtype),
            pltpu.SemaphoreType.DMA((2, 2, 2, ROWS_PER_BLOCK)),
        ],
    )
    kernel = partial(_kernel, cb2=cb2, c_phys=c_phys, pure=pure, group=group)
    ore, oim = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(view, re.dtype),
            jax.ShapeDtypeStruct(view, im.dtype),
        ),
        interpret=_interpret(),
    )(ginv, re.reshape(view), im.reshape(view))
    return ore.reshape(dim), oim.reshape(dim)
