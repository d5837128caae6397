"""Microbenchmarks for the Pallas unaligned-chunk-gather primitive.

Decides the realization of the semiclassical structured-permutation legs
(ops/modperm.py): per-chunk DMA at scalar-prefetched offsets + in-kernel
realignment.  Variants (M=26 plane, f32, W-element chunks):

  copy      : contiguous chunked copy (identity offsets) — the DMA ceiling
  aligned   : chunk gather at random 1024-aligned starts
  roll2     : + pltpu.roll realignment (sublane + lane) — arbitrary starts
  mxuroll   : + roll for sublanes, MXU permutation matmul for lanes
  transpose : tiled_transpose at plan shapes

Lowering constraints found on the way (v5e, jax 0.9):
  * lax.dynamic_slice on VALUES is not lowered (refs only) — realignment
    must go through pltpu.roll / matmuls;
  * output block shapes need the last two dims (8, 128)-divisible.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
M = int(os.environ.get("PROF_M", "26"))
DIM = 1 << M
W = int(os.environ.get("PROF_W", "16384"))  # chunk elements (64 KB f32)
NC = DIM // W
KT = W // 1024  # 1024-element tiles per chunk
WR = W // LANE  # chunk rows of 128 lanes


def sync(x):
    return float(jnp.sum(x.reshape(-1)[:4].astype(jnp.float32)))


def slope(f, *args, k1=4, k2=20):
    def mk(k):
        @jax.jit
        def g(v, *rest):
            return lax.fori_loop(0, k, lambda i, s: f(s, *rest), v)
        return g
    ts = {}
    for k in (k1, k2):
        fn = mk(k)
        t0 = time.perf_counter()
        sync(fn(*args))
        comp = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn(*args))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k2] - ts[k1]) / (k2 - k1), comp


def _mk_grid(x, extra_tiles):
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(NC,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, WR, LANE), lambda i, s: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((KT + extra_tiles, 8, LANE), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )


def _call(kernel, x, starts, extra_tiles):
    x3 = x.reshape(x.size // 1024, 8, LANE)
    return pl.pallas_call(
        kernel, grid_spec=_mk_grid(x, extra_tiles),
        out_shape=jax.ShapeDtypeStruct((NC, WR, LANE), x.dtype),
    )(starts, x3).reshape(DIM)


def _copy_kernel(starts_ref, x_any, o_ref, slab, sems):
    i = pl.program_id(0)
    t10 = starts_ref[i] >> 10
    cp = pltpu.make_async_copy(x_any.at[pl.ds(t10, KT)], slab, sems)
    cp.start()
    cp.wait()
    o_ref[...] = slab[...].reshape(o_ref.shape)


def chunk_gather_aligned(x, starts):
    return _call(_copy_kernel, x, starts, 0)


def _roll2_kernel(starts_ref, x_any, o_ref, slab, sems):
    i = pl.program_id(0)
    s = starts_ref[i]
    t10 = s >> 10
    cp = pltpu.make_async_copy(x_any.at[pl.ds(t10, KT + 1)], slab, sems)
    cp.start()
    cp.wait()
    flat = slab[...].reshape((KT + 1) * 8, LANE)
    d = (s >> 7) & 7
    r = s & 127
    rows = pltpu.roll(flat, -d, 0)   # row d -> row 0
    rot = pltpu.roll(rows, -r, 1)    # lane r -> lane 0 (per row)
    lane = lax.broadcasted_iota(jnp.int32, (WR, LANE), 1)
    out = jnp.where(lane < 128 - r, rot[:WR, :], rot[1:WR + 1, :])
    o_ref[...] = out.reshape(o_ref.shape)


def chunk_gather_roll2(x, starts):
    return _call(_roll2_kernel, x, starts, 1)


def _mxuroll_kernel(starts_ref, x_any, o_ref, slab, sems):
    i = pl.program_id(0)
    s = starts_ref[i]
    t10 = s >> 10
    cp = pltpu.make_async_copy(x_any.at[pl.ds(t10, KT + 1)], slab, sems)
    cp.start()
    cp.wait()
    flat = slab[...].reshape((KT + 1) * 8, LANE)
    d = (s >> 7) & 7
    r = s & 127
    rows = pltpu.roll(flat, -d, 0)
    # P[j, q] = 1 where q = (j - r) mod 128 => (g @ P)[p, q] = g[p, (q+r)%128]
    jj = lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
    qq = lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
    P = ((jj - r) % 128 == qq).astype(flat.dtype)
    rot = jax.lax.dot(rows[:WR + 1, :], P, precision=lax.Precision.HIGHEST)
    lane = lax.broadcasted_iota(jnp.int32, (WR, LANE), 1)
    out = jnp.where(lane < 128 - r, rot[:WR, :], rot[1:WR + 1, :])
    o_ref[...] = out.reshape(o_ref.shape)


def chunk_gather_mxuroll(x, starts):
    return _call(_mxuroll_kernel, x, starts, 1)


def np_expect(xh, starts_h):
    out = np.empty(DIM, np.float32)
    for i, s in enumerate(starts_h):
        out[i * W:(i + 1) * W] = xh[s:s + W]
    return out


VARIANTS = [
    ("copy    ", chunk_gather_aligned, None),
    ("aligned ", chunk_gather_aligned, 1024),
    ("roll2   ", chunk_gather_roll2, 1),
    ("mxuroll ", chunk_gather_mxuroll, 1),
]


def main():
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(k, (DIM,), jnp.float32))(key)
    GB = DIM * 4 / 1e9

    rng = np.random.default_rng(0)

    def starts_for(align):
        s = rng.integers(0, DIM - W - 1024, NC).astype(np.int32)
        return (s // align * align).astype(np.int32)

    xh = np.asarray(x)

    for name, fn, align in VARIANTS:
        if align is None:
            st = (np.arange(NC, dtype=np.int32) * W)
        else:
            st = starts_for(align)
        stj = jnp.asarray(st)
        try:
            got = np.asarray(jax.jit(fn)(x, stj))
            exp = np_expect(xh, st)
            ok = np.array_equal(got, exp)
            per, comp = slope(fn, x, stj)
            print(f"{name}: {per*1e3:8.2f} ms  ({2*GB/per:6.1f} GB/s RW)  ok={ok}  compile {comp:.0f}s", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}", flush=True)

    from quantumcomputer_tpu.ops.pallas_transpose import tiled_transpose
    for shape, blk in [((8192, 8192), 256), ((16384, 4096), 256), ((4100, 16384), 256)]:
        y = jax.jit(lambda k: jax.random.normal(k, (1,) + shape, jnp.float32))(key)
        gb = y.size * 4 / 1e9
        try:
            f = lambda z: tiled_transpose(tiled_transpose(z, block=(blk, blk)), block=(blk, blk))
            per, comp = slope(f, y, k1=2, k2=10)
            per = per / 2
            print(f"transpose {shape} blk={blk}: {per*1e3:8.2f} ms  ({2*gb/per:6.1f} GB/s RW)  compile {comp:.0f}s", flush=True)
        except Exception as e:
            print(f"transpose {shape} blk={blk}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
