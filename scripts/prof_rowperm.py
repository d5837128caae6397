"""TPU probes for the row-gather + variable-lane-rotate permutation legs.

Decides the rebuild of ops/modperm's two legs: the committed versions run
at 3-6 GB/s (vmapped dynamic slices + unaligned transposes); jnp.take of
whole 128-lane rows runs at 180 GB/s (prof_modperm.py).  The missing
primitive is "gather a 128-element run at an ARBITRARY element offset":
   take rows floor(start/128) and +1  ->  per-row variable lane rotate.
This script measures the candidates for the rotate and the aligned
transpose, plus compile times.
"""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def sync(x):
    if isinstance(x, tuple):
        x = x[0]
    return float(jnp.sum(x.reshape(-1)[:4].astype(jnp.float32)))


def slope(f, x, k1=1, k2=3):
    def mk(k):
        @jax.jit
        def g(v):
            return lax.fori_loop(0, k, lambda i, s: f(s), v)
        return g
    ts = {}
    comp = 0.0
    for k in (k1, k2):
        fn = mk(k)
        t0 = time.perf_counter()
        sync(fn(x))  # compile
        comp = max(comp, time.perf_counter() - t0)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn(x))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k2] - ts[k1]) / (k2 - k1), comp


M = 26
dim = 1 << M
R = dim // 128
x = jax.jit(lambda k: jax.random.normal(k, (2, dim), jnp.float32))(
    jax.random.PRNGKey(0)
)
GB = 2 * dim * 4 / 1e9
key = jax.random.PRNGKey(1)
# arbitrary run starts (element granularity), one per output row
starts_np = np.random.RandomState(0).randint(0, dim - 129, size=(R,)).astype(np.int32)


def probe(name, f):
    per, comp = slope(f, x)
    print(f"{name}: {per*1e3:8.2f} ms  ({2*GB/per:7.1f} GB/s 1R+1W)  compile {comp:.1f}s")


# 0. reference: plain row gather (row-aligned starts)
def f_rowtake(z):
    zz = z.reshape(2, R, 128)
    idx = starts_np // 128
    return jnp.take(zz, jnp.asarray(idx), axis=1).reshape(2, dim)
probe("row-take aligned      ", f_rowtake)


# 1. runs at arbitrary starts: take rows r0 and r0+1 (one take of 2R rows),
#    then 7-stage variable roll + select between the two takes.
def f_runs_roll7(z):
    zz = z.reshape(2, R, 128)
    st = jnp.asarray(starts_np)
    r0 = st // 128
    c = st % 128  # left-rotate amount per output row
    pair = jnp.stack([r0, r0 + 1], axis=1).reshape(-1)  # (2R,)
    g = jnp.take(zz, pair, axis=1).reshape(2, R, 2, 128)
    a, b = g[:, :, 0, :], g[:, :, 1, :]
    # rolled_a[l] = a[(l + c) mod 128]; build via 7 conditional fixed rolls
    for k in range(7):
        s = 1 << k
        bit = ((c >> k) & 1).astype(bool)[None, :, None]
        a = jnp.where(bit, jnp.roll(a, -s, axis=-1), a)
        b = jnp.where(bit, jnp.roll(b, -s, axis=-1), b)
    lane = lax.iota(jnp.int32, 128)[None, None, :]
    out = jnp.where(lane < (128 - c)[None, :, None], a, b)
    return out.reshape(2, dim)
probe("runs take+roll7+sel   ", f_runs_roll7)


# 1b. same but roll ONE stacked tensor (a,b together) to halve the select count
def f_runs_roll7_packed(z):
    zz = z.reshape(2, R, 128)
    st = jnp.asarray(starts_np)
    r0 = st // 128
    c = st % 128
    pair = jnp.stack([r0, r0 + 1], axis=1).reshape(-1)
    g = jnp.take(zz, pair, axis=1).reshape(2, R, 2, 128)
    for k in range(7):
        s = 1 << k
        bit = ((c >> k) & 1).astype(bool)[None, :, None, None]
        g = jnp.where(bit, jnp.roll(g, -s, axis=-1), g)
    lane = lax.iota(jnp.int32, 128)[None, None, :]
    out = jnp.where(lane < (128 - c)[None, :, None], g[:, :, 0, :], g[:, :, 1, :])
    return out.reshape(2, dim)
probe("runs packed roll7     ", f_runs_roll7_packed)


# 2. 8-aligned runs: starts rounded to sublane (8): take on the (dim/8, 8)
#    view (rw=8 rows) + 3-stage roll.  Measures whether sublane-granular
#    take is usable.
def f_runs8(z):
    zz = z.reshape(2, dim // 8, 8)
    st = jnp.asarray((starts_np // 8) * 8)
    r0 = st // 8
    idx = (r0[:, None] + lax.iota(jnp.int32, 17)[None, :]).reshape(-1)  # 17*8 > 128+8
    g = jnp.take(zz, idx, axis=1).reshape(2, R, 17 * 8)
    return g[:, :, :128].reshape(2, dim)
probe("runs rw=8 take        ", f_runs8)


# 3. padded aligned transpose: (Qp, u) view with u unaligned -> pad u to
#    multiple of 128 and Qp to multiple of 8, transpose, compare raw rate.
u = 2582
Qp = dim // u
u_pad = ((u + 127) // 128) * 128
Qp_pad = ((Qp + 7) // 8) * 8
def f_transpose_padded(z):
    zz = z[:, : Qp * u].reshape(2, Qp, u)
    zz = jnp.pad(zz, ((0, 0), (0, Qp_pad - Qp), (0, u_pad - u)))
    t = jnp.swapaxes(zz, 1, 2)  # (2, u_pad, Qp_pad)
    out = t.reshape(2, -1)[:, :dim]
    return out
probe(f"transpose pad {Qp_pad}x{u_pad}", f_transpose_padded)


# 4. one-pass interleave: transpose with minor dim 128 exactly
def f_transpose_128(z):
    zz = z.reshape(2, dim // 128, 128)
    t = jnp.swapaxes(zz, 1, 2)
    return t.reshape(2, dim)
probe("transpose (R,128)->(128,R)", f_transpose_128)


# 5. Pallas dynamic roll probe: per-8-row-block shared dynamic shift
try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(c_ref, x_ref, o_ref):
        i = pl.program_id(0)
        c = c_ref[i]
        o_ref[...] = pltpu.roll(x_ref[...], -c, 1)

    def f_pallas_dynroll(z):
        zz = z.reshape(2 * R // 8, 8, 128)
        c = jnp.asarray(starts_np % 128)[: zz.shape[0]]
        grid = zz.shape[0]
        out = pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[pl.BlockSpec((1, 8, 128), lambda i, c: (i, 0, 0))],
                out_specs=pl.BlockSpec((1, 8, 128), lambda i, c: (i, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct(zz.shape, zz.dtype),
        )(c, zz)
        return out.reshape(2, dim)

    probe("pallas dyn-roll blk8  ", f_pallas_dynroll)
except Exception as e:
    print("pallas dyn-roll probe failed:", repr(e))


# 6. Pallas per-row dynamic roll (8 rolls per block)
try:
    def kern2(c_ref, x_ref, o_ref):
        i = pl.program_id(0)
        for k in range(8):
            c = c_ref[i * 8 + k]
            o_ref[0, k, :] = pltpu.roll(x_ref[0, k, :], -c, 0)

    def f_pallas_rowroll(z):
        zz = z.reshape(2 * R // 8, 8, 128)
        c = jnp.asarray(np.tile(starts_np % 128, 2)[: zz.shape[0] * 8])
        grid = zz.shape[0]
        out = pl.pallas_call(
            kern2,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[pl.BlockSpec((1, 8, 128), lambda i, c: (i, 0, 0))],
                out_specs=pl.BlockSpec((1, 8, 128), lambda i, c: (i, 0, 0)),
            ),
            out_shape=jax.ShapeDtypeStruct(zz.shape, zz.dtype),
        )(c, zz)
        return out.reshape(2, dim)

    probe("pallas per-row roll   ", f_pallas_rowroll)
except Exception as e:
    print("pallas per-row roll probe failed:", repr(e))
