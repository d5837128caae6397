"""Slope-timed per-leg breakdown of apply_stride_permute at M=26."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from quantumcomputer_tpu.ops import modperm
from quantumcomputer_tpu.ops.modperm import (
    _collect_leg, _deal_leg, _negate_mod, plan_stride_permute,
)


def sync(x):
    return float(jnp.sum(x.reshape(-1)[:4].astype(jnp.float32)))


def slope(f, x, k1=1, k2=3):
    def mk(k):
        @jax.jit
        def g(v):
            return lax.fori_loop(0, k, lambda i, s: f(s), v)
        return g
    ts, comp = {}, 0.0
    for k in (k1, k2):
        fn = mk(k)
        t0 = time.perf_counter()
        sync(fn(x))
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
C = 67108807
a_inv = pow(pow(2, 1 << 7, C), -1, C)
x = jax.jit(lambda k: jax.random.normal(k, (2, dim), jnp.float32))(
    jax.random.PRNGKey(0)
)
GB = 2 * dim * 4 / 1e9

plan = plan_stride_permute(C, a_inv, M, max_chunk=16384)
print(f"plan: eps={plan.eps} u={plan.u} v={plan.v} W={plan.W}")

per, comp = slope(lambda z: _collect_leg(z, plan.C, plan.v, plan.vinv, plan.M), x)
print(f"collect leg: {per*1e3:8.2f} ms  ({2*GB/per:6.1f} GB/s)  compile {comp:.1f}s")

per, comp = slope(lambda z: _deal_leg(z, plan.C, plan.u, plan.M, plan.W), x)
print(f"deal leg   : {per*1e3:8.2f} ms  ({2*GB/per:6.1f} GB/s)  compile {comp:.1f}s")

per, comp = slope(lambda z: _negate_mod(z, plan.C), x)
print(f"negate     : {per*1e3:8.2f} ms  ({2*GB/per:6.1f} GB/s)  compile {comp:.1f}s")

# deal-leg pieces
B = 2
Qp = (C - 1) // plan.u + 1
W, u = plan.W, plan.u


def build_y0(z):
    used = min(dim, Qp * u)
    mid = z[:, :used]
    if Qp * u > used:
        mid = jnp.pad(mid, ((0, 0), (0, Qp * u - used)))
    zpad = jnp.zeros((B, W * u), z.dtype)
    w2 = jnp.concatenate([zpad, mid, zpad], axis=1).reshape(B, W + Qp + W, u)
    return modperm._tr(w2)


y0 = jax.jit(build_y0)(x)
print("y0 shape:", y0.shape)


def f_build(z):
    y = build_y0(z)
    return y.reshape(B, -1)[:, :dim]
per, comp = slope(f_build, x)
print(f"deal build+tr: {per*1e3:8.2f} ms  compile {comp:.1f}s")

# chunk extraction alone, on the prebuilt y0 (shape-preserving on y0 is
# hard; measure with output reshaped to y0-like by padding)
from quantumcomputer_tpu.ops.gates import modmul_onchip

NC = dim // W
j0 = lax.iota(jnp.int32, NC) * W
nbits = max(1, u.bit_length())
in_range = j0 < C
rem0 = jnp.where(in_range, modmul_onchip(u, jnp.where(in_range, j0, 0), C, nbits), j0)
t1 = rem0 % u
q1 = rem0 // u
istar = jnp.clip((C - rem0 + u - 1) // u, 0, W)
t2 = jnp.clip(rem0 + istar * u - C, 0, u - 1)
zero = jnp.zeros((), jnp.int32)


def chunks_2d(y):
    def chunk(t1c, q1c, isc, t2c):
        g0 = lax.dynamic_slice(y, (zero, t1c, W + q1c), (B, 1, W))
        g1 = lax.dynamic_slice(y, (zero, t2c, W - isc), (B, 1, W))
        lane = lax.iota(jnp.int32, W)
        return jnp.where(lane[None, None, :] < isc, g0, g1)
    out = jax.vmap(chunk, in_axes=(0, 0, 0, 0), out_axes=2)(t1, q1, istar, t2)
    out = out.reshape(B, dim)
    pad = y.shape[1] * y.shape[2] - dim
    return jnp.pad(out, ((0, 0), (0, pad))).reshape(y.shape)


per, comp = slope(chunks_2d, y0)
print(f"chunks 2D-start: {per*1e3:8.2f} ms  compile {comp:.1f}s")

pitch = y0.shape[2]


def chunks_1d(y):
    yf = y.reshape(B, -1)
    s0 = t1 * pitch + (W + q1)
    s1 = t2 * pitch + (W - istar)

    def chunk(a, b):
        g0 = lax.dynamic_slice(yf, (zero, a), (B, W))
        g1 = lax.dynamic_slice(yf, (zero, b), (B, W))
        return g0, g1

    g0, g1 = jax.vmap(chunk, in_axes=(0, 0), out_axes=1)(s0, s1)
    lane = lax.iota(jnp.int32, W)
    out = jnp.where(lane[None, None, :] < istar[None, :, None], g0, g1)
    out = out.reshape(B, dim)
    pad = y.shape[1] * y.shape[2] - dim
    return jnp.pad(out, ((0, 0), (0, pad))).reshape(y.shape)


per, comp = slope(chunks_1d, y0)
print(f"chunks 1D-start: {per*1e3:8.2f} ms  compile {comp:.1f}s")

# collect pieces
v, vinv = plan.v, plan.vinv
Qpv = (C - 1) // v + 1


def collect_rows(z):
    x_ext = jnp.concatenate([z[:, :C], z[:, :Qpv]], axis=-1)
    nb = max(1, C.bit_length())
    t = lax.iota(jnp.int32, v)
    j0c = modmul_onchip(vinv, t, C, nb)

    def row(j):
        return lax.dynamic_slice(x_ext, (zero, j), (B, Qpv))

    y0c = jax.vmap(row, out_axes=1)(j0c)
    return y0c.reshape(B, -1)[:, :dim]


per, comp = slope(collect_rows, x)
print(f"collect rows(slices): {per*1e3:8.2f} ms  compile {comp:.1f}s")
