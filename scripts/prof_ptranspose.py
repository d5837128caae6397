"""TPU probes for the modperm v2 building blocks, SLOPE-timed (chained
iterations inside one jit — the ~35-40 ms per-dispatch tunnel overhead
otherwise swamps every measurement; see bench.py's method note).

  P1 pallas tiled transpose vs XLA at plan-like geometry (round trip / 2)
  P2 minor-dim pad relayout + unpad (deal-leg y0 feed)         (pair / 2)
  P3 slice-back + flatten (collect-leg output compaction)
  P4 wide vmapped dynamic-slice rates
  P5 full apply_stride_permute old-vs-new end-to-end
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

from quantumcomputer_tpu.ops.pallas_transpose import _transpose_divisible


def sync(x):
    return float(jnp.sum(x.reshape(-1)[:4].astype(jnp.float32)))


def slope(f, x, k1=1, k2=3):
    """f must be shape-preserving; returns (per-apply seconds, compile s)."""
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
x = jax.jit(lambda k: jax.random.normal(k, (2, dim), jnp.float32))(
    jax.random.PRNGKey(0)
)
GB = 2 * dim * 4 / 1e9

u, v = 2582, 2281
Q = dim // u
C = 67108807
Qpv = (C - 1) // v + 1


def probe(name, f, x0=x, vol=2 * GB):
    try:
        per, comp = slope(f, x0)
        print(f"{name}: {per*1e3:8.2f} ms  ({vol/per:7.1f} GB/s)  compile {comp:.1f}s")
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:180]}")


# P1: round-trip transposes (2 transposes per iteration -> halve time)
u_p, Q_p = 2688, 26112
xp = jax.jit(
    lambda z: jnp.pad(z[:, : Q * u].reshape(2, Q, u), ((0, 0), (0, Q_p - Q), (0, u_p - u)))
)(x)
for br, bc in ((256, 256), (512, 512)):
    def f1(z, br=br, bc=bc):
        return _transpose_divisible(_transpose_divisible(z, br, bc), bc, br)
    try:
        per, comp = slope(f1, xp)
        print(f"P1 pallas tr {br}x{bc} round-trip/2: {per/2*1e3:8.2f} ms  "
              f"({2*GB*1.08/(per/2):7.1f} GB/s)  compile {comp:.1f}s")
    except Exception as e:
        print(f"P1 {br}x{bc} FAILED: {type(e).__name__}: {str(e)[:160]}")

def f1x(z):
    return jnp.swapaxes(jnp.swapaxes(z, 1, 2), 1, 2)
try:
    per, comp = slope(f1x, xp)
    print(f"P1c XLA tr round-trip/2: {per/2*1e3:8.2f} ms  ({2*GB*1.08/(per/2):7.1f} GB/s)  compile {comp:.1f}s")
except Exception as e:
    print("P1c FAILED", repr(e)[:140])

# P2: minor pad + unpad per iteration (halve for one-way)
def f2(z):
    zz = z[:, : Q * u].reshape(2, Q, u)
    zp = jnp.pad(zz, ((0, 0), (0, 0), (0, u_p - u)))
    back = zp[:, :, :u].reshape(2, -1)
    return jnp.concatenate([back, z[:, Q * u :]], axis=1)
probe("P2 minor pad+unpad (x2)", f2)

# P3: slice-back + flatten; shape-preserving via re-pad (measures pair)
v_p = 2304
Qpv_p = ((Qpv + 255) // 256) * 256
y = jax.jit(lambda k: jax.random.normal(k, (2, Qpv_p, v_p), jnp.float32))(
    jax.random.PRNGKey(1)
)
def f3(z):
    flat = z[:, :Qpv, :v].reshape(2, -1)
    return jnp.pad(
        flat.reshape(2, Qpv, v), ((0, 0), (0, Qpv_p - Qpv), (0, v_p - v))
    )
probe("P3 slice-back+repad (x2)", f3, x0=y, vol=2 * GB * 1.04)

# P4: wide vmapped dynamic slices (shape-preserving already)
for W in (2048, 8192, 16384, 32768):
    NC = dim // W
    def f4(z, W=W, NC=NC):
        starts = (lax.iota(jnp.int32, NC) * 997) % (dim - W)
        zero = jnp.zeros((), jnp.int32)
        def chunk(s):
            return lax.dynamic_slice(z, (zero, s), (2, W))
        return jax.vmap(chunk, out_axes=1)(starts).reshape(2, -1)
    probe(f"P4 dyn-slice W={W:5d}", f4)

# P5: full structured permutation end-to-end (shape-preserving)
from quantumcomputer_tpu.ops.modperm import apply_stride_permute, plan_stride_permute

a_inv = pow(pow(2, 1 << 7, C), -1, C)
for cap in (2048, 8192, 16384):
    plan = plan_stride_permute(C, a_inv, M, max_chunk=cap)
    def f5(z, plan=plan):
        return apply_stride_permute(z, plan)
    probe(f"P5 apply_stride_permute W={plan.W}", f5)
