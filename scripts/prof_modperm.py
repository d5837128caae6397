"""TPU primitive-cost probes for the structured permutation ops."""
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from quantumcomputer_tpu.ops.modperm import plan_stride_permute


def sync(x):
    return float(jnp.sum(x.reshape(-1)[:4].astype(jnp.float32)))


def slope(f, x, k1=1, k2=3):
    def mk(k):
        @jax.jit
        def g(v):
            return lax.fori_loop(0, k, lambda i, s: f(s), v)
        return g
    ts = {}
    for k in (k1, k2):
        fn = mk(k)
        sync(fn(x))  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn(x))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k2] - ts[k1]) / (k2 - k1)


M = 26
C = (1 << M) - 57
while math.gcd(C, 2 * 3 * 5 * 7) != 1:
    C -= 2
a_inv = pow(pow(2, 1 << 7, C), -1, C)
plan = plan_stride_permute(C, a_inv, M)
print(f"M={M} C={C} plan: eps={plan.eps} u={plan.u} v={plan.v} W={plan.W}")

dim = 1 << M
x = jax.jit(lambda k: jax.random.normal(k, (2, dim), jnp.float32))(
    jax.random.PRNGKey(0)
)
GB = 2 * dim * 4 / 1e9
u, v = plan.u, plan.v
ualign = (u // 8) * 8


def pad_back(z):
    """Shape-preserving wrapper: truncating probes pad with zeros."""
    def deco(f):
        def g(w):
            out = f(w)
            short = dim - out.shape[-1]
            return jnp.pad(out, ((0, 0), (0, short))) if short else out
        return g
    return deco


def t_probe(cols):
    rows = dim // cols
    def f(z):
        return jnp.swapaxes(
            z[:, : rows * cols].reshape(2, rows, cols), 1, 2
        ).reshape(2, rows * cols)
    return pad_back(None)(f)


probes = [
    ("scale (true copy) ", lambda z: z * 1.0000001),
    (f"transpose {dim//u}x{u}", t_probe(u)),
    (f"transpose {dim//ualign}x{ualign} (8-mult)", t_probe(ualign)),
    ("transpose 8192x8192", t_probe(8192)),
    ("transpose 512x131072", t_probe(131072)),
]
for name, f in probes:
    per = slope(f, x)
    print(f"{name}: {per*1e3:8.2f} ms  ({2*GB/per:7.1f} GB/s 1R+1W)")

# vmapped dynamic-slice "slice gather" at varying widths, unaligned starts
for Wp in (512, 2048, 8192):
    NCp = dim // Wp

    def sg(z, Wp=Wp, NCp=NCp):
        starts = (lax.iota(jnp.int32, NCp) * 997) % (dim - Wp)
        zero = jnp.zeros((), jnp.int32)

        def chunk(s):
            return lax.dynamic_slice(z, (zero, s), (2, Wp))

        return jax.vmap(chunk, out_axes=1)(starts).reshape(2, -1)

    per = slope(sg, x)
    print(f"slice-gather W={Wp:5d} unaligned: {per*1e3:8.2f} ms  ({2*GB/per:7.1f} GB/s)")

for Wp in (2048,):
    NCp = dim // Wp

    def sg128(z, Wp=Wp, NCp=NCp):
        starts = ((lax.iota(jnp.int32, NCp) * 997) % ((dim - Wp) // 128)) * 128
        zero = jnp.zeros((), jnp.int32)

        def chunk(s):
            return lax.dynamic_slice(z, (zero, s), (2, Wp))

        return jax.vmap(chunk, out_axes=1)(starts).reshape(2, -1)

    per = slope(sg128, x)
    print(f"slice-gather W={Wp} 128-aligned: {per*1e3:8.2f} ms  ({2*GB/per:7.1f} GB/s)")

# row gather: take rows of a (R, rw) view — the natural TPU-gather unit
for rw in (128, 1024):
    R = dim // rw

    def rowg(z, rw=rw, R=R):
        zz = z.reshape(2, R, rw)
        idx = (lax.iota(jnp.int32, R) * 997) % R
        return jnp.take(zz, idx, axis=1).reshape(2, -1)

    per = slope(rowg, x)
    print(f"row-gather rw={rw:5d}: {per*1e3:8.2f} ms  ({2*GB/per:7.1f} GB/s)")

# row REVERSAL via row gather (for F_{-1} without lane flip)
def rowrev(z):
    zz = z.reshape(2, dim // 128, 128)
    idx = dim // 128 - 1 - lax.iota(jnp.int32, dim // 128)
    return jnp.take(zz, idx, axis=1).reshape(2, dim)

per = slope(rowrev, x)
print(f"row-reverse (rw=128): {per*1e3:8.2f} ms  ({2*GB/per:7.1f} GB/s)")

# lane reversal via MXU: (R,128) @ rev128
rev = jnp.eye(128, dtype=jnp.float32)[::-1]

def lanerev(z):
    zz = z.reshape(2, dim // 128, 128)
    return jax.lax.dot_general(
        zz, rev, (((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(2, dim)

per = slope(lanerev, x)
print(f"lane-reverse via MXU: {per*1e3:8.2f} ms  ({2*GB/per:7.1f} GB/s)")

# full flip = row-reverse + MXU lane-reverse
def fullflip(z):
    zz = z.reshape(2, dim // 128, 128)
    idx = dim // 128 - 1 - lax.iota(jnp.int32, dim // 128)
    zz = jnp.take(zz, idx, axis=1)
    return jax.lax.dot_general(
        zz, rev, (((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(2, dim)

per = slope(fullflip, x)
print(f"flip via rowrev+MXU: {per*1e3:8.2f} ms  ({2*GB/per:7.1f} GB/s)")
