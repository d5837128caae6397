"""TPU probes for the modperm v2 building blocks:
  P1 pallas tiled transpose (divisible shapes) at plan-like geometry
  P2 minor-dim pad relayout (deal-leg y0 build)
  P3 slice-back + flatten relayout (collect-leg output compaction)
  P4 wide vmapped dynamic-slice rates (W = 8192 / 16384 / ~Qpv)
Decides the leg structure; see prof_modperm.py / prof_rowperm.py for the
earlier primitive measurements (row-take 180 GB/s, XLA transpose 29)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def sync(x):
    return float(jnp.sum(x.reshape(-1)[:4].astype(jnp.float32)))


def timeit(f, x, reps=5):
    t0 = time.perf_counter()
    fn = jax.jit(f)
    sync(fn(x))
    comp = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(x))
        best = min(best, time.perf_counter() - t0)
    return best, comp


M = 26
dim = 1 << M
x = jax.jit(lambda k: jax.random.normal(k, (2, dim), jnp.float32))(
    jax.random.PRNGKey(0)
)
GB = 2 * dim * 4 / 1e9  # one full state read or write

u, v = 2582, 2281            # plan factors at M=26 (prof_modperm.py)
Q = dim // u                 # 25991
Qpv = (dim - 57 - 1) // v + 1  # 29421-ish collect row width


def probe(name, f, vol=2 * GB):
    try:
        per, comp = timeit(f, x)
        print(f"{name}: {per*1e3:8.2f} ms  ({vol/per:7.1f} GB/s)  compile {comp:.1f}s")
    except Exception as e:
        print(f"{name} FAILED: {type(e).__name__}: {str(e)[:180]}")


# P1: pallas tiled transpose on divisible padded shapes
from quantumcomputer_tpu.ops.pallas_transpose import _transpose_divisible

u_p = 2688
Q_p = 26112  # 25991 -> mult of 256
for br, bc in ((256, 256), (512, 512), (256, 512)):
    def f(z, br=br, bc=bc):
        zz = jnp.pad(z[:, : Q * u].reshape(2, Q, u), ((0, 0), (0, Q_p - Q), (0, u_p - u)))
        return _transpose_divisible(zz, br, bc)
    probe(f"P1 pallas tr {br}x{bc} (pad+tr)", f)

# P1b: transpose alone on a pre-padded operand
xp = jax.jit(
    lambda z: jnp.pad(z[:, : Q * u].reshape(2, Q, u), ((0, 0), (0, Q_p - Q), (0, u_p - u)))
)(x)
for br, bc in ((256, 256), (512, 512)):
    def f1(z, br=br, bc=bc):
        return _transpose_divisible(z, br, bc)
    try:
        per, comp = timeit(f1, xp)
        print(f"P1b pallas tr {br}x{bc} alone: {per*1e3:8.2f} ms  ({2*GB*1.08/per:7.1f} GB/s)  compile {comp:.1f}s")
    except Exception as e:
        print(f"P1b {br}x{bc} FAILED: {type(e).__name__}: {str(e)[:180]}")

def fx(z):
    return jnp.swapaxes(z, 1, 2)
try:
    per, comp = timeit(fx, xp)
    print(f"P1c XLA tr padded alone: {per*1e3:8.2f} ms  ({2*GB*1.08/per:7.1f} GB/s)  compile {comp:.1f}s")
except Exception as e:
    print("P1c FAILED", repr(e)[:120])

# P2: minor-dim pad relayout (what the deal leg pays to feed the kernel)
def f2(z):
    return jnp.pad(z[:, : Q * u].reshape(2, Q, u), ((0, 0), (0, 0), (0, u_p - u)))
probe("P2 minor pad (Q,u)->(Q,u_p)", f2)

# P3: slice-back + flatten (collect-leg compaction): padded (Qpv_p, v_p) -> flat
v_p = 2304
Qpv_p = ((Qpv + 255) // 256) * 256
y = jax.jit(lambda k: jax.random.normal(k, (2, Qpv_p, v_p), jnp.float32))(
    jax.random.PRNGKey(1)
)
def f3(z):
    return z[:, :Qpv, :v].reshape(2, -1)
try:
    per, comp = timeit(f3, y)
    print(f"P3 slice-back ({Qpv_p},{v_p})->flat: {per*1e3:8.2f} ms  ({2*GB*1.04/per:7.1f} GB/s)  compile {comp:.1f}s")
except Exception as e:
    print("P3 FAILED", repr(e)[:120])

# P4: wide vmapped dynamic-slice rates
for W in (8192, 16384, 32768):
    NC = dim // W
    def f4(z, W=W, NC=NC):
        starts = (lax.iota(jnp.int32, NC) * 997) % (dim - W)
        zero = jnp.zeros((), jnp.int32)
        def chunk(s):
            return lax.dynamic_slice(z, (zero, s), (2, W))
        return jax.vmap(chunk, out_axes=1)(starts).reshape(2, -1)
    probe(f"P4 dyn-slice W={W:5d}", f4)

# P4b: row-pair take + select emulating a W-wide chunk fetch at row granularity:
# chunk covers rows [r0, r0 + W/128]; one take of NC*(W/128+1) rows (1.01x read)
for W in (8192,):
    NC = dim // W
    K = W // 128 + 1
    R = dim // 128
    def f4b(z, W=W, NC=NC, K=K, R=R):
        zz = z.reshape(2, R, 128)
        starts = ((lax.iota(jnp.int32, NC) * 997) % (dim - W)) // 128
        idx = jnp.clip(starts[:, None] + lax.iota(jnp.int32, K)[None, :], 0, R - 1)
        g = jnp.take(zz, idx.reshape(-1), axis=1)
        return g.reshape(2, NC, K * 128)[:, :, :W].reshape(2, -1)
    probe(f"P4b row-take chunks W={W}", f4b)
