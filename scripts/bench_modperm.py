"""TPU microbench: structured stride permutation vs XLA element gather."""
import time
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from quantumcomputer_tpu.ops.gates import modmul_permute_onchip
from quantumcomputer_tpu.ops.modperm import plan_stride_permute, apply_stride_permute


def sync(x):
    return float(jnp.sum(x.reshape(-1)[:4].astype(jnp.float32)))


def timeit(f, *args, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def slope(f, args, k1=1, k2=5):
    """Iterate f k times chained inside jit; report (t_k2-t_k1)/(k2-k1)."""
    def mk(k):
        @jax.jit
        def g(x):
            def body(i, v):
                return f(v)
            return lax.fori_loop(0, k, body, x)
        return g
    fns = {k: mk(k) for k in (k1, k2)}
    ts = {}
    for k, fn in fns.items():
        t0 = time.perf_counter()
        sync(fn(*args))
        compile_s = time.perf_counter() - t0
        ts[k] = timeit(fn, *args)
    return (ts[k2] - ts[k1]) / (k2 - k1), compile_s


for M, dt in ((26, jnp.float32), (28, jnp.float32), (28, jnp.bfloat16)):
    C = (1 << M) - 57 if M == 26 else (1 << M) - 157
    import math
    while math.gcd(C, 2 * 3 * 5 * 7) != 1:
        C -= 2
    a = 2
    a_inv = pow(pow(a, 1 << 7, C), -1, C)
    plan = plan_stride_permute(C, a_inv, M)
    print(f"--- M={M} dtype={jnp.dtype(dt).name} C={C} a_inv={a_inv}")
    print(f"plan: eps={plan.eps} u={plan.u} v={plan.v} W={plan.W}")
    x = jax.jit(lambda k: jax.random.normal(k, (2, 1 << M)).astype(dt))(
        jax.random.PRNGKey(0)
    )

    # structured
    t0 = time.perf_counter()
    f_struct = lambda v: apply_stride_permute(v, plan)
    per, comp = slope(f_struct, (x,))
    bytes_state = 2 * (1 << M) * jnp.dtype(dt).itemsize
    print(f"structured: {per*1e3:8.2f} ms/apply  ({bytes_state*2/per/1e9:6.1f} GB/s eff 1R+1W)  compile {comp:.1f}s")

    # XLA gather baseline (the current _oracle_pass movement)
    def f_gather(v):
        idx = modmul_permute_onchip(a_inv, lax.iota(jnp.int32, 1 << M), C, M)
        return v[:, idx]
    per_g, comp_g = slope(f_gather, (x,), k1=1, k2=2)
    print(f"xla gather: {per_g*1e3:8.2f} ms/apply  ({bytes_state*2/per_g/1e9:6.1f} GB/s eff)  compile {comp_g:.1f}s")
    print(f"speedup: {per_g/per:.1f}x")
