"""TPU: structured vs gather semiclassical attempts at large M."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from quantumcomputer_tpu.algorithms.semiclassical import run_semiclassical

CASES = [
    # (C just below 2^M, M, L, dtype)
    (67108807, 26, 8, jnp.complex64),
    (268435297, 28, 8, jnp.complex64),
    (268435297, 28, 8, "complex32"),
]

for C, M, L, dt in CASES:
    name = dt if isinstance(dt, str) else jnp.dtype(dt).name
    for structured in (True, False):
        key = jax.random.PRNGKey(0)
        t0 = time.perf_counter()
        rec = run_semiclassical(C, 2, L, M, key, dt, structured=structured)
        t_cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        rec = run_semiclassical(C, 2, L, M, jax.random.PRNGKey(1), dt,
                                structured=structured)
        t_warm = time.perf_counter() - t0
        print(f"M={M} {name} L={L} structured={structured}: "
              f"cold {t_cold:7.2f}s  warm {t_warm:7.2f}s  "
              f"({t_warm/L*1e3:7.1f} ms/step)", flush=True)
