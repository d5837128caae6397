"""Validation experiments mirroring the reference's methodology.

The reference validates statistically (SURVEY.md §4): Report §IV.B /
TABLE I runs factoring 15 (L=3, M=4, a=7) 100 times and compares the
measured-omega histogram against Candela's published counts; Report §IV.A /
FIG. 2 tracks norm conservation through every gate of factoring 39.  These
helpers reproduce both experiments on the TPU engine.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from quantumcomputer_tpu.algorithms.shor import read_omega
from quantumcomputer_tpu.models.shor_circuit import shor_circuit, shor_circuit_mhigh
from quantumcomputer_tpu.sim.engine import Register, StateVectorEngine


def omega_histogram(
    C: int,
    a: int,
    L: int,
    M: int,
    runs: int = 100,
    seed: int = 0,
    engine: Optional[StateVectorEngine] = None,
) -> Dict[float, int]:
    """TABLE I experiment: `runs` independent period-finding executions,
    each a fresh reset -> circuit -> single measurement (the no-remeasure
    semantic, qc_shor.c:299-301) — returns the omega -> count histogram.

    For (C=15, a=7, L=3, M=4) theory gives exactly uniform counts over
    {0, 1/4, 1/2, 3/4}; Candela's published 100-run counts are
    27/25/30/18 and the reference reproduced 25.6/23.2/25.4/25.6
    (Report TABLE I).
    """
    if engine is None:
        engine = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex64)
    mhigh = getattr(engine, "layout", "standard") == "m_high"
    circuit = shor_circuit_mhigh(C, a, L, M) if mhigh else shor_circuit(C, a, L, M)
    key = jax.random.PRNGKey(seed)
    hist: Counter = Counter()
    for _ in range(runs):
        key, sub = jax.random.split(key)
        idx, _ = engine.run_and_measure(circuit, sub)
        if mhigh:
            idx = engine.logical_index(idx)
        hist[read_omega(idx, L, M)] += 1
    return dict(hist)


def norm_deviation_trace(C: int, a: int, L: int, M: int, engine: Optional[StateVectorEngine] = None):
    """FIG. 2 experiment: per-gate norm deviations through the gate-for-gate
    circuit (Report §IV.A tracked factoring 39 at L=6, M=6; max deviation
    2.4e-15 in double precision)."""
    from quantumcomputer_tpu.models.shor_circuit import shor_circuit_reference
    from quantumcomputer_tpu.utils.profiling import norm_trace

    if engine is None:
        engine = StateVectorEngine(Register(L=L, M=M), dtype=jnp.complex128)
    return norm_trace(engine, shor_circuit_reference(C, a, L, M))
