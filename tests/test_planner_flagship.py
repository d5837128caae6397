"""Planner regression guard for the FLAGSHIP circuit (C=8191, M=13, m_high).

The measured single-chip numbers (bench.py, README) depend on this exact
segmentation: one fused dense segment for the H layer, per-gate DMA oracle
singles, composed oracle ladders where the kernels accept them, one fused
segment for the iQFT.  Any planner drift (e.g. from new op kinds) that
changes this structure changes the wall-clock — this test pins it.
"""

import jax.numpy as jnp

from quantumcomputer_tpu.models.shor_circuit import shor_circuit_mhigh
from quantumcomputer_tpu.ops import pallas_fused as pf
from quantumcomputer_tpu.ops.pallas_oracle import (
    ladder_high_supported,
    pair_member_supported,
)
from quantumcomputer_tpu.sim.engine import fuse_oracle_ladders

C, A, M = 8191, 3, 13


def _plan(n: int, at_ceiling: bool):
    L = n - M
    circ = shor_circuit_mhigh(C, A, L, M)
    if at_ceiling:
        fused = fuse_oracle_ladders(
            circ, 0,
            eligible=lambda g: g.name == "camodc_high"
            and pair_member_supported(g.qubits[0], g.meta[2], n, 4),
            max_run=2,
        )
    else:
        fused = fuse_oracle_ladders(
            circ, 0,
            eligible=lambda g: g.name == "camodc_high"
            and ladder_high_supported((g.qubits[0],), g.meta[2], n, 4),
        )
    return pf.plan_circuit(fused, n, 0)


def test_flagship_n28_segmentation():
    """n=28 (ladder fits): [H-layer fused] + 11 oracle singles + one
    composed 4-gate ladder + [iQFT fused]."""
    segs = _plan(28, at_ceiling=False)
    kinds = [(s[0], s[1].name if s[0] == "single" else len(s[1])) for s in segs]
    assert kinds[0] == ("fused", 15)  # 15 H butterflies (L=15)
    assert kinds[-1] == ("fused", 15)  # 15 iQFT stages
    mids = kinds[1:-1]
    assert mids.count(("single", "camodc_high")) == 11
    assert mids.count(("single", "camodc_ladder_high")) == 1


def test_flagship_n30_ceiling_segmentation():
    """n=30 (memory ceiling, K=2 pairs): [H fused] + 13 oracle singles +
    two in-place K=2 pairs + [iQFT fused]."""
    segs = _plan(30, at_ceiling=True)
    kinds = [(s[0], s[1].name if s[0] == "single" else len(s[1])) for s in segs]
    assert kinds[0] == ("fused", 17)
    assert kinds[-1] == ("fused", 17)
    mids = kinds[1:-1]
    assert mids.count(("single", "camodc_high")) == 13
    assert mids.count(("single", "camodc_ladder_high")) == 2
    for s in segs:
        if s[0] == "single" and s[1].name == "camodc_ladder_high":
            assert len(s[1].qubits) == 2  # in-place pair kernel form
