"""Semiclassical (one-control-qubit) period finding: n = M + 1 qubits.

The reference needs L + M qubits because it holds the whole counting
register in superposition and inverse-QFTs it at the end
(quantum_computation, qc_shor.c:712-737).  The Griffiths–Niu semiclassical
inverse QFT (Phys. Rev. Lett. 76, 3228 (1996); used for Shor by
Mosca–Ekert and in every experimental demonstration, e.g. Vandersypen
2001, Monz 2016) replaces the L counting qubits with ONE qubit that is
prepared, used as the oracle control, phase-corrected by the PREVIOUSLY
MEASURED bits, Hadamarded, measured, and reset — L times:

    for j = L-1 .. 0:
        |c> = H|0>
        controlled-(x -> a^(2^j) x mod C) on the work register
        PHASE(c, pi * sum_{j' already measured} m_{j'} / 2^(j'-j))
        H(c);  m_j = measure(c);  reset c
    x_tilde = sum_j m_j << (L-1-j)      (bit-reversed, like read_omega)

This is EXACTLY the reference circuit with every controlled-phase of the
iQFT ladder deferred onto its lower qubit and evaluated classically once
the upper qubit is measured — the joint outcome distribution is identical
(tests/test_semiclassical.py checks every branch probability against the
full-register engine at 1e-6).  What changes is the resource count: the
state is 2^(M+1) amplitudes instead of 2^(M+L) — factoring C=8191 takes a
2^14 state (microseconds per pass) instead of the 2^30 single-chip
ceiling.  The reference's own measurement/no-remeasure semantics are kept
per bit (inverse-CDF draw, collapse, never re-sampled).

TPU realization: ONE jitted program serves every step of every trial
integer — the oracle permutation table, the correction angle, and the PRNG
key are all runtime operands (the compile-once pattern of
shor_circuit_template), so the L-step loop and the a-trial loop never
recompile.  The work register state stays device-resident planar
(2, 2^(M+1)) between steps.
"""

from __future__ import annotations

import math
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from quantumcomputer_tpu.algorithms import number_theory as nt
from quantumcomputer_tpu.ops import gates as xops
from quantumcomputer_tpu.sim import statevec as sv


def _step_fn(M: int, rdtype) -> Callable:
    """One semiclassical step as a single compiled program.

    (planar (2, 2^(M+1)), ginv (2^M,) int32, theta scalar, r scalar) ->
    (bit int32, p_branch, new planar with the control reset to |0>).

    The control qubit is bit M (the single counting qubit).  p_branch is
    the probability of the measured outcome — the exact branch weight,
    used by the distribution-parity tests and exposed in the record."""
    c_q = M

    def step(planar, ginv, theta, r, force):
        z = sv.to_complex(planar)
        # |c> = H|0>: the state enters with c = 0, so H sends it to
        # (|0> + |1>)/sqrt(2) — implemented as the generic H butterfly so
        # the program stays correct for any input.
        h = jnp.asarray(np.array([[1.0, 1.0], [1.0, -1.0]]) / math.sqrt(2.0), z.dtype)
        z = xops.apply_1q(z, h, c_q)
        # controlled modular multiply, table as a runtime operand
        z = xops.apply_c_amodc_dyn(z, ginv, c_q, M)
        # deferred iQFT phase from the already-measured bits (theta traced)
        dim = z.shape[0]
        idx = jnp.arange(dim, dtype=jnp.int32)
        bit_c = ((idx >> c_q) & 1) == 1
        phase = jnp.where(
            bit_c, jax.lax.complex(jnp.cos(theta), jnp.sin(theta)).astype(z.dtype), 1.0
        )
        z = z * phase
        z = xops.apply_1q(z, h, c_q)
        # measure qubit c by inverse CDF over (p0, p1), collapse,
        # renormalize, and RESET c to |0> in the same pass: the kept half
        # moves to the c = 0 slot.
        re, im = jnp.real(z), jnp.imag(z)
        probs = re * re + im * im
        x = z.reshape(2, 1 << M)  # c is the top bit of an (M+1)-bit index
        p0 = jnp.sum(probs.reshape(2, 1 << M)[0])
        p1 = jnp.sum(probs.reshape(2, 1 << M)[1])
        total = p0 + p1  # 1 up to roundoff; strict states may differ
        bit = (r * total >= p0).astype(jnp.int32)
        # force >= 0 walks that branch regardless of the draw (the exact
        # distribution-parity test hook; dead branches yield p_branch ~ 0
        # and a meaningless collapsed state, by design).
        bit = jnp.where(force >= 0, force, bit)
        p_branch = jnp.where(bit == 1, p1, p0)
        kept = jnp.where(bit == 1, x[1], x[0]) / jnp.sqrt(p_branch).astype(z.dtype)
        out = jnp.concatenate([kept, jnp.zeros_like(kept)])
        return bit, p_branch / total, sv.from_complex(out)

    return jax.jit(step, donate_argnums=(0,))


class SemiclassicalRecord:
    """Outcome of one semiclassical period-finding attempt."""

    def __init__(self, bits: List[int], branch_probs: List[float], x_tilde: int, omega: float):
        self.bits = bits                  # m_{L-1} .. m_0 in measurement order
        self.branch_probs = branch_probs  # conditional probability per bit
        self.x_tilde = x_tilde
        self.omega = omega

    @property
    def probability(self) -> float:
        """Joint probability of this branch (product of conditionals)."""
        p = 1.0
        for b in self.branch_probs:
            p *= float(b)
        return p


def run_semiclassical(
    C: int,
    a: int,
    L: int,
    M: int,
    key: jax.Array,
    dtype=jnp.complex64,
    forced_bits: Optional[List[int]] = None,
    _cache: dict = {},
) -> SemiclassicalRecord:
    """One semiclassical period-finding attempt: L sequential one-qubit
    measurements on an (M+1)-qubit state.

    forced_bits: walk a specific measurement branch instead of sampling
    (the draws are ignored); branch_probs still record the exact
    conditional probabilities — the distribution-parity test hook."""
    if (1 << M) < C:
        raise ValueError(f"2^M={1 << M} < C={C}: the modular-multiply gate is not unitary")
    if M + 1 > 31:
        raise ValueError(f"M+1={M + 1} > 31 qubits exceeds the int32 index budget")
    if L > 52:
        raise ValueError(f"L={L} > 52 exceeds the float64 omega mantissa (x_tilde / 2^L)")
    rdtype = sv.real_dtype_of(dtype)
    ck = (M, jnp.dtype(rdtype).name)
    step = _cache.get(ck)
    if step is None:
        step = _cache[ck] = _step_fn(M, rdtype)

    # |0..01>: work register = 1, control = 0 (reset_register semantics).
    planar = sv.initial_planar(M + 1, rdtype, 1)
    bits: List[int] = []
    probs: List[float] = []
    for j in range(L - 1, -1, -1):
        ginv = jnp.asarray(xops.modmul_inverse_permutation(C, pow(a, 1 << j, C), M))
        theta = 0.0
        for steps_done, m in enumerate(bits):
            j_prev = L - 1 - steps_done  # exponent index of that measured bit
            theta += math.pi * m / float(1 << (j_prev - j))
        key, sub = jax.random.split(key)
        r = jax.random.uniform(sub, dtype=rdtype)
        force = jnp.asarray(
            -1 if forced_bits is None else int(forced_bits[len(bits)]), jnp.int32
        )
        bit, p_branch, planar = step(
            planar, ginv, jnp.asarray(theta, rdtype), r, force
        )
        bits.append(int(bit))
        probs.append(float(p_branch))

    # Bit-reversed readout (read_omega convention, qc_shor.c:868-883): the
    # first-measured bit (exponent L-1, physical N-1) is the LSB of x~.
    x_tilde = 0
    for pos, m in enumerate(bits):
        x_tilde |= m << pos
    omega = x_tilde / float(1 << L)
    return SemiclassicalRecord(bits, probs, x_tilde, omega)


def find_period_semiclassical(
    C: int,
    a: int,
    L: int,
    M: int,
    key: jax.Array,
    dtype=jnp.complex64,
    num_fractions: int = nt.NUM_CONTINUED_FRACTIONS,
    trials_per_denominator: int = nt.TRIALS_PER_DENOMINATOR,
) -> Tuple[Optional[int], SemiclassicalRecord]:
    """Semiclassical analog of find_period: omega -> continued fractions ->
    period test (same classical pipeline, qc_shor.c:912-964)."""
    rec = run_semiclassical(C, a, L, M, key, dtype)
    period = nt.find_period_from_omega(
        rec.omega, a, C, num_fractions, trials_per_denominator
    )
    return period, rec
