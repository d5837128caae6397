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
integer — the oracle scalars (C, a_inv), the correction angle, and the
draw are all runtime operands (the compile-once pattern of
shor_circuit_template), so the L-step loop and the a-trial loop never
recompile.  The oracle's gather indices are generated ON DEVICE from the
two scalars (ops/gates.modmul_inverse_indices_onchip — int32 shift-add
modular multiply), so per-step host->device traffic is a few scalars even
at M=28 where a permutation table would be a 1 GiB upload.  The work
register state stays device-resident planar (2, 2^(M+1)) between steps.
"""

from __future__ import annotations

import hashlib
import math
from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from quantumcomputer_tpu.algorithms import number_theory as nt
from quantumcomputer_tpu.ops import gates as xops
from quantumcomputer_tpu.utils.logging import get_logger

log = get_logger("semiclassical")
from quantumcomputer_tpu.sim import statevec as sv


def _step_core(planar, M: int, rdtype, C_s, a_inv_s, theta, r, force):
    """One semiclassical step: H on the control, controlled modular
    multiply, deferred-phase rotation, H, measure-collapse-reset.

    Pure PLANAR arithmetic throughout — no complex materialization.  The
    control qubit c (= bit M, the top bit) splits the planar state into
    (plane, c, work) halves; every op below is expressed on those halves
    so the only full-state materializations are the oracle gather and the
    collapsed output (peak matters: at M=28 the state is 4.3 GB).

    Returns (bit int32, conditional branch probability, new planar with
    the control reset to |0>)."""
    dim = 2 << M
    pv = planar.reshape(2, 2, 1 << M)
    s2 = jnp.asarray(1.0 / math.sqrt(2.0), rdtype)
    # |c> = H|0>: the state enters each step with c = 0 — implemented as
    # the generic H butterfly so the program stays correct for any input.
    a0 = (pv[:, 0] + pv[:, 1]) * s2
    a1 = (pv[:, 0] - pv[:, 1]) * s2
    # controlled modular multiply on the c=1 half only: (C, a_inv) are
    # scalar runtime operands and the gather indices are generated ON
    # DEVICE (ops/gates.modmul_inverse_indices_onchip) — no 2^M table is
    # ever built on the host or shipped through the tunnel, which is what
    # keeps large-M steps cheap (a table at M=28 is a 1 GiB upload).
    ginv = xops.modmul_inverse_indices_onchip(C_s, a_inv_s, M)
    a1 = a1[:, ginv]
    # deferred iQFT phase e^{i theta} on the c=1 half
    ct, st = jnp.cos(theta), jnp.sin(theta)
    a1 = jnp.stack([ct * a1[0] - st * a1[1], st * a1[0] + ct * a1[1]])
    # second H butterfly
    b0 = (a0 + a1) * s2
    b1 = (a0 - a1) * s2
    # measure qubit c by inverse CDF over (p0, p1), collapse, renormalize,
    # and RESET c to |0> in the same pass: the kept half moves to the
    # c = 0 slot.
    p0 = jnp.sum(b0[0] * b0[0] + b0[1] * b0[1])
    p1 = jnp.sum(b1[0] * b1[0] + b1[1] * b1[1])
    total = p0 + p1  # 1 up to roundoff; strict states may differ
    bit = (r * total >= p0).astype(jnp.int32)
    # force >= 0 walks that branch regardless of the draw (the exact
    # distribution-parity test hook; dead branches yield p_branch ~ 0 and
    # a meaningless collapsed state, by design).
    bit = jnp.where(force >= 0, force, bit)
    p_branch = jnp.where(bit == 1, p1, p0)
    kept = jnp.where(bit == 1, b1, b0) / jnp.sqrt(p_branch).astype(rdtype)
    out = jnp.stack([kept, jnp.zeros_like(kept)], axis=1).reshape(2, dim)
    return bit, p_branch / total, out


def _attempt_fn(L: int, M: int, rdtype) -> Callable:
    """A WHOLE semiclassical attempt — all L measure-and-reset steps — as
    ONE compiled program (lax.fori_loop), so an attempt is a single device
    dispatch regardless of L.  The deferred-phase bookkeeping runs on
    device via the standard semiclassical recurrence: with steps indexed
    s = 0..L-1 (exponent j = L-1-s),

        theta_s = pi * sum_{s'<s} m_{s'} / 2^(s-s') = pi * phi_s,
        phi_{s+1} = (phi_s + m_s) / 2,   phi_0 = 0

    — one scalar carried between iterations replaces the host round-trip
    per measured bit (at M=28 through the axon tunnel, per-step dispatch
    was ~12 s/step; fused, the whole attempt is one dispatch).

    (planar (2, 2^(M+1)), C scalar, a_inv (L,), r (L,), force (L,)) ->
    (bits (L,) int32, conditional branch probs (L,), final planar).

    The control qubit is bit M (the single counting qubit).  Each
    conditional probability is the exact branch weight — the
    distribution-parity tests multiply them back into joint weights."""
    def body(s, carry):
        planar, phi, bits, probs, C_s, a_inv_arr, rs, forces = carry
        theta = (jnp.pi * phi).astype(rdtype)
        bit, p_cond, out = _step_core(
            planar, M, rdtype, C_s, a_inv_arr[s], theta, rs[s], forces[s]
        )
        phi = (phi + bit.astype(rdtype)) / 2
        return (
            out, phi, bits.at[s].set(bit), probs.at[s].set(p_cond.astype(rdtype)),
            C_s, a_inv_arr, rs, forces,
        )

    def attempt(planar, C_s, a_inv_arr, rs, forces):
        carry = (
            planar, jnp.zeros((), rdtype),
            jnp.zeros((L,), jnp.int32), jnp.zeros((L,), rdtype),
            C_s, a_inv_arr, rs, forces,
        )
        planar, _, bits, probs, *_ = jax.lax.fori_loop(0, L, body, carry)
        return bits, probs, planar

    return jax.jit(attempt, donate_argnums=(0,))


def _step_fn(M: int, rdtype) -> Callable:
    """One semiclassical step as its own compiled program (the deferred
    phase arrives as a host-computed operand).  This is the MEMORY-CEILING
    form: a fori_loop program's carries double-buffer on TPU, so at the
    largest M the fused attempt exceeds HBM where the step program still
    fits — L host dispatches buy back the last qubit."""

    def step(planar, C_s, a_inv_s, theta, r, force):
        return _step_core(planar, M, rdtype, C_s, a_inv_s, theta, r, force)

    return jax.jit(step, donate_argnums=(0,))


# Measured fused-attempt HBM footprint in units of one planar state: the
# fori_loop carries double-buffer (2x), the gather reads/writes the c=1
# halves while the butterfly temporaries live (~3x), plus the int32 index
# vector (~0.5x).  MEASURED on a 16 GB v5e: the fused form runs at M=26
# (1.07 GB state) and crashes the TPU worker at M=27 (2.15 GB) — so the
# gate budgets 8 states: 8 x 2.15 GB > 14.5 GiB rejects M=27 while
# 8 x 1.07 GB admits M=26, splitting the bisect exactly.
_FUSED_STATES_HEADROOM = 8

# The per-step program holds in+out states across the dispatch boundary
# (donation does not reduce peak through the AOT tunnel) plus ~1 state of
# butterfly/gather halves: MEASURED working at M=28 on a 16 GB v5e
# (3 x 4.3 GB = 12.9 GB of planned footprint), impossible at M=29.
_STEP_STATES_HEADROOM = 3


def fused_attempt_fits(M: int, rdtype) -> bool:
    from quantumcomputer_tpu.utils.memory import device_hbm_budget

    state_bytes = 2 * (2 << M) * jnp.dtype(rdtype).itemsize
    return _FUSED_STATES_HEADROOM * state_bytes <= device_hbm_budget()


def step_program_fits(M: int, rdtype) -> bool:
    from quantumcomputer_tpu.utils.memory import device_hbm_budget

    state_bytes = 2 * (2 << M) * jnp.dtype(rdtype).itemsize
    return _STEP_STATES_HEADROOM * state_bytes <= device_hbm_budget()


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


def _attempt_fingerprint(C, a, L, M, rdtype, key, forces) -> str:
    """Identity of one semiclassical attempt for checkpoint matching: the
    draws derive deterministically from the key, so (args, key, forces)
    pin the whole measurement record."""
    h = hashlib.sha256()
    h.update(f"semiclassical|{C}|{a}|{L}|{M}|{jnp.dtype(rdtype).name}".encode())
    h.update(np.asarray(key).tobytes())
    h.update(np.asarray(forces, np.int32).tobytes())
    return h.hexdigest()[:16]


def run_semiclassical(
    C: int,
    a: int,
    L: int,
    M: int,
    key: jax.Array,
    dtype=jnp.complex64,
    forced_bits: Optional[List[int]] = None,
    fused: Optional[bool] = None,
    checkpoint_dir: Optional[str] = None,
    checkpoint_every: int = 4,
    _cache: dict = {},
) -> SemiclassicalRecord:
    """One semiclassical period-finding attempt: L sequential one-qubit
    measurements on an (M+1)-qubit state.

    forced_bits: walk a specific measurement branch instead of sampling
    (the draws are ignored); branch_probs still record the exact
    conditional probabilities — the distribution-parity test hook.

    fused: None (default) auto-selects — the whole attempt runs as ONE
    compiled fori_loop program when the device memory budget allows
    (fused_attempt_fits), else L per-step dispatches with the deferred
    phase maintained on the host.  Both paths share _step_core.

    checkpoint_dir: snapshot (state, bits, probs) every checkpoint_every
    steps for preemption recovery — a killed attempt re-invoked with the
    same arguments resumes from the last snapshot with no re-measure (the
    measured bits travel WITH the collapsed state; the reference's
    no-remeasure semantic, qc_shor.c:299-301, is what makes the pair
    inseparable).  Forces the per-step path: the fused attempt is a
    single dispatch with no step boundary to snapshot — and it is exactly
    the memory-ceiling per-step runs (M=27-28, ~10 minutes through the
    dispatch tunnel) that need recovery."""
    if (1 << M) < C:
        raise ValueError(f"2^M={1 << M} < C={C}: the modular-multiply gate is not unitary")
    if M + 1 > 31:
        raise ValueError(f"M+1={M + 1} > 31 qubits exceeds the int32 index budget")
    if C >= (1 << 30):
        # ops/gates.modmul_onchip keeps intermediates < 2C: int32 needs C < 2^30.
        raise ValueError(f"C={C} >= 2^30 exceeds the int32 shift-add modular-arithmetic bound")
    if L > 52:
        raise ValueError(f"L={L} > 52 exceeds the float64 omega mantissa (x_tilde / 2^L)")
    if math.gcd(a, C) != 1:
        raise ValueError(f"a={a} not coprime to C={C}: gate is not a permutation")
    rdtype = sv.real_dtype_of(dtype)
    if checkpoint_dir is not None:
        fused = False  # snapshots need step boundaries (docstring)
    if fused is None:
        if not step_program_fits(M, rdtype):
            from quantumcomputer_tpu.utils.memory import device_hbm_budget

            raise ValueError(
                f"semiclassical state 2^{M + 1} amplitudes exceeds the device "
                f"memory budget ({device_hbm_budget() >> 30} GiB) even for "
                "per-step programs (M=28 is the 16 GB single-chip ceiling)"
            )
        fused = fused_attempt_fits(M, rdtype)

    # Step s applies the controlled a^(2^(L-1-s)) mod C multiply; the
    # modular inverses are L Python bigint pows — the ONLY host work.
    a_invs = np.asarray(
        [pow(pow(a, 1 << (L - 1 - s), C), -1, C) for s in range(L)], np.int32
    )
    rs = jax.random.uniform(key, (L,), dtype=rdtype)
    forces = np.full((L,), -1, np.int32)
    if forced_bits is not None:
        forces = np.asarray(forced_bits, np.int32)
    C_s = jnp.asarray(C, jnp.int32)

    # |0..01>: work register = 1, control = 0 (reset_register semantics).
    planar = sv.initial_planar(M + 1, rdtype, 1)
    if fused:
        ck = (L, M, jnp.dtype(rdtype).name)
        attempt = _cache.get(ck)
        if attempt is None:
            attempt = _cache[ck] = _attempt_fn(L, M, rdtype)
        bits_d, probs_d, _ = attempt(
            planar, C_s, jnp.asarray(a_invs), rs, jnp.asarray(forces)
        )
        bits = [int(b) for b in np.asarray(bits_d)]
        probs = [float(p) for p in np.asarray(probs_d)]
    else:
        ck = ("step", M, jnp.dtype(rdtype).name)
        step = _cache.get(ck)
        if step is None:
            step = _cache[ck] = _step_fn(M, rdtype)
        bits, probs = [], []
        phi = 0.0  # host float64: theta = pi * phi exactly as on device
        start_s = 0
        fp = None
        if checkpoint_dir is not None:
            from quantumcomputer_tpu.sim import checkpoint as ckpt

            fp = _attempt_fingerprint(C, a, L, M, rdtype, key, forces)
            # Newest snapshot MATCHING this attempt: a trial loop leaves
            # stale higher-numbered segments from earlier attempts (other
            # keys), which must not shadow this attempt's own progress.
            import os

            segs: List[int] = []
            if os.path.isdir(checkpoint_dir):
                for f in os.listdir(checkpoint_dir):
                    if f.startswith("segment_") and f.endswith(".npz"):
                        try:
                            segs.append(int(f[len("segment_"):-len(".npz")]))
                        except ValueError:
                            pass
            for seg in sorted(segs, reverse=True):
                if seg >= L:
                    continue
                try:
                    loaded, meta = ckpt.load_state(ckpt._segment_path(checkpoint_dir, seg))
                except Exception as e:
                    log.warning("semiclassical snapshot %d unreadable (%s): skipped", seg, e)
                    continue
                if meta.get("fingerprint") == fp and meta.get("step") == seg:
                    planar = loaded
                    bits = [int(b) for b in meta["bits"]]
                    probs = [float(p) for p in meta["probs"]]
                    for m in bits:  # the phi recurrence is a pure function of the bits
                        phi = (phi + m) / 2.0
                    start_s = seg
                    log.info("resuming semiclassical attempt at step %d/%d", seg, L)
                    break
            else:
                if segs:
                    log.info("no snapshot matches this attempt: cold start")
        for s in range(start_s, L):
            bit_d, p_d, planar = step(
                planar, C_s, jnp.asarray(int(a_invs[s]), jnp.int32),
                jnp.asarray(math.pi * phi, rdtype), rs[s], jnp.asarray(int(forces[s]), jnp.int32),
            )
            bit = int(bit_d)
            phi = (phi + bit) / 2.0
            bits.append(bit)
            probs.append(float(p_d))
            if checkpoint_dir is not None and (s + 1) % checkpoint_every == 0 and s + 1 < L:
                from quantumcomputer_tpu.sim import checkpoint as ckpt

                ckpt.save_state(
                    ckpt._segment_path(checkpoint_dir, s + 1), planar,
                    {"kind": "semiclassical", "fingerprint": fp, "step": s + 1,
                     "bits": bits, "probs": probs},
                )

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
    mesh=None,
    checkpoint_dir: Optional[str] = None,
) -> Tuple[Optional[int], SemiclassicalRecord]:
    """Semiclassical analog of find_period: omega -> continued fractions ->
    period test (same classical pipeline, qc_shor.c:912-964).

    mesh: shard the work register over a device mesh
    (parallel/sharded_semiclassical.py) — the modulus ceiling grows with
    chip count (single-chip HBM caps M at 28 on a 16 GB part).

    checkpoint_dir: per-step preemption snapshots (single-chip only: the
    sharded attempt is one fused dispatch with no step boundary)."""
    if mesh is not None:
        if checkpoint_dir is not None:
            raise ValueError(
                "checkpoint_dir is single-chip only: the sharded attempt is "
                "one fused dispatch with no step boundary to snapshot"
            )
        from quantumcomputer_tpu.parallel.sharded_semiclassical import (
            run_semiclassical_sharded,
        )

        rec = run_semiclassical_sharded(C, a, L, M, key, mesh, dtype)
    else:
        rec = run_semiclassical(C, a, L, M, key, dtype, checkpoint_dir=checkpoint_dir)
    period = nt.find_period_from_omega(
        rec.omega, a, C, num_fractions, trials_per_denominator
    )
    return period, rec
