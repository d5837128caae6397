"""Variational algorithms: Pauli observables, differentiable ansätze, VQE, QAOA.

Beyond-reference capability (the reference, qc_shor.c, is Shor-only): a
variational layer built the TPU way.  The engine's circuit programs bake
gate angles in as compiled constants — ideal for Shor's fixed circuits,
useless for an optimizer that changes every angle every step.  Here the
parameters are *traced operands* instead: one XLA program computes
state -> energy -> gradient for EVERY optimizer iteration, so a thousand
Adam steps cost one compile.  Gradients come from `jax.grad` straight
through the state evolution (holomorphic structure handled by keeping the
energy real-valued), not from parameter-shift resampling — exact, and one
backward pass per step regardless of parameter count.

Layout conventions match the engine (`sim/statevec.py`): qubit b is bit b
of the basis index, LSB-first; states cross jit boundaries as planar
(2, 2^n) real arrays (complex never crosses the device boundary on this
platform).  All compute inside jit is complex64/complex128.

Scaling notes (TPU): every primitive here is an elementwise pass or an
axis-strided butterfly over the (2,)*n tensor — XLA fuses each
rotation+entangler layer into O(1) HBM passes; there are no matmuls to
mis-tile and no data-dependent control flow.  Entangler signs and cost
diagonals are precomputed host-side once per (n, graph) and closed over
as constants.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from quantumcomputer_tpu.sim import statevec as sv

# ---------------------------------------------------------------------------
# Pauli-string observables
# ---------------------------------------------------------------------------

#: A Pauli term: (coefficient, ((qubit, 'X'|'Y'|'Z'), ...)).  Identity on all
#: unlisted qubits; the empty tuple is the identity term.
PauliTerm = Tuple[float, Tuple[Tuple[int, str], ...]]


def pauli_term(coeff: float, ops: Dict[int, str] | Iterable[Tuple[int, str]]) -> PauliTerm:
    """Normalize a {qubit: 'X'|'Y'|'Z'} mapping into a canonical PauliTerm."""
    items = ops.items() if isinstance(ops, dict) else ops
    norm = tuple(sorted((int(q), s.upper()) for q, s in items))
    seen = [q for q, _ in norm]
    if len(set(seen)) != len(seen):
        raise ValueError(f"duplicate qubit in Pauli term: {norm}")
    for q, s in norm:
        if s not in ("X", "Y", "Z"):
            raise ValueError(f"not a Pauli axis: {s!r}")
        if q < 0:
            raise ValueError(f"negative qubit index: {q}")
    return (float(coeff), norm)


def _axis(q: int, n: int) -> int:
    # Bit q of the flat index is axis n-1-q of the C-order (2,)*n tensor.
    return n - 1 - q


def apply_pauli(z: jax.Array, ops: Tuple[Tuple[int, str], ...], n: int) -> jax.Array:
    """P|psi> for a Pauli string, as flips and phases on the (2,)*n view.

    X_q reverses axis q; Y_q reverses with the [-i, +i] phase pair; Z_q is
    the diagonal [+1, -1].  Each factor is one elementwise/reverse op — XLA
    fuses the whole string into a single pass over the state.  Traced-safe
    (no data-dependent shapes); `z` is a flat (2^n,) complex array.
    """
    t = z.reshape((2,) * n)
    for q, s in ops:
        if not 0 <= q < n:
            raise ValueError(f"qubit {q} out of range for n={n}")
        ax = _axis(q, n)
        if s == "X":
            t = jnp.flip(t, axis=ax)
        elif s == "Y":
            # After the flip, new[b] = old[1-b]; Y wants new[1] = i*old[0],
            # new[0] = -i*old[1]  =>  phase [-i, +i] along the axis.
            t = jnp.flip(t, axis=ax)
            phase = jnp.array([-1j, 1j], dtype=t.dtype).reshape(
                (1,) * ax + (2,) + (1,) * (n - 1 - ax)
            )
            t = t * phase
        else:  # Z
            sign = jnp.array([1.0, -1.0], dtype=t.real.dtype).reshape(
                (1,) * ax + (2,) + (1,) * (n - 1 - ax)
            )
            t = t * sign
    return t.reshape(-1)


@functools.lru_cache(maxsize=256)
def _expectation_fn(terms: Tuple[PauliTerm, ...], n: int):
    def _exp(pl):
        z = sv.to_complex(pl)
        acc = jnp.zeros((), dtype=pl.dtype)
        for coeff, ops in terms:
            pz = apply_pauli(z, ops, n) if ops else z
            acc = acc + coeff * jnp.real(jnp.vdot(z, pz)).astype(pl.dtype)
        return acc

    return jax.jit(_exp)


def expectation(planar: jax.Array, terms: Sequence[PauliTerm]) -> jax.Array:
    """<psi| H |psi> for H = sum_k c_k P_k, from a planar (2, 2^n) state.

    Real-valued by construction (Hermitian H, real c_k).  Always runs as a
    compiled program (cached per (terms, n)) with real-only I/O: eager
    complex intermediates would be on-device complex buffers, which this
    TPU runtime rejects at the boundary — inside jit they are fine.
    Calling this from an outer traced function simply inlines it."""
    n = sv.num_qubits(planar)
    return _expectation_fn(tuple(terms), n)(planar)


def _re_inner(a, b):
    # bf16 planes accumulate in f32 (bf16 sums lose everything);
    # f32/f64 keep their own precision.
    acc = jnp.float32 if a.dtype == jnp.bfloat16 else a.dtype
    ar, ai = a[0].astype(acc), a[1].astype(acc)
    br, bi = b[0].astype(acc), b[1].astype(acc)
    return jnp.sum(ar * br + ai * bi)


# Module-level jit: a fresh jax.jit(fn) per call would defeat the trace
# cache and recompile the inner product on every invocation.
_re_inner_jit = jax.jit(_re_inner)


def expectation_on_engine(engine, state: jax.Array, terms: Sequence[PauliTerm]) -> float:
    """<psi| H |psi> through an ENGINE's gate path — works on single-chip
    and sharded states alike.

    Each Pauli string is applied as X/Y/Z gates via `engine.run`, so on a
    `ShardedStateVectorEngine` an X/Y on a globally-sharded qubit rides
    the engine's existing ppermute butterflies — no separate distributed
    observable code path to maintain.  The inner product reduces over the
    sharded planes inside one jit (XLA inserts the cross-shard psum from
    the sharding alone).  Peak memory is TWO states (|psi> and P|psi>);
    the engine's `run` donates its input, so a fresh copy is passed per
    term.  `state` is not consumed."""
    from quantumcomputer_tpu.models import circuit as cir

    gate_of = {"X": cir.X, "Y": cir.Y, "Z": cir.Z}
    inner = _re_inner_jit
    total = 0.0
    for coeff, ops in terms:
        if not ops:
            total += coeff * float(inner(state, state))
            continue
        pz = engine.run(tuple(gate_of[s](q) for q, s in ops), state + 0)
        total += coeff * float(inner(state, pz))
        del pz
    return total


def dense_hamiltonian(terms: Sequence[PauliTerm], n: int) -> np.ndarray:
    """Dense 2^n x 2^n matrix of a Pauli-sum — test/diagnostic oracle only
    (exact ground energies for small n); never used on the compute path."""
    paulis = {
        "I": np.eye(2, dtype=np.complex128),
        "X": np.array([[0, 1], [1, 0]], dtype=np.complex128),
        "Y": np.array([[0, -1j], [1j, 0]], dtype=np.complex128),
        "Z": np.array([[1, 0], [0, -1]], dtype=np.complex128),
    }
    H = np.zeros((1 << n, 1 << n), dtype=np.complex128)
    for coeff, ops in terms:
        by_q = dict(ops)
        m = np.eye(1, dtype=np.complex128)
        # Tensor order: qubit n-1 is the most-significant index bit.
        for q in range(n - 1, -1, -1):
            m = np.kron(m, paulis[by_q.get(q, "I")])
        H += coeff * m
    return H


# ---------------------------------------------------------------------------
# Model Hamiltonians
# ---------------------------------------------------------------------------


def tfim_hamiltonian(n: int, J: float = 1.0, h: float = 1.0,
                     periodic: bool = False) -> List[PauliTerm]:
    """Transverse-field Ising chain: H = -J sum Z_q Z_{q+1} - h sum X_q."""
    terms = [pauli_term(-J, {q: "Z", q + 1: "Z"}) for q in range(n - 1)]
    if periodic and n > 2:
        terms.append(pauli_term(-J, {n - 1: "Z", 0: "Z"}))
    terms.extend(pauli_term(-h, {q: "X"}) for q in range(n))
    return terms


def heisenberg_hamiltonian(n: int, J: float = 1.0) -> List[PauliTerm]:
    """Heisenberg XXX chain: H = J sum (X X + Y Y + Z Z) on neighbors."""
    terms: List[PauliTerm] = []
    for q in range(n - 1):
        for s in ("X", "Y", "Z"):
            terms.append(pauli_term(J, {q: s, q + 1: s}))
    return terms


# ---------------------------------------------------------------------------
# Differentiable state evolution primitives (traced parameters)
# ---------------------------------------------------------------------------


def _rot_y(z: jax.Array, q: int, n: int, theta: jax.Array) -> jax.Array:
    """RY(theta) on qubit q with a TRACED angle: exposes the qubit as a
    length-2 axis via reshape (pure stride bookkeeping, no data movement)
    and applies the 2x2 rotation as two fused multiply-adds."""
    lo, hi = 1 << q, z.shape[0] >> (q + 1)
    t = z.reshape(hi, 2, lo)
    c = jnp.cos(theta / 2).astype(z.real.dtype)
    s = jnp.sin(theta / 2).astype(z.real.dtype)
    a, b = t[:, 0, :], t[:, 1, :]
    out = jnp.stack([c * a - s * b, s * a + c * b], axis=1)
    return out.reshape(-1)


def _rot_x(z: jax.Array, q: int, n: int, theta: jax.Array) -> jax.Array:
    """RX(theta) on qubit q with a traced angle."""
    lo, hi = 1 << q, z.shape[0] >> (q + 1)
    t = z.reshape(hi, 2, lo)
    c = jnp.cos(theta / 2).astype(z.real.dtype)
    s = jnp.sin(theta / 2).astype(z.real.dtype)
    a, b = t[:, 0, :], t[:, 1, :]
    out = jnp.stack([c * a - 1j * s * b, -1j * s * a + c * b], axis=1)
    return out.reshape(-1)


def _rot_z(z: jax.Array, q: int, n: int, theta: jax.Array) -> jax.Array:
    """RZ(theta) on qubit q with a traced angle (diagonal phase pair)."""
    lo, hi = 1 << q, z.shape[0] >> (q + 1)
    t = z.reshape(hi, 2, lo)
    half = (theta / 2).astype(z.real.dtype)
    ph = jnp.exp(1j * jnp.stack([-half, half])).reshape(1, 2, 1)
    return (t * ph).reshape(-1)


_ROT = {"X": _rot_x, "Y": _rot_y, "Z": _rot_z}


def _cz_ring_signs(n: int, pairs: Sequence[Tuple[int, int]]) -> np.ndarray:
    """Combined diagonal of a CZ entangler layer: the product of per-pair
    (-1)^{bit_a & bit_b} signs, precomputed host-side as ONE f32 vector so
    the whole entangler is a single elementwise multiply on device."""
    idx = np.arange(1 << n, dtype=np.int64)
    sign = np.ones(1 << n, dtype=np.float32)
    for a, b in pairs:
        both = ((idx >> a) & 1) & ((idx >> b) & 1)
        sign *= np.where(both == 1, -1.0, 1.0).astype(np.float32)
    return sign


@dataclasses.dataclass(frozen=True)
class HardwareEfficientAnsatz:
    """RY + brick-CZ hardware-efficient ansatz with traced parameters.

    depth entangling layers; parameters shape (depth + 1, n).  Layer k:
    RY(theta[k, q]) on every qubit, then a CZ brick layer — even layers
    entangle pairs (0,1),(2,3),..., odd layers (1,2),(3,4),... plus the
    ring closure (n-1,0).  A final RY layer closes.  The brick alternation
    matters: a uniform all-pairs CZ ring every layer leaves an invariant
    subspace the optimizer cannot leave (measured: TFIM n=4 ground-state
    fidelity caps at 0.981 for ANY depth with the ring, reaches >0.9999 at
    depth 3 with bricks); `entangler='ring'` keeps the uniform layer for
    comparison.  Real amplitudes throughout (RY and CZ are real), which
    halves the optimization landscape for real-ground-state Hamiltonians
    (TFIM, Heisenberg); pass `rotation='XY'` alternating RX/RY layers when
    complex amplitudes are needed."""

    n: int
    depth: int
    rotation: str = "Y"  # 'Y' | 'XY'
    entangler: str = "brick"  # 'brick' | 'ring'

    @property
    def parameter_shape(self) -> Tuple[int, int]:
        """Shape of the parameter array `apply` expects: (depth + 1, n)."""
        return (self.depth + 1, self.n)

    @property
    def num_parameters(self) -> int:
        """Total parameter COUNT (the name promises a count; the shape
        lives at `parameter_shape`)."""
        return (self.depth + 1) * self.n

    def initial_parameters(self, key: jax.Array, scale: float = 0.1) -> jax.Array:
        return scale * jax.random.normal(key, self.parameter_shape, dtype=jnp.float32)

    def _pairs(self, layer: int) -> List[Tuple[int, int]]:
        n = self.n
        if n < 2:
            return []
        if self.entangler == "ring":
            pairs = [(q, q + 1) for q in range(n - 1)]
            if n > 2:
                pairs.append((n - 1, 0))
            return pairs
        if layer % 2 == 0:
            return [(q, q + 1) for q in range(0, n - 1, 2)]
        pairs = [(q, q + 1) for q in range(1, n - 1, 2)]
        if n > 2:
            pairs.append((n - 1, 0))
        return pairs

    def apply(self, thetas: jax.Array, rdtype=jnp.float32) -> jax.Array:
        """|psi(theta)> from |0...0>, returned planar (2, 2^n).  Fully
        traced in `thetas` — jit/grad-compatible, one program for every
        optimizer step."""
        n, depth = self.n, self.depth
        cdtype = sv.complex_dtype_of(rdtype)
        dim = 1 << n
        z = jnp.zeros((dim,), dtype=cdtype).at[0].set(1.0)
        signs = [
            jnp.asarray(_cz_ring_signs(n, self._pairs(parity)), dtype=rdtype)
            for parity in (0, 1)
        ]

        def rot_layer(z, k, row):
            kind = "Y" if self.rotation == "Y" or (k % 2 == 0) else "X"
            for q in range(n):
                z = _ROT[kind](z, q, n, row[q])
            return z

        for k in range(depth):
            z = rot_layer(z, k, thetas[k])
            z = z * signs[k % 2 if self.entangler == "brick" else 0]
        z = rot_layer(z, depth, thetas[depth])
        return sv.from_complex(z)


# ---------------------------------------------------------------------------
# VQE driver
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class VQEResult:
    energy: float
    parameters: np.ndarray
    energies: np.ndarray  # per-step trace
    n: int
    depth: int
    steps: int

    @property
    def state(self) -> Optional[np.ndarray]:  # populated by vqe()
        return getattr(self, "_state", None)


def vqe(
    terms: Sequence[PauliTerm],
    n: int,
    depth: int = 3,
    steps: int = 300,
    learning_rate: float = 0.05,
    key: Optional[jax.Array] = None,
    ansatz: Optional[HardwareEfficientAnsatz] = None,
    rdtype=jnp.float32,
    restarts: int = 1,
) -> VQEResult:
    """Minimize <psi(theta)| H |psi(theta)> by Adam over exact gradients.

    The whole optimizer step — ansatz, energy, backward pass, Adam update —
    is ONE jitted program; the Python loop only feeds it carry state.  On
    TPU this runs start-to-finish on device with two scalars fetched per
    step (energy for the trace).

    `restarts` runs independent Adam trajectories from different random
    inits (increasing init scale) through the SAME compiled step program
    and keeps the best — the standard defense against the barren/local
    minima a hardware-efficient ansatz is prone to; restarts share one
    compile, so extra starts cost only device steps."""
    import optax

    ans = ansatz or HardwareEfficientAnsatz(n, depth)
    key = key if key is not None else jax.random.PRNGKey(0)

    def energy(th):
        return expectation(ans.apply(th, rdtype), terms)

    opt = optax.adam(learning_rate)

    @jax.jit
    def step(th, st):
        e, g = jax.value_and_grad(energy)(th)
        updates, st = opt.update(g, st)
        return optax.apply_updates(th, updates), st, e

    energy_j = jax.jit(energy)
    # The final state must be produced BY a compiled program: an eager
    # ans.apply would build on-device complex buffers, which this TPU
    # runtime rejects at the boundary (planar real output is transferable).
    state_j = jax.jit(lambda th: ans.apply(th, rdtype))
    best: Optional[VQEResult] = None
    for r, k in enumerate(jax.random.split(key, max(1, restarts))):
        theta = ans.initial_parameters(k, scale=0.1 + 0.35 * r)
        opt_state = opt.init(theta)
        trace = np.zeros(steps, dtype=np.float64)
        for i in range(steps):
            theta, opt_state, e = step(theta, opt_state)
            trace[i] = float(e)
        final = float(energy_j(theta))
        if best is None or final < best.energy:
            best = VQEResult(
                energy=final, parameters=np.asarray(theta), energies=trace,
                n=n, depth=ans.depth, steps=steps,
            )
            best._state = sv.to_numpy_complex(state_j(theta))
    return best


# ---------------------------------------------------------------------------
# QAOA (MaxCut)
# ---------------------------------------------------------------------------


def maxcut_cost_vector(n: int, edges: Sequence[Tuple[int, int]] | Sequence[Tuple[int, int, float]]) -> np.ndarray:
    """Cut size of every basis assignment, host-precomputed: the QAOA cost
    Hamiltonian is diagonal, so it lives as one f32 vector and both the
    phase separator and the expectation are single elementwise passes."""
    idx = np.arange(1 << n, dtype=np.int64)
    cost = np.zeros(1 << n, dtype=np.float32)
    for e in edges:
        a, b = int(e[0]), int(e[1])
        w = float(e[2]) if len(e) > 2 else 1.0
        cost += w * (((idx >> a) ^ (idx >> b)) & 1).astype(np.float32)
    return cost


@dataclasses.dataclass
class QAOAResult:
    best_bitstring: int
    best_cut: float
    expected_cut: float
    optimal_cut: float
    approximation_ratio: float
    parameters: np.ndarray  # (2, p): gammas; betas
    expectations: np.ndarray  # per-step trace


def qaoa_maxcut(
    n: int,
    edges: Sequence[Tuple[int, int]] | Sequence[Tuple[int, int, float]],
    p: int = 2,
    steps: int = 200,
    learning_rate: float = 0.05,
    key: Optional[jax.Array] = None,
) -> QAOAResult:
    """QAOA for MaxCut: |+>^n, p alternating (phase-separator, RX-mixer)
    layers with traced (gamma, beta), Adam-maximized expected cut.

    TPU shape: the separator is exp(-i gamma c) with c the precomputed
    diagonal (one fused elementwise pass per layer); the mixer is n traced
    RX butterflies; expectation is sum(|psi|^2 * c) — no matrices, no
    gathers, no data-dependent control flow anywhere."""
    import optax

    cost_np = maxcut_cost_vector(n, edges)
    optimal = float(cost_np.max())
    cost = jnp.asarray(cost_np)
    dim = 1 << n

    key = key if key is not None else jax.random.PRNGKey(0)
    kg, kb = jax.random.split(key)
    params = jnp.stack([
        0.1 + 0.05 * jax.random.normal(kg, (p,), dtype=jnp.float32),
        0.4 + 0.05 * jax.random.normal(kb, (p,), dtype=jnp.float32),
    ])

    def expected_cut(prm):
        gammas, betas = prm[0], prm[1]
        z = jnp.full((dim,), 1.0 / np.sqrt(dim), dtype=jnp.complex64)
        for k in range(p):
            z = z * jnp.exp(-1j * gammas[k] * cost.astype(jnp.complex64))
            for q in range(n):
                z = _rot_x(z, q, n, 2.0 * betas[k])
        probs = jnp.real(z) ** 2 + jnp.imag(z) ** 2
        return jnp.sum(probs * cost), probs

    opt = optax.adam(learning_rate)
    opt_state = opt.init(params)

    @jax.jit
    def step(prm, st):
        (e, _), g = jax.value_and_grad(lambda q: expected_cut(q), has_aux=True)(prm)
        # maximize: ascend the expected cut
        updates, st = opt.update(jax.tree.map(jnp.negative, g), st)
        return optax.apply_updates(prm, updates), st, e

    trace = np.zeros(steps, dtype=np.float64)
    for i in range(steps):
        params, opt_state, e = step(params, opt_state)
        trace[i] = float(e)

    e_final, probs = jax.jit(lambda q: expected_cut(q))(params)
    probs_np = np.asarray(probs)
    best = int(probs_np.argmax())
    return QAOAResult(
        best_bitstring=best,
        best_cut=float(cost_np[best]),
        expected_cut=float(e_final),
        optimal_cut=optimal,
        approximation_ratio=float(e_final) / optimal if optimal > 0 else 1.0,
        parameters=np.asarray(params),
        expectations=trace,
    )
