"""On-TPU parity sweep for the chunk-gather kernels and the structured
stride permutation (VERDICT r4 #6).

Interpret-mode tests cannot catch Mosaic lowering bugs — the module
docstring of ops/pallas_chunkgather.py records one (dynamic SUBLANE
rolls mis-lower on a v5e) — so the kernel's edge cases are swept here on
real hardware, with all comparisons reduced ON DEVICE to one scalar
(max-abs-diff) per case; nothing state-sized crosses the tunnel.

Covers:
  1. chunk_gather: every lane offset 0..127, tail-clamp d==1 starts
     (start % 128 == 0 at P - W), random unaligned starts.
  2. chunk_gather_blend: istar in {0, 1, W-1, W, random}, wrap slices at
     the tail, both slices at the same offset.
  3. _row_compact at the ADVICE r4 clamp-corruption shape (v=899,
     rows=128 == Qpv, last-row chunk t0 > vpad - Wt) under real Mosaic.
  4. apply_stride_permute vs the element-gather oracle at M=22 over the
     semiclassical multiplier sequence (real plans: deal, collect,
     negation, row-split legs) and at M=28 for the exact BENCH_r04 crash
     plan class (Qpr > _ROW_W_CAP, Qpr % _ROW_W_CAP != 0).

Exit 0 and a final "PARITY SWEEP OK" line on success; first failure
raises with the offending case.
"""

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from quantumcomputer_tpu.ops.modperm import (
    _ROW_W_CAP,
    _row_compact,
    apply_stride_permute,
    collect_chunking,
    plan_stride_permute,
)
from quantumcomputer_tpu.ops.pallas_chunkgather import chunk_gather, chunk_gather_blend


def maxdiff(a, b) -> float:
    return float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))


def check(name: str, d: float, tol: float = 0.0) -> None:
    status = "ok" if d <= tol else "FAIL"
    print(f"  {name}: max|diff|={d:g} {status}", flush=True)
    if d > tol:
        raise SystemExit(f"PARITY FAILURE: {name} max|diff|={d}")


def ref_gather(x, starts, W):
    def one(s):
        return lax.dynamic_slice(x, (jnp.zeros((), jnp.int32), s), (x.shape[0], W))

    return jax.vmap(one, out_axes=1)(starts.astype(jnp.int32))


def ref_blend(x, s0, s1, istar, W):
    g0 = ref_gather(x, s0, W)
    g1 = ref_gather(x, s1, W)
    lane = lax.iota(jnp.int32, W)
    return jnp.where(lane[None, None, :] < istar[:, None], g0, g1)


def sweep_chunk_gather(small: bool):
    print("[1] chunk_gather edge cases", flush=True)
    P, W = ((1 << 16), (1 << 9)) if small else ((1 << 22), (1 << 13))
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, P), jnp.float32)
    # (a) every lane offset 0..127 (the in-register lane roll), each on a
    # different random row base.
    base = jax.random.randint(
        jax.random.PRNGKey(7), (128,), 0, (P - W - 128) // 128
    ) * 128
    starts = base.astype(jnp.int32) + jnp.arange(128, dtype=jnp.int32)
    d = maxdiff(chunk_gather(x, starts, W), ref_gather(x, starts, W))
    check("lane offsets 0..127", d)
    # (b) tail clamp d==1: start == P - W with start % 128 == 0, plus the
    # nearest unaligned-legal starts below it.
    tail = jnp.asarray(
        [P - W, P - W - 128, P - W - 1, P - W - 127, 0, 1, 127, 128], jnp.int32
    )
    d = maxdiff(chunk_gather(x, tail, W), ref_gather(x, tail, W))
    check("tail clamp / boundary starts", d)
    # (c) random unaligned starts, W spanning the production range.
    for Wi in (128, 512) if small else (128, 2048, 32768):
        ks = jax.random.randint(jax.random.PRNGKey(Wi), (64,), 0, P - Wi)
        d = maxdiff(chunk_gather(x, ks, Wi), ref_gather(x, ks, Wi))
        check(f"random starts W={Wi}", d)


def sweep_chunk_gather_blend(small: bool):
    print("[2] chunk_gather_blend edge cases", flush=True)
    P, W = ((1 << 15), 256) if small else ((1 << 21), 4096)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, P), jnp.float32)
    key0, key1 = jax.random.split(jax.random.PRNGKey(2))
    s0 = jax.random.randint(key0, (40,), 0, P - W)
    s1 = jax.random.randint(key1, (40,), 0, P - W)
    for name, ist in (
        ("istar=0 (all wrap)", jnp.zeros((40,), jnp.int32)),
        ("istar=W (all straight)", jnp.full((40,), W, jnp.int32)),
        ("istar=1", jnp.ones((40,), jnp.int32)),
        ("istar=W-1", jnp.full((40,), W - 1, jnp.int32)),
        ("istar random", jax.random.randint(jax.random.PRNGKey(3), (40,), 0, W + 1)),
    ):
        d = maxdiff(
            chunk_gather_blend(x, s0, s1, ist, W), ref_blend(x, s0, s1, ist, W)
        )
        check(name, d)
    # Same-offset slices and tail wraps.
    tail = jnp.asarray([P - W, P - W - 128, 0], jnp.int32)
    ist = jnp.asarray([17, W // 2, W - 17], jnp.int32)
    d = maxdiff(
        chunk_gather_blend(x, tail, tail, ist, W), ref_blend(x, tail, tail, ist, W)
    )
    check("s0==s1 at tail", d)


def sweep_row_compact():
    print("[3] _row_compact clamp shape (ADVICE r4 high) under Mosaic", flush=True)
    v, rows, dim = 899, 128, 1 << 17
    vpad = 1024
    # One slack row (contents arbitrary — production gets it undefined
    # from _tr extra_rows), read only by discarded lanes.
    w2 = np.full((1, rows + 1, vpad), -7.0, np.float32)
    q = np.arange(rows)[:, None]
    t = np.arange(v)[None, :]
    w2[0, :rows, :v] = (q * v + t).astype(np.float32)
    flat = _row_compact(jnp.asarray(w2), v, dim)
    live = rows * v
    want = jnp.arange(live, dtype=jnp.float32)
    check("v=899 rows==Qpv last-row chunk", maxdiff(flat[0, :live], want))


def _parity_permute(C: int, a_inv: int, M: int, tag: str, probes: bool = False,
                    plan=None):
    if plan is None:
        plan = plan_stride_permute(C, a_inv, M)
    if plan is None:
        print(f"  {tag}: no plan (fallback path) — skipped", flush=True)
        return False
    Wc, Qpr, K = collect_chunking(C, plan.v, True) if plan.v > 1 else (0, 0, 1)
    x = jax.random.normal(jax.random.PRNGKey(C % 97), (2, 1 << M), jnp.float32)

    if not probes:
        @jax.jit
        def diff(xx):
            got = apply_stride_permute(xx, plan)
            from quantumcomputer_tpu.ops.gates import modmul_permute_onchip

            idx = modmul_permute_onchip(a_inv, lax.iota(jnp.int32, 1 << M), C, M)
            want = xx[:, idx]
            return jnp.max(jnp.abs(got - want))

        try:
            d = float(diff(x))
        except jax.errors.JaxRuntimeError as e:
            # Remote-compile helper OOM on the 2^M oracle gather — fall
            # back to probe mode rather than losing the case.
            print(f"  {tag}: full-parity compile failed ({type(e).__name__}),"
                  " retrying in probe mode", flush=True)
            return _parity_permute(C, a_inv, M, tag, probes=True)
        check(f"{tag} (u={plan.u} v={plan.v} K={K})", d)
        return True

    # PROBE mode (large M): jitting the 2^M element-gather oracle next to
    # the permute in one program OOM-kills the remote compile helper at
    # M=28 (observed SIGKILL), so the production program runs alone and a
    # second, tiny program checks out[:, j] == x[:, (a_inv*j) mod C] at
    # seam-targeted positions: every leg boundary class (multiples of the
    # plan factors u, v, the chunk widths Wt/Wc and the 128-lane grain,
    # each +/- 1..2), the head/tail of the live region, the identity tail
    # j >= C, and a dense uniform sample.  Source indices are computed on
    # host with exact Python ints.  The permute runs ONE PLANE PER
    # DISPATCH with the input donated — exactly the production call shape
    # (semiclassical.py applies w[0:1] then the imaginary plane): a B=2
    # program doubles the deal leg's ~3-plane row-view transients and
    # exceeds HBM (measured 19.78G of 15.75G at M=28).
    x_np = np.asarray(x)
    del x
    plane = jax.jit(lambda xx: apply_stride_permute(xx, plan),
                    donate_argnums=0)
    parts = [np.asarray(plane(jnp.asarray(x_np[i : i + 1]))) for i in (0, 1)]
    got = jnp.asarray(np.concatenate(parts, axis=0))
    dim = 1 << M
    rng = np.random.default_rng(C % 251)
    pos = [np.arange(4096), np.arange(C - 4096, C + 4096), np.arange(dim - 256, dim)]
    for base in (plan.u, plan.v, Wc or dim, 32768, 128):
        if base and 0 < base < C:
            mult = rng.integers(0, C // base, 2048) * base
            pos.append((mult[:, None] + np.arange(-2, 3)[None, :]).ravel())
    pos.append(rng.integers(0, dim, 1 << 17))
    p = np.unique(np.concatenate(pos).clip(0, dim - 1)).astype(np.int64)
    src = np.where(p < C, (a_inv * p) % C, p)
    want = x_np[:, src]  # exact host gather
    p = p.astype(np.int32)

    @jax.jit
    def probe_diff(g, pj, wj):
        return jnp.max(jnp.abs(g[:, pj] - wj))

    d = float(probe_diff(got, jnp.asarray(p), jnp.asarray(want)))
    check(f"{tag} (u={plan.u} v={plan.v} K={K}, W={plan.W}, {p.size} probes)", d)
    return True


def sweep_stride_permute():
    print("[4] apply_stride_permute vs element gather, on-chip", flush=True)
    # Production multiplier sequence at M=22 (fast full-state parity).
    M = 22
    C = (1 << M) - 3
    a = 7
    done = 0
    for s in range(10):
        a_inv = pow(pow(a, 1 << s, C), -1, C)
        if a_inv <= 1:
            continue
        done += _parity_permute(C, a_inv, M, f"M=22 step {s}")
        if done >= 4:
            break
    assert done >= 3, "too few M=22 plans exercised"

    # The BENCH_r04 crash class: plans whose collect rows split with
    # Qpr % _ROW_W_CAP != 0.  Full-state parity at M=26 (the largest M
    # whose oracle-gather program compiles comfortably), then the exact
    # M=28 production class in probe mode (the full 2^28 program
    # OOM-kills the remote compile helper — measured SIGKILL).
    def row_split_cases(M: int, want: int, probes: bool):
        # Plans come from the PRODUCTION planner (_structured_plans): it
        # caps the deal-leg chunk width W so the leg transients fit the
        # step's HBM envelope — the raw plan maximum W compiled to a
        # 17.78G program at M=28 (measured OOM at compile).
        from quantumcomputer_tpu.algorithms.semiclassical import (
            _structured_plans,
        )

        hit = 0
        for Coff in (3, 5, 15, 17, 27, 35):
            C = (1 << M) - Coff
            if math.gcd(a, C) != 1:
                continue
            for s in range(2, 60):
                a_inv = pow(pow(a, 1 << s, C), -1, C)
                if a_inv <= 1:
                    continue
                plan = _structured_plans(C, [a_inv], M, jnp.float32)[0]
                if plan is None or plan.v <= 1:
                    continue
                Wc, Qpr, K = collect_chunking(C, plan.v, True)
                Qpv128 = -(-((C - 1) // plan.v + 1) // 128) * 128
                if K > 1 and Qpv128 % _ROW_W_CAP != 0:
                    _parity_permute(C, a_inv, M,
                                    f"M={M} C=2^{M}-{Coff} row-split step {s}",
                                    probes=probes, plan=plan)
                    hit += 1
                    break
            if hit >= want:
                return hit
        return hit

    n26 = row_split_cases(26, 1, probes=False)
    assert n26, "no M=26 row-split (non-divisible Qpr) plan found"
    hit = row_split_cases(28, 2, probes=True)
    assert hit >= 1, "no M=28 row-split (non-divisible Qpr) plan found"


if __name__ == "__main__":
    if os.environ.get("QC_TPU_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")  # before any backend init
    from quantumcomputer_tpu.utils import compile_cache

    compile_cache.enable()  # remote-helper compiles are minutes; cache them
    t0 = time.perf_counter()
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}", flush=True)
    small = jax.default_backend() != "tpu"  # interpret mode is slow
    sweep_chunk_gather(small)
    sweep_chunk_gather_blend(small)
    sweep_row_compact()
    if "--quick" not in sys.argv:  # --quick: kernel-level sweeps only
        sweep_stride_permute()
    print(f"PARITY SWEEP OK ({time.perf_counter() - t0:.1f}s)", flush=True)
