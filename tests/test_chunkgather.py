"""Parity tests for the double-buffered Pallas chunk gather
(ops/pallas_chunkgather.py) — the slice primitive under the structured
modular permutation's legs (ops/modperm.py).

Runs in Pallas interpret mode on CPU (conftest); the offset/realignment
contract (arbitrary element starts, tail clamp, blend split) is what is
under test — hardware rates are measured by scripts/prof_chunkgather.py
and bench.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quantumcomputer_tpu.ops.pallas_chunkgather import (
    chunk_gather,
    chunk_gather_blend,
    chunk_gather_blend_rowlaw,
    chunk_gather_src2,
)


def _x(B, P, dtype, rng):
    x = rng.standard_normal((B, P)).astype(np.float32)
    return jnp.asarray(x, dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("B", [1, 2])
def test_chunk_gather_random_starts(dtype, B, rng):
    P, W, NC = 128 * 64, 512, 11
    x = _x(B, P, dtype, rng)
    starts = rng.integers(0, P - W + 1, NC).astype(np.int32)
    # Force the interesting edges: aligned start, tail-clamp start
    # (s = P - W, which lands row0 at T - WR and exercises d == 1), and
    # the last in-bounds unaligned start.
    starts[0] = 0
    starts[1] = P - W
    starts[2] = P - W - 1
    got = np.asarray(chunk_gather(x, jnp.asarray(starts), W), np.float32)
    xh = np.asarray(x, np.float32)
    for c, s in enumerate(starts):
        np.testing.assert_array_equal(got[:, c], xh[:, s : s + W], err_msg=f"chunk {c} start {s}")


def test_chunk_gather_identity_is_copy(rng):
    P, W = 128 * 32, 1024
    x = _x(2, P, jnp.float32, rng)
    starts = jnp.arange(0, P, W, dtype=jnp.int32)
    got = chunk_gather(x, starts, W).reshape(2, P)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(x))


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_chunk_gather_blend(dtype, rng):
    P, W, NC = 128 * 48, 384, 9
    x = _x(2, P, dtype, rng)
    s0 = rng.integers(0, P - W + 1, NC).astype(np.int32)
    s1 = rng.integers(0, P - W + 1, NC).astype(np.int32)
    istar = rng.integers(0, W + 1, NC).astype(np.int32)
    istar[0], istar[1] = 0, W  # all-from-s1 and all-from-s0 chunks
    s0[2], s1[2] = P - W, P - W - 127
    got = np.asarray(
        chunk_gather_blend(x, jnp.asarray(s0), jnp.asarray(s1), jnp.asarray(istar), W),
        np.float32,
    )
    xh = np.asarray(x, np.float32)
    e = np.arange(W)
    for c in range(NC):
        exp = np.where(e[None, :] < istar[c], xh[:, s0[c] : s0[c] + W], xh[:, s1[c] : s1[c] + W])
        np.testing.assert_array_equal(got[:, c], exp, err_msg=f"chunk {c}")


@pytest.mark.parametrize(
    "v,rows,Wt",
    [
        (899, 128, 128),   # rows == Qpv: the ADVICE-r4 clamp-corruption shape
        (301, 40, 128),    # vpad - v large: every chunk wraps
        (1024, 16, 256),   # v == vpad: istar == Wt wherever t0 == 0
        (130, 96, 128),    # v just past a lane: dense wrap churn
    ],
)
def test_chunk_gather_blend_rowlaw_matches_law(v, rows, Wt, rng):
    """The in-kernel offset law must equal the host-evaluated law that
    _row_compact (ops/modperm.py) previously passed via scalar prefetch:
        f0 = c*Wt; q0 = f0 // v; t0 = f0 - q0*v
        istar = clip(v - t0, 0, Wt); s0 = q0*vpad + t0 (clamped)
        s1 = (q0+1)*vpad - istar (clamped)."""
    vpad = -(-v // 128) * 128
    dim = rows * v  # the live region the caller keeps
    x = _x(1, (rows + 1) * vpad, jnp.float32, rng)  # incl. the pad row
    NC = -(-dim // Wt)
    P = x.shape[1]
    got = np.asarray(chunk_gather_blend_rowlaw(x, NC, v, vpad, Wt), np.float32)
    xh = np.asarray(x, np.float32)
    e = np.arange(Wt)
    for c in range(NC):
        f0 = c * Wt
        q0, t0 = divmod(f0, v)
        istar = min(max(v - t0, 0), Wt)
        s0 = min(max(q0 * vpad + t0, 0), P - Wt)
        s1 = min(max((q0 + 1) * vpad - istar, 0), P - Wt)
        exp = np.where(e < istar, xh[:, s0 : s0 + Wt], xh[:, s1 : s1 + Wt])
        np.testing.assert_array_equal(got[:, c], exp, err_msg=f"chunk {c} (v={v})")


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_chunk_gather_src2(dtype, rng):
    """Per-chunk source choice: flag 0 reads x, flag 1 reads the small
    alternate buffer — the collect leg's cyclic-join routing.  Covers
    boundary starts in BOTH sources (tail clamp d == 1 in each)."""
    P, P2, W, NC = 128 * 64, 128 * 6, 384, 16
    x = _x(2, P, dtype, rng)
    x2 = _x(2, P2, dtype, rng)
    starts = rng.integers(0, P - W + 1, NC).astype(np.int32)
    flags = (rng.random(NC) < 0.5).astype(np.int32)
    starts[np.where(flags == 1)] = rng.integers(
        0, P2 - W + 1, int(flags.sum())
    )
    # Boundary cases in each source.
    starts[0], flags[0] = P - W, 0       # x tail clamp
    starts[1], flags[1] = P2 - W, 1      # x2 tail clamp
    starts[2], flags[2] = P2 - W - 1, 1  # x2 last unaligned
    starts[3], flags[3] = 0, 1
    got = np.asarray(
        chunk_gather_src2(x, x2, jnp.asarray(starts), jnp.asarray(flags), W),
        np.float32,
    )
    xs = [np.asarray(x, np.float32), np.asarray(x2, np.float32)]
    for c in range(NC):
        src = xs[flags[c]]
        np.testing.assert_array_equal(
            got[:, c], src[:, starts[c] : starts[c] + W],
            err_msg=f"chunk {c} flag {flags[c]} start {starts[c]}",
        )


def test_contract_validation(rng):
    x = _x(1, 128 * 4, jnp.float32, rng)
    with pytest.raises(ValueError):
        chunk_gather(x, jnp.zeros(2, jnp.int32), 100)  # W not lane multiple
    with pytest.raises(ValueError):
        chunk_gather(x[:, :100], jnp.zeros(2, jnp.int32), 128)  # P not lane multiple
    with pytest.raises(ValueError):
        chunk_gather(x, jnp.zeros(2, jnp.int32), 128 * 4)  # needs P >= W + 128
