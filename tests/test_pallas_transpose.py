"""Pallas tiled transpose (ops/pallas_transpose.py): exactness on
divisible and padded shapes, dtype coverage, and the modperm legs run
through the kernel (interpret mode off-TPU)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from quantumcomputer_tpu.ops import modperm
from quantumcomputer_tpu.ops.pallas_transpose import (
    _transpose_divisible,
    tiled_transpose,
    tiled_transpose_padded,
)


def test_divisible_exact():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 512, 384)).astype(np.float32)
    got = np.asarray(_transpose_divisible(jnp.asarray(x), 256, 128))
    np.testing.assert_array_equal(got, np.swapaxes(x, 1, 2))


@pytest.mark.parametrize("shape", [(2, 300, 523), (1, 257, 129), (3, 8, 128)])
def test_padded_api_exact(shape):
    rng = np.random.default_rng(shape[1])
    x = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(tiled_transpose(jnp.asarray(x), block=(128, 128)))
    np.testing.assert_array_equal(got, np.swapaxes(x, 1, 2))


def test_padded_variant_region_and_zero_fill():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 300, 523)).astype(np.float32)
    out = np.asarray(tiled_transpose_padded(jnp.asarray(x), block=(128, 128)))
    assert out.shape == (2, 640, 384)
    np.testing.assert_array_equal(out[:, :523, :300], np.swapaxes(x, 1, 2))
    assert not np.any(out[:, 523:, :]) and not np.any(out[:, :, 300:])


def test_bf16_exact():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 140, 260)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    got = tiled_transpose(x, block=(128, 128))
    np.testing.assert_array_equal(
        np.asarray(got.astype(jnp.float32)),
        np.swapaxes(np.asarray(x.astype(jnp.float32)), 1, 2),
    )


def test_leading_dims_folded():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3, 150, 170)).astype(np.float32)
    got = np.asarray(tiled_transpose(jnp.asarray(x), block=(128, 128)))
    np.testing.assert_array_equal(got, np.swapaxes(x, -1, -2))


def test_modperm_through_pallas_transpose(monkeypatch):
    """The TPU path of ops/modperm routes both legs through the tiled
    transpose; force it off-TPU (interpret mode) and check full parity."""
    monkeypatch.setattr(
        modperm,
        "_tr",
        lambda x3, extra_rows=0: tiled_transpose_padded(
            x3, block=(128, 128), extra_rows=extra_rows
        ),
    )
    M = 14
    C = (1 << M) - 3
    a = 1234577 % C
    assert math.gcd(a, C) == 1
    a_inv = pow(a, -1, C)
    plan = modperm.plan_stride_permute(C, a_inv, M)
    assert plan is not None and plan.u > 1 and plan.v > 1
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 1 << M)).astype(np.float32)
    got = np.asarray(modperm.apply_stride_permute(jnp.asarray(x), plan))
    from quantumcomputer_tpu.ops.gates import modmul_inverse_permutation

    ginv = np.asarray(modmul_inverse_permutation(C, pow(a_inv, -1, C), M))
    np.testing.assert_array_equal(got, x[..., ginv])
