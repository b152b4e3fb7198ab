"""Selective-scan parity tests.

Mirrors the reference kernel test grid
(`/root/reference/models/encoders/selective_scan/test_selective_scan.py`):
seqlens including non-power-of-two and multi-chunk sizes, with/without
delta_bias, delta_softplus, D-skip, and 1 or 2 B/C groups. The chunked
production scan is compared against the sequential reference scan for the
output and all seven input gradients, at the reference's fp32 tolerances
(rtol 6e-4 / atol 2e-3).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigma_tpu.ops import selective_scan, selective_scan_ref

RTOL, ATOL = 6e-4, 2e-3


def _make_inputs(rng, batch, dim, L, N, G, with_D, with_bias, itype=np.float32):
    # conditioning matches the reference kernel test
    # (test_selective_scan.py:157,179): delta >= 0, A in (-0.5, 0].
    u = rng.standard_normal((batch, dim, L)).astype(itype)
    delta = (0.5 * rng.random((batch, dim, L))).astype(itype)
    A = (-0.5 * rng.random((dim, N))).astype(np.float32)
    B = rng.standard_normal((batch, G, N, L)).astype(itype)
    C = rng.standard_normal((batch, G, N, L)).astype(itype)
    D = rng.standard_normal(dim).astype(np.float32) if with_D else None
    bias = (
        0.1 * rng.standard_normal(dim).astype(np.float32) if with_bias else None
    )
    return u, delta, A, B, C, D, bias


@pytest.mark.parametrize("seqlen", [64, 256, 372, 784, 1134])
@pytest.mark.parametrize(
    "with_D,with_bias,softplus",
    [
        (True, True, True),
        (False, False, False),
        (True, False, True),
        (False, True, False),
    ],
)
def test_forward_parity(seqlen, with_D, with_bias, softplus):
    rng = np.random.default_rng(seqlen + with_D * 2 + with_bias * 4 + softplus)
    batch, dim, N, G = 2, 8, 8, 1
    args = _make_inputs(rng, batch, dim, seqlen, N, G, with_D, with_bias)
    y_ref = selective_scan_ref(*args, delta_softplus=softplus)
    y = selective_scan(*args, delta_softplus=softplus, chunk=128)
    np.testing.assert_allclose(y, y_ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("G", [1, 2])
def test_forward_parity_groups(G):
    rng = np.random.default_rng(17 + G)
    args = _make_inputs(rng, 2, 12, 300, 4, G, True, True)
    y_ref = selective_scan_ref(*args, delta_softplus=True)
    y = selective_scan(*args, delta_softplus=True, chunk=64)
    np.testing.assert_allclose(y, y_ref, rtol=RTOL, atol=ATOL)


def test_chunk_invariance():
    rng = np.random.default_rng(0)
    args = _make_inputs(rng, 1, 6, 257, 8, 1, True, True)
    ys = [
        selective_scan(*args, delta_softplus=True, chunk=c)
        for c in (32, 64, 128, 512)
    ]
    for y in ys[1:]:
        np.testing.assert_allclose(y, ys[0], rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seqlen", [96, 372])
@pytest.mark.parametrize("softplus", [True, False])
def test_gradient_parity(seqlen, softplus):
    rng = np.random.default_rng(seqlen)
    batch, dim, N, G = 2, 6, 8, 1
    u, delta, A, B, C, D, bias = _make_inputs(
        rng, batch, dim, seqlen, N, G, True, True
    )
    cot = rng.standard_normal((batch, dim, seqlen)).astype(np.float32)

    def loss(fn):
        def inner(u, delta, A, B, C, D, bias):
            y = fn(u, delta, A, B, C, D, bias, softplus)
            return jnp.sum(y * cot)

        return inner

    def prod(u, delta, A, B, C, D, bias, sp):
        return selective_scan(u, delta, A, B, C, D, bias, sp, chunk=128)

    g_ref = jax.grad(loss(selective_scan_ref), argnums=tuple(range(7)))(
        u, delta, A, B, C, D, bias
    )
    g = jax.grad(loss(prod), argnums=tuple(range(7)))(u, delta, A, B, C, D, bias)
    names = ["du", "ddelta", "dA", "dB", "dC", "dD", "dbias"]
    for name, a, b in zip(names, g, g_ref):
        np.testing.assert_allclose(
            a, b, rtol=RTOL, atol=ATOL, err_msg=f"grad mismatch: {name}"
        )


def test_bf16_inputs():
    rng = np.random.default_rng(3)
    u, delta, A, B, C, D, bias = _make_inputs(rng, 2, 8, 256, 8, 1, True, True)
    y32 = selective_scan(u, delta, A, B, C, D, bias, True)
    y16 = selective_scan(
        jnp.asarray(u, jnp.bfloat16),
        jnp.asarray(delta, jnp.bfloat16),
        A,
        jnp.asarray(B, jnp.bfloat16),
        jnp.asarray(C, jnp.bfloat16),
        D,
        bias,
        True,
    )
    assert y16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y16, np.float32), y32, rtol=3e-2, atol=5e-2
    )


def test_jit_and_vmap_compose():
    rng = np.random.default_rng(5)
    args = _make_inputs(rng, 2, 4, 128, 4, 1, True, True)
    y0 = selective_scan(*args, delta_softplus=True)
    y1 = jax.jit(lambda *a: selective_scan(*a, delta_softplus=True))(*args)
    np.testing.assert_allclose(y0, y1, rtol=1e-5, atol=1e-5)
