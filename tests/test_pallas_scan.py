"""Pallas selective-scan kernel parity tests (interpret mode on CPU).

Mirrors the reference CUDA kernel test intent
(`test_selective_scan.py`): output + all-input gradient parity against the
sequential reference, including non-aligned seqlens (channel/lane padding
paths) and grouped B/C. Sizes are kept small — interpret mode is slow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigma_tpu.ops.pallas_scan import selective_scan_pallas
from sigma_tpu.ops.selective_scan import selective_scan_ref

RTOL, ATOL = 6e-4, 2e-3


def _mk(rng, B, D, L, N, G, itype=np.float32):
    u = rng.standard_normal((B, D, L)).astype(itype)
    dt = (0.5 * rng.random((B, D, L))).astype(itype)
    A = (-0.5 * rng.random((D, N))).astype(np.float32)
    Bm = rng.standard_normal((B, G, N, L)).astype(itype)
    Cm = rng.standard_normal((B, G, N, L)).astype(itype)
    Dk = rng.standard_normal(D).astype(np.float32)
    bias = (0.1 * rng.random(D)).astype(np.float32)
    return u, dt, A, Bm, Cm, Dk, bias


@pytest.mark.parametrize(
    "B,D,L,N,G,lc",
    [
        (2, 8, 130, 16, 1, 64),   # multi-chunk + lane pad
        (1, 12, 96, 8, 4, 128),   # grouped + channel pad (dg=3 -> 8)
        (2, 16, 257, 4, 2, 128),  # odd L
    ],
)
def test_pallas_forward_parity(B, D, L, N, G, lc):
    rng = np.random.default_rng(B * 100 + L)
    args = _mk(rng, B, D, L, N, G)
    y_ref = selective_scan_ref(*args, delta_softplus=True)
    y = selective_scan_pallas(*args, delta_softplus=True, l_chunk=lc)
    np.testing.assert_allclose(y, y_ref, rtol=RTOL, atol=ATOL)


def test_pallas_gradient_parity():
    rng = np.random.default_rng(7)
    B, D, L, N, G, lc = 2, 8, 130, 8, 1, 64
    u, dt, A, Bm, Cm, Dk, bias = _mk(rng, B, D, L, N, G)
    cot = rng.standard_normal((B, D, L)).astype(np.float32)

    def loss(fn):
        def inner(u, dt, A, Bm, Cm, Dk, bias):
            return jnp.sum(fn(u, dt, A, Bm, Cm, Dk, bias, True) * cot)

        return inner

    pall = lambda *a: selective_scan_pallas(*a[:8], l_chunk=lc)
    g_ref = jax.grad(loss(selective_scan_ref), argnums=tuple(range(7)))(
        u, dt, A, Bm, Cm, Dk, bias
    )
    g = jax.grad(loss(pall), argnums=tuple(range(7)))(
        u, dt, A, Bm, Cm, Dk, bias
    )
    for name, a, b in zip(["du", "ddt", "dA", "dB", "dC", "dD", "dbias"], g,
                          g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=RTOL,
            atol=ATOL * max(1.0, float(np.abs(np.asarray(b)).max()) * 0.01),
            err_msg=f"grad mismatch: {name}",
        )


def test_backend_dispatch():
    from sigma_tpu.ops import selective_scan

    rng = np.random.default_rng(3)
    args = _mk(rng, 1, 8, 64, 4, 1)
    y_auto = selective_scan(*args, delta_softplus=True)  # xla on CPU
    y_pl = selective_scan(*args, delta_softplus=True, backend="pallas")
    np.testing.assert_allclose(y_auto, y_pl, rtol=1e-4, atol=1e-4)


def test_channel_last_seq_kernel_parity():
    """selective_scan_cl: sequential Pallas kernel (interpret) vs XLA
    fallback, grouped + N-padding (d_state 4) + odd L paths."""
    from sigma_tpu.ops import selective_scan_cl

    rng = np.random.default_rng(11)
    batch, G, dg, L, N = 2, 2, 16, 70, 4
    bg = batch * G
    u = rng.standard_normal((bg, L, dg)).astype(np.float32)
    dt = (0.5 * rng.random((bg, L, dg))).astype(np.float32)
    A = (-0.5 * rng.random((G, N, dg))).astype(np.float32)
    Bm = rng.standard_normal((bg, L, N)).astype(np.float32)
    Cm = rng.standard_normal((bg, L, N)).astype(np.float32)
    Dk = rng.standard_normal((G, dg)).astype(np.float32)
    bias = (0.1 * rng.random((G, dg))).astype(np.float32)

    y_xla = selective_scan_cl(
        u, dt, A, Bm, Cm, Dk, bias, True, backend="xla"
    )
    y_pl = selective_scan_cl(
        u, dt, A, Bm, Cm, Dk, bias, True, backend="pallas"
    )
    np.testing.assert_allclose(y_pl, y_xla, rtol=RTOL, atol=ATOL)

    # gradients through both backends agree
    cot = rng.standard_normal((bg, L, dg)).astype(np.float32)

    def loss(backend):
        def inner(u, dt, A, Bm, Cm, Dk, bias):
            return jnp.sum(
                selective_scan_cl(u, dt, A, Bm, Cm, Dk, bias, True,
                                  backend=backend) * cot
            )

        return inner

    g_x = jax.grad(loss("xla"), argnums=tuple(range(7)))(
        u, dt, A, Bm, Cm, Dk, bias
    )
    g_p = jax.grad(loss("pallas"), argnums=tuple(range(7)))(
        u, dt, A, Bm, Cm, Dk, bias
    )
    for name, a, b in zip(["du", "ddt", "dA", "dB", "dC", "dD", "dbias"],
                          g_p, g_x):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=RTOL, atol=ATOL,
            err_msg=f"grad mismatch: {name}",
        )
