"""CrossScan/CrossMerge round-trip and adjoint tests (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from sigma_tpu.ops import (
    cross_merge,
    cross_merge_multimodal,
    cross_scan,
    cross_scan_multimodal,
)


def test_cross_scan_directions():
    b, h, w, c = 1, 2, 3, 1
    x = jnp.arange(h * w, dtype=jnp.float32).reshape(b, h, w, c)
    xs = cross_scan(x)
    assert xs.shape == (b, 4, h * w, c)
    np.testing.assert_array_equal(xs[0, 0, :, 0], [0, 1, 2, 3, 4, 5])
    np.testing.assert_array_equal(xs[0, 1, :, 0], [0, 3, 1, 4, 2, 5])
    np.testing.assert_array_equal(xs[0, 2, :, 0], [5, 4, 3, 2, 1, 0])
    np.testing.assert_array_equal(xs[0, 3, :, 0], [5, 2, 4, 1, 3, 0])


def test_cross_merge_inverts_scan():
    # merging the scan of x must give 4*x (each direction contributes x).
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 7, 3)), jnp.float32)
    y = cross_merge(cross_scan(x), 5, 7)
    np.testing.assert_allclose(y, 4 * x, rtol=1e-6, atol=1e-6)


def test_cross_scan_adjoint_is_merge():
    # <cross_scan(x), ys> == <x, cross_merge(ys)> — the reference encodes this
    # adjoint pair as hand-written autograd (vmamba.py:91-121).
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 6, 2)), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((1, 4, 24, 2)), jnp.float32)
    lhs = jnp.vdot(cross_scan(x), ys)
    rhs = jnp.vdot(x, cross_merge(ys, 4, 6))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)
    # and autodiff agrees
    g = jax.grad(lambda x: jnp.vdot(cross_scan(x), ys))(x)
    np.testing.assert_allclose(g, cross_merge(ys, 4, 6), rtol=1e-6)


def test_multimodal_scan_merge():
    rng = np.random.default_rng(2)
    xr = jnp.asarray(rng.standard_normal((2, 3, 4, 5)), jnp.float32)
    xe = jnp.asarray(rng.standard_normal((2, 3, 4, 5)), jnp.float32)
    xs = cross_scan_multimodal(xr, xe)
    assert xs.shape == (2, 2, 24, 5)
    np.testing.assert_array_equal(xs[:, 1], xs[:, 0, ::-1])
    yr, ye = cross_merge_multimodal(xs)
    # each half appears once forward and once reversed -> 2x
    np.testing.assert_allclose(yr.reshape(2, 3, 4, 5), 2 * xr, rtol=1e-6)
    np.testing.assert_allclose(ye.reshape(2, 3, 4, 5), 2 * xe, rtol=1e-6)


def test_multimodal_adjoint():
    rng = np.random.default_rng(3)
    xr = jnp.asarray(rng.standard_normal((1, 2, 3, 4)), jnp.float32)
    xe = jnp.asarray(rng.standard_normal((1, 2, 3, 4)), jnp.float32)
    ys = jnp.asarray(rng.standard_normal((1, 2, 12, 4)), jnp.float32)
    gr, ge = jax.grad(
        lambda xr, xe: jnp.vdot(cross_scan_multimodal(xr, xe), ys),
        argnums=(0, 1),
    )(xr, xe)
    mr, me = cross_merge_multimodal(ys)
    np.testing.assert_allclose(gr, mr.reshape(xr.shape), rtol=1e-6)
    np.testing.assert_allclose(ge, me.reshape(xe.shape), rtol=1e-6)
