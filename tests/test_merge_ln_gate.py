"""Parity of the fused SS2D epilogue kernel (merge + LN + SiLU gate)
against the unfused XLA reference, values and all gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sigma_tpu.ops.pallas_merge_ln_gate import (
    merge_ln_gate,
    merge_ln_gate_ref,
)


@pytest.mark.parametrize("h,w,dg,dtype", [
    (24, 32, 64, jnp.float32),
    (24, 32, 64, jnp.bfloat16),
    (15, 20, 96, jnp.float32),   # odd tiles (PST900-style shapes)
    (8, 128, 192, jnp.bfloat16),  # stage-1-like tile geometry
])
def test_fused_epilogue_matches_reference(h, w, dg, dtype):
    b = 2
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    y_hw = jax.random.normal(ks[0], (b, h, w, dg), dtype)
    y_wh = jax.random.normal(ks[1], (b, w, h, dg), dtype)
    z = jax.random.normal(ks[2], (b, h, w, dg), dtype)
    gamma = 1.0 + 0.1 * jax.random.normal(ks[3], (dg,), jnp.float32)
    beta = 0.1 * jax.random.normal(ks[4], (dg,), jnp.float32)
    eps = 1e-5

    def fused(*args):
        return merge_ln_gate(*args, eps, True)  # interpret off-TPU

    out = fused(y_hw, y_wh, z, gamma, beta)
    want = merge_ln_gate_ref(y_hw, y_wh, z, gamma, beta, eps)
    assert out.dtype == jnp.float32
    tol = 1e-5 if dtype == jnp.float32 else 5e-2
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=tol, atol=tol)

    def loss_fused(a, bb, c, g, be):
        o = fused(a, bb, c, g, be)
        return jnp.sum(o * o * 0.01)

    def loss_ref(a, bb, c, g, be):
        o = merge_ln_gate_ref(a, bb, c, g, be, eps)
        return jnp.sum(o * o * 0.01)

    grads = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        y_hw, y_wh, z, gamma, beta
    )
    wants = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(
        y_hw, y_wh, z, gamma, beta
    )
    gtol = 1e-4 if dtype == jnp.float32 else 7e-2
    for name, a, b_ in zip(("dy_hw", "dy_wh", "dz", "dgamma", "dbeta"),
                           grads, wants):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=gtol, atol=gtol, err_msg=name,
        )
