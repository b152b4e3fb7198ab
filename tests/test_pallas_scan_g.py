"""Parity tests for the fused-group Pallas scan (pallas_scan_g).

Checks fwd + all 7 operand gradients against the XLA associative-scan
reference at grouped shapes, plus the batch-folding path. Tolerances follow
the reference kernel test envelope
(/root/reference/models/encoders/selective_scan/test_selective_scan.py:148).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigma_tpu.ops.pallas_scan_g import selective_scan_g
from sigma_tpu.ops.selective_scan import selective_scan_cl


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32)


def _make(batch, G, L, dg, N, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    u = _rand(ks[0], batch, G, L, dg)
    d = _rand(ks[1], batch, G, L, dg) * 0.1
    A = -jnp.exp(_rand(ks[2], G, N, dg))
    Bm = _rand(ks[3], batch, G, L, N)
    Cm = _rand(ks[4], batch, G, L, N)
    D = _rand(ks[5], G, dg)
    bias = _rand(ks[6], G, dg) * 0.1
    return u, d, A, Bm, Cm, D, bias


def _ref(u, d, A, Bm, Cm, D, bias):
    batch, G, L, dg = u.shape
    N = A.shape[1]
    y = selective_scan_cl(
        u.reshape(batch * G, L, dg), d.reshape(batch * G, L, dg), A,
        Bm.reshape(batch * G, L, N), Cm.reshape(batch * G, L, N),
        D=D, delta_bias=bias, delta_softplus=True, backend="xla",
    )
    return y.reshape(batch, G, L, dg)


@pytest.mark.parametrize(
    "batch,G,L,dg,N,fold",
    [
        (2, 4, 64, 24, 4, True),
        (2, 4, 64, 24, 4, False),
        (1, 2, 96, 16, 16, True),
        (3, 1, 48, 32, 8, True),
    ],
)
def test_fwd_parity(batch, G, L, dg, N, fold):
    u, d, A, Bm, Cm, D, bias = _make(batch, G, L, dg, N)
    y = selective_scan_g(
        u, d, A, Bm, Cm, D=D, delta_bias=bias, delta_softplus=True,
        block_t=32, fold_batch=fold,
    )
    y_ref = _ref(u, d, A, Bm, Cm, D, bias)
    np.testing.assert_allclose(y, y_ref, rtol=6e-4, atol=2e-3)


def test_grad_parity():
    batch, G, L, dg, N = 2, 4, 64, 24, 4
    args = _make(batch, G, L, dg, N)

    def loss_g(args):
        u, d, A, Bm, Cm, D, bias = args
        y = selective_scan_g(
            u, d, A, Bm, Cm, D=D, delta_bias=bias, delta_softplus=True,
            block_t=32,
        )
        return (y ** 2).sum()

    def loss_r(args):
        return (_ref(*args) ** 2).sum()

    gg = jax.grad(loss_g)(args)
    gr = jax.grad(loss_r)(args)
    for name, a, b in zip(["du", "dd", "dA", "dB", "dC", "dD", "dbias"],
                          gg, gr):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=2e-3, atol=2e-3, err_msg=name
        )


def test_matches_seq_rows_exactly():
    """The grouped kernel equals the per-row kernel to float noise on CPU
    interpret (same chain order; the hoisted exp/bu blocks change only
    FMA association, ~1e-7 relative)."""
    batch, G, L, dg, N = 2, 2, 32, 16, 8
    u, d, A, Bm, Cm, D, bias = _make(batch, G, L, dg, N, seed=3)
    y_g = selective_scan_g(
        u, d, A, Bm, Cm, D=D, delta_bias=bias, delta_softplus=True,
        block_t=32, fold_batch=False,
    )
    from sigma_tpu.ops.pallas_scan_seq import selective_scan_seq_cl

    y_s = selective_scan_seq_cl(
        u.reshape(batch * G, L, dg), d.reshape(batch * G, L, dg), A,
        Bm.reshape(batch * G, L, N), Cm.reshape(batch * G, L, N),
        D=D, delta_bias=bias, delta_softplus=True, block_t=32,
    ).reshape(batch, G, L, dg)
    np.testing.assert_allclose(
        np.asarray(y_g), np.asarray(y_s), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("pad", [False, True])
def test_reverse_scan(pad):
    """reverse=True == flip(scan(flip(inputs))) with no flip copies; also
    exercises L-padding, where the pad region is scanned FIRST."""
    batch, G, L, dg, N = 2, 2, 96 if not pad else 88, 24, 4
    u, d, A, Bm, Cm, D, bias = _make(batch, G, L, dg, N, seed=5)
    y = selective_scan_g(
        u, d, A, Bm, Cm, D=D, delta_bias=bias, delta_softplus=True,
        block_t=32, reverse=True,
    )
    y_ref = _ref(
        u[:, :, ::-1], d[:, :, ::-1], A, Bm[:, :, ::-1], Cm[:, :, ::-1],
        D, bias,
    )[:, :, ::-1]
    np.testing.assert_allclose(y, y_ref, rtol=6e-4, atol=2e-3)


def test_reverse_grad_parity():
    batch, G, L, dg, N = 2, 2, 88, 24, 4
    args = _make(batch, G, L, dg, N, seed=6)

    def loss_g(args):
        u, d, A, Bm, Cm, D, bias = args
        y = selective_scan_g(
            u, d, A, Bm, Cm, D=D, delta_bias=bias, delta_softplus=True,
            block_t=32, reverse=True,
        )
        return (y ** 2).sum()

    def loss_r(args):
        u, d, A, Bm, Cm, D, bias = args
        y = _ref(
            u[:, :, ::-1], d[:, :, ::-1], A, Bm[:, :, ::-1], Cm[:, :, ::-1],
            D, bias,
        )
        return (y ** 2).sum()

    gg = jax.grad(loss_g)(args)
    gr = jax.grad(loss_r)(args)
    for name, a, b in zip(["du", "dd", "dA", "dB", "dC", "dD", "dbias"],
                          gg, gr):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=2e-3, atol=2e-3, err_msg=name
        )


def test_bf16_io():
    """bf16 streams ride through the kernel with fp32 compute; tolerance
    follows the reference kernel's bf16-input envelope
    (test_selective_scan.py:148-151)."""
    batch, G, L, dg, N = 2, 2, 64, 24, 4
    u, d, A, Bm, Cm, D, bias = _make(batch, G, L, dg, N, seed=7)
    y = selective_scan_g(
        u.astype(jnp.bfloat16), d.astype(jnp.bfloat16), A,
        Bm.astype(jnp.bfloat16), Cm.astype(jnp.bfloat16),
        D=D, delta_bias=bias, delta_softplus=True, block_t=32,
    )
    assert y.dtype == jnp.bfloat16
    y_ref = _ref(u, d, A, Bm, Cm, D, bias)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref), rtol=3e-2, atol=5e-2
    )

    def loss(u_):
        return (selective_scan_g(
            u_, d.astype(jnp.bfloat16), A, Bm.astype(jnp.bfloat16),
            Cm.astype(jnp.bfloat16), D=D, delta_bias=bias,
            delta_softplus=True, block_t=32,
        ).astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss)(u.astype(jnp.bfloat16))
    assert g.dtype == jnp.bfloat16
    g_ref = jax.grad(lambda u_: (_ref(u_, d, A, Bm, Cm, D, bias) ** 2).sum())(u)
    scale = max(float(jnp.abs(g_ref).max()), 1.0)
    np.testing.assert_allclose(
        np.asarray(g, np.float32) / scale, np.asarray(g_ref) / scale,
        rtol=5e-2, atol=5e-2,
    )


def _make_proj(batch, G, L, dg, N, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 7)
    u = _rand(ks[0], batch, G, L, dg)
    wdt = _rand(ks[1], G, dg, dg) * (1.0 / dg ** 0.5) * 0.3
    wb = _rand(ks[2], G, dg, N) * (1.0 / dg ** 0.5)
    wc = _rand(ks[3], G, dg, N) * (1.0 / dg ** 0.5)
    A = -jnp.exp(_rand(ks[4], G, N, dg))
    D = _rand(ks[5], G, dg)
    bias = _rand(ks[6], G, dg) * 0.1
    return u, wdt, wb, wc, A, D, bias


def _proj_ref(u, wdt, wb, wc, A, D, bias):
    dts = jnp.einsum("bgld,gde->bgle", u, wdt)
    bs = jnp.einsum("bgld,gdn->bgln", u, wb)
    cs = jnp.einsum("bgld,gdn->bgln", u, wc)
    return _ref(u, dts, A, bs, cs, D, bias)


@pytest.mark.parametrize("reverse", [False, True])
def test_fused_projection_scan(reverse):
    """dt/B/C computed on the MXU inside the kernel must match the
    decomposed XLA-projection + scan pipeline."""
    from sigma_tpu.ops.pallas_scan_g import selective_scan_g_proj

    batch, G, L, dg, N = 2, 2, 88, 24, 4
    u, wdt, wb, wc, A, D, bias = _make_proj(batch, G, L, dg, N, seed=9)
    y = selective_scan_g_proj(
        u, wdt, wb, wc, A, D=D, delta_bias=bias, delta_softplus=True,
        block_t=32, reverse=reverse,
    )
    if reverse:
        y_ref = _proj_ref(
            u[:, :, ::-1], wdt, wb, wc, A, D, bias)[:, :, ::-1]
    else:
        y_ref = _proj_ref(u, wdt, wb, wc, A, D, bias)
    np.testing.assert_allclose(y, y_ref, rtol=6e-4, atol=2e-3)


def test_fused_projection_grads():
    from sigma_tpu.ops.pallas_scan_g import selective_scan_g_proj

    batch, G, L, dg, N = 2, 2, 64, 24, 4
    args = _make_proj(batch, G, L, dg, N, seed=10)

    def loss_g(args):
        u, wdt, wb, wc, A, D, bias = args
        y = selective_scan_g_proj(
            u, wdt, wb, wc, A, D=D, delta_bias=bias, delta_softplus=True,
            block_t=32,
        )
        return (y ** 2).sum()

    def loss_r(args):
        return (_proj_ref(*args) ** 2).sum()

    gg = jax.grad(loss_g)(args)
    gr = jax.grad(loss_r)(args)
    for name, a, b in zip(
            ["du", "dwdt", "dwb", "dwc", "dA", "dD", "dbias"], gg, gr):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=2e-3, atol=2e-3, err_msg=name
        )


def test_fused_projection_bf16():
    from sigma_tpu.ops.pallas_scan_g import selective_scan_g_proj

    batch, G, L, dg, N = 2, 2, 64, 24, 4
    u, wdt, wb, wc, A, D, bias = _make_proj(batch, G, L, dg, N, seed=11)
    y = selective_scan_g_proj(
        u.astype(jnp.bfloat16), wdt, wb, wc, A, D=D, delta_bias=bias,
        delta_softplus=True, block_t=32,
    )
    assert y.dtype == jnp.bfloat16
    y_ref = _proj_ref(u, wdt, wb, wc, A, D, bias)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(y_ref), rtol=3e-2, atol=7e-2
    )


def test_dg_tiled_path():
    """Wide-dg shapes split dg across the middle grid dim (each tile is an
    independent scan); fwd + all 7 grads must match the reference. The
    shape is chosen so _plan_g_layout picks dgt < dg (ndg > 1)."""
    from sigma_tpu.ops.pallas_scan_g import _plan_g_layout

    batch, G, L, dg, N = 1, 4, 256, 512, 32
    assert _plan_g_layout(batch, G, N, dg, L, 512, True)[1] < dg
    args = _make(batch, G, L, dg, N, seed=12)

    def loss_g(args):
        u, d, A, Bm, Cm, D, bias = args
        y = selective_scan_g(
            u, d, A, Bm, Cm, D=D, delta_bias=bias, delta_softplus=True,
        )
        return (y ** 2).sum()

    def loss_r(args):
        return (_ref(*args) ** 2).sum()

    gg = jax.grad(loss_g)(args)
    gr = jax.grad(loss_r)(args)
    for name, a, b in zip(["du", "dd", "dA", "dB", "dC", "dD", "dbias"],
                          gg, gr):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=2e-3, atol=2e-3, err_msg=name
        )


def test_dg_tiled_reverse():
    batch, G, L, dg, N = 1, 4, 192, 512, 32
    u, d, A, Bm, Cm, D, bias = _make(batch, G, L, dg, N, seed=13)
    y = selective_scan_g(
        u, d, A, Bm, Cm, D=D, delta_bias=bias, delta_softplus=True,
        reverse=True,
    )
    y_ref = _ref(
        u[:, :, ::-1], d[:, :, ::-1], A, Bm[:, :, ::-1], Cm[:, :, ::-1],
        D, bias,
    )[:, :, ::-1]
    np.testing.assert_allclose(y, y_ref, rtol=6e-4, atol=2e-3)


def _img_ref(x, wdt, wb, wc, A, D, bias):
    """Stacked-layout reference for the image kernel: build the two
    physical layouts, run the direction-paired proj scans, un-transpose
    and sum (the SS2D project_scan + merge path)."""
    from sigma_tpu.ops.pallas_scan_g import selective_scan_g_proj

    b, h, w, dg = x.shape
    l = h * w
    hw = x.reshape(b, l, dg)
    wh = jnp.swapaxes(x, 1, 2).reshape(b, l, dg)
    u2 = jnp.stack([hw, wh], axis=1)
    y = None
    for gi in range(2):
        yg = selective_scan_g_proj(
            u2, wdt[gi], wb[gi], wc[gi], A[gi], D=D[gi],
            delta_bias=bias[gi], delta_softplus=True,
            reverse=(gi == 1), interpret=True,
        )
        y = yg if y is None else y + yg
    return y[:, 0].reshape(b, h, w, dg) + jnp.swapaxes(
        y[:, 1].reshape(b, w, h, dg), 1, 2
    )


def test_image_kernel_matches_stacked_path():
    """selective_scan_ss2d_proj (one call: both directions, both layouts,
    in-kernel transposes) == the stacked-layout composition, values and
    all 7 gradient groups."""
    from sigma_tpu.ops.pallas_scan_g import selective_scan_ss2d_proj

    # geometry: gcd(16,64)=16 -> tw0=4, x8-scaled tw=8, th=2, T=128, nl=8
    b, h, w, dg, n = 4, 16, 64, 32, 8
    ks = jax.random.split(jax.random.PRNGKey(0), 7)
    x = jax.random.normal(ks[0], (b, h, w, dg), jnp.float32)
    wdt = jax.random.normal(ks[1], (2, 2, dg, dg)) * (0.3 / dg**0.5)
    wb = jax.random.normal(ks[2], (2, 2, dg, n)) / dg**0.5
    wc = jax.random.normal(ks[3], (2, 2, dg, n)) / dg**0.5
    A = -jnp.exp(jax.random.normal(ks[4], (2, 2, n, dg)))
    D = jax.random.normal(ks[5], (2, 2, dg))
    bias = jax.random.normal(ks[6], (2, 2, dg)) * 0.1

    def loss_img(args):
        x, wdt, wb, wc, A, D, bias = args
        y = selective_scan_ss2d_proj(
            x, wdt, wb, wc, A, D=D, delta_bias=bias, delta_softplus=True,
            interpret=True,
        )
        assert y is not None, "image plan unexpectedly infeasible"
        return (y.astype(jnp.float32) ** 2).sum()

    def loss_ref(args):
        x, wdt, wb, wc, A, D, bias = args
        y = _img_ref(x, wdt, wb, wc, A, D, bias)
        return (y.astype(jnp.float32) ** 2).sum()

    args = (x, wdt, wb, wc, A, D, bias)
    v_img = loss_img(args)
    v_ref = loss_ref(args)
    np.testing.assert_allclose(v_img, v_ref, rtol=2e-4)
    g_img = jax.grad(loss_img)(args)
    g_ref = jax.grad(loss_ref)(args)
    names = ["dx", "dwdt", "dwb", "dwc", "dA", "dD", "dbias"]
    for nme, a, bb in zip(names, g_img, g_ref):
        scale = max(float(jnp.abs(bb).max()), 1.0)
        err = float(jnp.abs(a - bb).max()) / scale
        assert err < 2e-3, (nme, err)


def test_proj_swap_groups_c():
    """swap_groups_c: each chain's scan consumes the OTHER chain's
    projected C (CroMB's cross-modal attention) — values and gradients
    must match the explicit swapped-stream composition."""
    from sigma_tpu.ops.pallas_scan_g import (
        selective_scan_g,
        selective_scan_g_proj,
    )

    b, g, L, dg, n = 4, 2, 256, 64, 8
    ks = jax.random.split(jax.random.PRNGKey(1), 7)
    u = jax.random.normal(ks[0], (b, g, L, dg), jnp.float32)
    wdt = jax.random.normal(ks[1], (g, dg, dg)) * (0.3 / dg**0.5)
    wb = jax.random.normal(ks[2], (g, dg, n)) / dg**0.5
    wc = jax.random.normal(ks[3], (g, dg, n)) / dg**0.5
    A = -jnp.exp(jax.random.normal(ks[4], (g, n, dg)))
    D = jax.random.normal(ks[5], (g, dg))
    bias = jax.random.normal(ks[6], (g, dg)) * 0.1

    def loss_proj(args):
        u, wdt, wb, wc, A, D, bias = args
        y = selective_scan_g_proj(
            u, wdt, wb, wc, A, D=D, delta_bias=bias, delta_softplus=True,
            swap_groups_c=True, interpret=True,
        )
        return (y**2).sum()

    def loss_ref(args):
        u, wdt, wb, wc, A, D, bias = args
        dts = jnp.einsum("bgld,gde->bgle", u, wdt)
        bs = jnp.einsum("bgld,gdn->bgln", u, wb)
        cs = jnp.flip(jnp.einsum("bgld,gdn->bgln", u, wc), axis=1)
        y = selective_scan_g(
            u, dts, A, bs, cs, D=D, delta_bias=bias, delta_softplus=True,
            interpret=True,
        )
        return (y**2).sum()

    args = (u, wdt, wb, wc, A, D, bias)
    np.testing.assert_allclose(loss_proj(args), loss_ref(args), rtol=2e-4)
    gp = jax.grad(loss_proj)(args)
    gr = jax.grad(loss_ref)(args)
    for nme, a, bb in zip(["du", "dwdt", "dwb", "dwc", "dA", "dD", "dbias"],
                          gp, gr):
        scale = max(float(jnp.abs(bb).max()), 1.0)
        err = float(jnp.abs(a - bb).max()) / scale
        assert err < 2e-3, (nme, err)


def test_proj_y_accum():
    """In-kernel output accumulation: y = scan(u, weights_g1, reverse) +
    y_prev must equal the separate-call + XLA-add pipeline, in value AND
    in every gradient (y_accum's cotangent is a pure passthrough)."""
    from sigma_tpu.ops.pallas_scan_g import selective_scan_g_proj

    batch, G, L, dg, N = 2, 2, 64, 24, 4
    u, wdt0, wb0, wc0, A, D, bias = _make_proj(batch, G, L, dg, N, seed=21)
    _, wdt1, wb1, wc1, _, _, _ = _make_proj(batch, G, L, dg, N, seed=22)

    def two_pass(args, fused):
        u, wdt0, wb0, wc0, wdt1, wb1, wc1 = args
        y0 = selective_scan_g_proj(
            u, wdt0, wb0, wc0, A, D=D, delta_bias=bias,
            delta_softplus=True, block_t=32,
        )
        if fused:
            return selective_scan_g_proj(
                u, wdt1, wb1, wc1, A, D=D, delta_bias=bias,
                delta_softplus=True, block_t=32, reverse=True, y_accum=y0,
            )
        y1 = selective_scan_g_proj(
            u, wdt1, wb1, wc1, A, D=D, delta_bias=bias,
            delta_softplus=True, block_t=32, reverse=True,
        )
        return y0 + y1

    args = (u, wdt0, wb0, wc0, wdt1, wb1, wc1)
    y_fused = two_pass(args, True)
    y_sep = two_pass(args, False)
    np.testing.assert_allclose(y_fused, y_sep, rtol=1e-5, atol=1e-5)

    gf = jax.grad(lambda a: (two_pass(a, True) ** 2).sum())(args)
    gs = jax.grad(lambda a: (two_pass(a, False) ** 2).sum())(args)
    for name, a, b in zip(
            ["du", "dwdt0", "dwb0", "dwc0", "dwdt1", "dwb1", "dwc1"],
            gf, gs):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=2e-4, atol=2e-4, err_msg=name
        )


@pytest.mark.parametrize("reverse", [False, True])
def test_multi_layout_proj(reverse):
    """Per-layout-operand kernel (selective_scan_g_proj_ml) must match the
    stacked selective_scan_g_proj exactly — same chains, same weights."""
    from sigma_tpu.ops.pallas_scan_g import (
        selective_scan_g_proj,
        selective_scan_g_proj_ml,
    )

    batch, G, L, dg, N = 4, 2, 64, 24, 4
    u, wdt, wb, wc, A, D, bias = _make_proj(batch, G, L, dg, N, seed=31)
    y_st = selective_scan_g_proj(
        u, wdt, wb, wc, A, D=D, delta_bias=bias, delta_softplus=True,
        block_t=32, reverse=reverse,
    )
    y0, y1 = selective_scan_g_proj_ml(
        (u[:, 0], u[:, 1]), wdt, wb, wc, A, D=D, delta_bias=bias,
        delta_softplus=True, block_t=32, reverse=reverse,
    )
    np.testing.assert_allclose(y0, y_st[:, 0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y1, y_st[:, 1], rtol=1e-5, atol=1e-5)


def test_multi_layout_proj_grads_accum_swap():
    """ml grads (stacked-bwd shim) + in-kernel accumulation + the CroMB
    C-swap must all match the stacked pipeline."""
    from sigma_tpu.ops.pallas_scan_g import (
        selective_scan_g_proj,
        selective_scan_g_proj_ml,
    )

    batch, G, L, dg, N = 4, 2, 64, 24, 4
    u, wdt0, wb0, wc0, A, D, bias = _make_proj(batch, G, L, dg, N, seed=41)
    _, wdt1, wb1, wc1, _, _, _ = _make_proj(batch, G, L, dg, N, seed=42)

    def model(args, ml):
        u, wdt0, wb0, wc0, wdt1, wb1, wc1 = args
        kw = dict(A=A, D=D, delta_bias=bias, delta_softplus=True,
                  block_t=32)
        if ml:
            ys = selective_scan_g_proj_ml(
                (u[:, 0], u[:, 1]), wdt0, wb0, wc0,
                swap_groups_c=True, **kw)
            ys = selective_scan_g_proj_ml(
                (u[:, 0], u[:, 1]), wdt1, wb1, wc1, reverse=True,
                y_accum=ys, **kw)
            return jnp.stack(ys, axis=1)
        y0 = selective_scan_g_proj(
            u, wdt0, wb0, wc0, swap_groups_c=True, **kw)
        y1 = selective_scan_g_proj(
            u, wdt1, wb1, wc1, reverse=True, **kw)
        return y0 + y1

    args = (u, wdt0, wb0, wc0, wdt1, wb1, wc1)
    np.testing.assert_allclose(
        model(args, True), model(args, False), rtol=1e-5, atol=1e-5
    )
    gm = jax.grad(lambda a: (model(a, True) ** 2).sum())(args)
    gs = jax.grad(lambda a: (model(a, False) ** 2).sum())(args)
    for name, a, b in zip(
            ["du", "dwdt0", "dwb0", "dwc0", "dwdt1", "dwb1", "dwc1"],
            gm, gs):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=2e-4, atol=2e-4, err_msg=name
        )
