"""Loss library + alternative decode heads + FLOPs tooling tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigma_tpu.models.builder import EncoderDecoder
from sigma_tpu.models.decoders.deeplabv3plus import (
    DeepLabV3Plus,
    resize_bilinear_align_corners,
)
from sigma_tpu.models.decoders.fcnhead import FCNHead
from sigma_tpu.models.decoders.upernet import UPerHead, adaptive_avg_pool
from sigma_tpu.utils.flops import (
    attention_fusion_flops,
    conmb_flops,
    param_count,
    selective_scan_flops,
)
from sigma_tpu.utils import losses

KEY = jax.random.PRNGKey(0)


def _rand(*shape):
    return jax.random.normal(jax.random.PRNGKey(1), shape, jnp.float32)


def _feats():
    return [
        _rand(1, 16, 16, 8),
        _rand(1, 8, 8, 16),
        _rand(1, 4, 4, 32),
        _rand(1, 2, 2, 64),
    ]


def test_adaptive_avg_pool_matches_torch():
    import torch

    x = np.random.randn(1, 7, 9, 3).astype(np.float32)
    for s in (1, 2, 3, 6):
        got = adaptive_avg_pool(jnp.asarray(x), s)
        want = (
            torch.nn.AdaptiveAvgPool2d(s)(
                torch.from_numpy(x.transpose(0, 3, 1, 2))
            )
            .numpy()
            .transpose(0, 2, 3, 1)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_align_corners_resize_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.randn(1, 4, 5, 2).astype(np.float32)
    got = resize_bilinear_align_corners(jnp.asarray(x), 9, 11)
    want = (
        F.interpolate(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), size=(9, 11),
            mode="bilinear", align_corners=True,
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("head_cls", [UPerHead, DeepLabV3Plus])
def test_alt_heads(head_cls):
    head = head_cls(num_classes=5)
    feats = _feats()
    v = jax.jit(lambda: head.init(KEY, feats))()
    y, _ = head.apply(
        v, feats, False, mutable=["batch_stats"], rngs={"dropout": KEY}
    )
    assert y.shape[0] == 1 and y.shape[-1] == 5


def test_fcn_head():
    head = FCNHead(num_classes=5)
    x = _rand(1, 4, 4, 32)
    v = head.init(KEY, x)
    y, _ = head.apply(v, x, False, mutable=["batch_stats"])
    assert y.shape == (1, 4, 4, 5)


def test_builder_upernet_with_aux():
    model = EncoderDecoder(
        num_classes=5, backbone="sigma_test", decoder="UPernet"
    )
    rgb = _rand(1, 32, 32, 3)
    v = jax.jit(lambda: model.init(KEY, rgb, rgb, return_aux=True))()
    (logits, aux), _ = model.apply(
        v, rgb, rgb, False, True, mutable=["batch_stats"],
        rngs={"dropout": KEY},
    )
    assert logits.shape == (1, 32, 32, 5)
    assert aux.shape == (1, 32, 32, 5)
    # eval path: no aux
    out = model.apply(v, rgb, rgb)
    assert out.shape == (1, 32, 32, 5)


def test_losses_cross_entropy_vs_torch():
    import torch

    logits = np.random.randn(2, 4, 4, 5).astype(np.float32)
    labels = np.random.randint(0, 5, (2, 4, 4))
    labels[0, 0, 0] = 255
    got = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    want = float(
        torch.nn.CrossEntropyLoss(ignore_index=255)(
            torch.from_numpy(logits.transpose(0, 3, 1, 2)),
            torch.from_numpy(labels).long(),
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_losses_finite_and_sane():
    logits = _rand(2, 8, 8, 5)
    labels = jnp.asarray(np.random.randint(0, 5, (2, 8, 8)))
    for fn in [
        lambda: losses.focal_loss_2d(logits, labels),
        lambda: losses.balance_loss(logits, labels),
        lambda: losses.ohem_cross_entropy(logits, labels, min_kept=16),
        lambda: losses.rce_loss(logits, labels, num_classes=5),
    ]:
        v = float(fn())
        assert np.isfinite(v) and v > 0
    # berhu on regression targets
    pred = _rand(2, 8, 8)
    target = jnp.abs(_rand(2, 8, 8)) + 0.1
    assert np.isfinite(float(losses.berhu_loss(pred, target)))
    # sigmoid focal on binary maps
    v = float(
        losses.sigmoid_focal_loss(
            _rand(2, 8, 8), jnp.asarray(np.random.randint(0, 2, (2, 8, 8))),
            ignore_index=255,
        )
    )
    assert np.isfinite(v)


def test_ohem_keeps_hard_pixels():
    # one clearly-easy pixel (huge logit margin) should be dropped when
    # threshold selects only hard ones
    logits = np.zeros((1, 2, 2, 3), np.float32)
    logits[0, 0, 0, 1] = 50.0  # easy pixel, class 1
    labels = np.ones((1, 2, 2), np.int64)
    full = float(losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    ohem = float(
        losses.ohem_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), thresh=0.9, min_kept=1
        )
    )
    assert ohem > full  # easy pixel diluted the mean CE


def test_flops_forms():
    assert selective_scan_flops(1, 100, 64, 16) == 9 * 100 * 64 * 16 + 6400
    # mamba fusion scales linearly in HW; attention quadratically
    r = [conmb_flops(hw, 96) for hw in (1000, 2000)]
    assert 1.9 < r[1] / r[0] < 2.1
    a = [attention_fusion_flops(hw, 96) for hw in (1000, 2000)]
    assert 3.5 < a[1] / a[0] < 4.5
    assert param_count({"a": np.zeros((2, 3)), "b": np.zeros(5)}) == 11


def test_mamba_decoder_deep_supervision():
    """DS heads: 3 aux full-res logits + unit-weight loss wiring
    (reference MambaDecoder.py:210-212, builder.py:158-165)."""
    import jax
    from sigma_tpu.models.builder import EncoderDecoder, segmentation_loss

    model = EncoderDecoder(
        num_classes=5, backbone="sigma_test", deep_supervision=True
    )
    rgb = jnp.zeros((1, 64, 64, 3), jnp.float32)
    mx = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), rgb, mx, return_aux=True)
    logits, aux = model.apply(variables, rgb, mx, return_aux=True)
    assert logits.shape == (1, 64, 64, 5)
    assert isinstance(aux, list) and len(aux) == 3
    for a in aux:
        assert a.shape == (1, 64, 64, 5)
    labels = jnp.zeros((1, 64, 64), jnp.int32)
    total = segmentation_loss(logits, labels) + sum(
        segmentation_loss(a, labels) for a in aux
    )
    assert np.isfinite(float(total))


def test_fused_final_head_matches_unfused():
    """The statistics-carrying fused head (upsample+LN+classifier folded,
    mamba_decoder.FinalUpsampleX4 w_out path) must equal the literal
    up -> LayerNorm -> dense composition exactly (same param tree, float
    reassociation error only)."""
    import jax

    from flax import linen as nn

    from sigma_tpu.models.decoders.mamba_decoder import (
        FinalUpsampleX4,
        _OutputKernel,
    )

    dim, nc = 48, 9

    class Unfused(nn.Module):
        @nn.compact
        def __call__(self, x):
            y = FinalUpsampleX4(dim=dim, name="up")(x)
            w = _OutputKernel(dim, nc, name="output")()
            return y @ w

    class Fused(nn.Module):
        @nn.compact
        def __call__(self, x):
            w = _OutputKernel(dim, nc, name="output")()
            return FinalUpsampleX4(dim=dim, name="up")(x, w_out=w)

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 12, 16, dim)) * 2 + 0.7
    vu = Unfused().init(jax.random.PRNGKey(1), x)
    vf = Fused().init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(vu) == jax.tree_util.tree_structure(
        vf
    )
    p = vu["params"]
    # randomized LN affine makes the fold non-trivial
    p["up"]["norm"]["scale"] = (
        jax.random.normal(jax.random.PRNGKey(2), (dim,)) + 1.0
    )
    p["up"]["norm"]["bias"] = (
        jax.random.normal(jax.random.PRNGKey(3), (dim,)) * 0.3
    )
    a = Unfused().apply({"params": p}, x)
    b = Fused().apply({"params": p}, x)
    err = float(jnp.abs(a - b).max()) / float(jnp.abs(a).max())
    assert err < 1e-5, err
