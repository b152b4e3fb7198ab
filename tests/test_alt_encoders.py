"""Dual-MiT encoder + FRM/FFM fusion tests."""

import jax
import jax.numpy as jnp
import numpy as np

from sigma_tpu.models.builder import EncoderDecoder
from sigma_tpu.models.mit_encoder import DualMiTEncoder
from sigma_tpu.models.net_utils import (
    CrossAttention,
    FeatureFusionModule,
    FeatureRectifyModule,
)

KEY = jax.random.PRNGKey(0)


def _rand(*shape):
    return jax.random.normal(jax.random.PRNGKey(7), shape, jnp.float32)


def test_frm_exchange():
    m = FeatureRectifyModule(dim=16)
    x1, x2 = _rand(2, 4, 6, 16), _rand(2, 4, 6, 16)
    v = m.init(KEY, x1, x2)
    y1, y2 = m.apply(v, x1, x2)
    assert y1.shape == x1.shape and y2.shape == x2.shape
    # with zeroed weights the gates are sigmoid(0)=0.5: still residual
    assert not np.allclose(y1, x1)


def test_cross_attention_linear_shapes():
    m = CrossAttention(dim=16, num_heads=4)
    x1, x2 = _rand(1, 24, 16), _rand(1, 24, 16)
    v = m.init(KEY, x1, x2)
    y1, y2 = m.apply(v, x1, x2)
    assert y1.shape == x1.shape and y2.shape == x2.shape
    # outputs cross: modality 1 attends to context of modality 2
    y1b, _ = m.apply(v, x1, x2 * 2.0)
    assert not np.allclose(y1, y1b, atol=1e-5)


def test_ffm_fuse():
    m = FeatureFusionModule(dim=16, num_heads=4)
    x1, x2 = _rand(1, 4, 6, 16), _rand(1, 4, 6, 16)
    v = m.init(KEY, x1, x2)
    y, _ = m.apply(v, x1, x2, False, mutable=["batch_stats"])
    assert y.shape == (1, 4, 6, 16)


def test_dual_mit_pyramid():
    m = DualMiTEncoder(
        embed_dims=(8, 16, 32, 64), depths=(1, 1, 1, 1),
        num_heads=(1, 2, 4, 8),
    )
    xr, xe = _rand(1, 64, 64, 3), _rand(1, 64, 64, 3)
    v = jax.jit(lambda: m.init(KEY, xr, xe))()
    outs, _ = m.apply(v, xr, xe, False, mutable=["batch_stats"],
                      rngs={"dropout": KEY})
    assert [o.shape for o in outs] == [
        (1, 16, 16, 8),
        (1, 8, 8, 16),
        (1, 4, 4, 32),
        (1, 2, 2, 64),
    ]
    # separate (non-Siamese) trunks
    assert "trunk" in v["params"] and "extra_trunk" in v["params"]


def test_builder_mit_b0():
    model = EncoderDecoder(
        num_classes=5, backbone="mit_b0", decoder="MLPDecoder",
        decoder_embed_dim=32,
    )
    rgb = _rand(1, 64, 64, 3)
    v = jax.jit(lambda: model.init(KEY, rgb, rgb))()
    out, _ = model.apply(v, rgb, rgb, mutable=["batch_stats"])
    assert out.shape == (1, 64, 64, 5)


def test_dual_swin_small_shapes():
    from sigma_tpu.models.swin_encoder import DualSwinEncoder

    m = DualSwinEncoder(
        embed_dim=8, depths=(1, 2, 1, 1), num_heads=(1, 2, 4, 8),
        window_size=4, attn_drop_rate=0.0,
    )
    xr, xe = _rand(1, 36, 44, 3), _rand(1, 36, 44, 3)  # odd sizes for pads
    v = jax.jit(lambda: m.init(KEY, xr, xe))()
    outs, _ = m.apply(v, xr, xe, False, mutable=["batch_stats"],
                      rngs={"dropout": KEY})
    assert [o.shape for o in outs] == [
        (1, 9, 11, 8),
        (1, 5, 6, 16),
        (1, 3, 3, 32),
        (1, 2, 2, 64),
    ]
    # shifted-window path exercised (depth-2 stage has a shift block)
    assert "layers_1_blocks_1" in v["params"]


def test_swin_window_roundtrip():
    from sigma_tpu.models.swin_encoder import window_partition, window_reverse

    x = _rand(2, 8, 12, 5)
    w = window_partition(x, 4)
    assert w.shape == (2 * 2 * 3, 16, 5)
    back = window_reverse(w, 4, 2, 8, 12)
    np.testing.assert_allclose(back, x)


def test_swin_attn_mask():
    from sigma_tpu.models.swin_encoder import _shift_attn_mask

    m = _shift_attn_mask(8, 8, 4, 2)
    assert m.shape == (4, 16, 16)
    # the first (interior) window needs no masking
    np.testing.assert_array_equal(m[0], 0)
    # boundary windows mask cross-region pairs
    assert (m[1] < 0).any()
