"""Model-layer tests: block shapes, parameter structure, full forward.

All init/apply calls are jitted: eager-mode flax init dispatches hundreds of
individually-compiled ops on CPU (~50s for one SS2D); one jitted program is
~20x faster.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigma_tpu.models.builder import EncoderDecoder, segmentation_loss
from sigma_tpu.models.decoders.mamba_decoder import (
    FinalUpsampleX4,
    MambaDecoder,
    PatchExpand,
    UpsampleExpand,
)
from sigma_tpu.models.fusion import ConcatMambaFusionBlock, CrossMambaFusionBlock
from sigma_tpu.models.ss2d import SS2D, ConMBSS2D, CrossMambaFusionSS2D
from sigma_tpu.models.vssm import (
    CVSSDecoderBlock,
    PatchMerging2D,
    VSSBlock,
    VSSMBackbone,
)

KEY = jax.random.PRNGKey(0)


def _rand(*shape):
    return jax.random.normal(jax.random.PRNGKey(42), shape, jnp.float32)


def _init(m, *args):
    return jax.jit(m.init)(KEY, *args)


def _apply(m, v, *args):
    return jax.jit(m.apply)(v, *args)


def test_ss2d_shape_and_params():
    m = SS2D(d_model=32, d_state=16)
    x = _rand(2, 8, 10, 32)
    variables = _init(m, x)
    y = _apply(m, variables, x)
    assert y.shape == x.shape
    p = variables["params"]
    d_inner = 64
    assert p["ssm"]["A_logs"].shape == (4 * d_inner, 16)
    assert p["ssm"]["Ds"].shape == (4 * d_inner,)
    assert p["ssm"]["x_proj_weight"].shape == (4, d_inner, 2 + 2 * 16)
    assert p["ssm"]["dt_projs_weight"].shape == (4, 2, d_inner)
    assert p["in_proj"]["kernel"].shape == (32, 2 * d_inner)
    # A_log init = log(1..N) tiled
    np.testing.assert_allclose(
        p["ssm"]["A_logs"][0], np.log(np.arange(1, 17)), rtol=1e-6
    )


def test_conmb_shape():
    m = ConMBSS2D(d_model=32, d_state=4)
    xr, xe = _rand(2, 6, 8, 32), _rand(2, 6, 8, 32)
    variables = _init(m, xr, xe)
    y = _apply(m, variables, xr, xe)
    assert y.shape == (2, 6, 8, 32)
    assert variables["params"]["ssm"]["A_logs"].shape == (2 * 64, 4)


def test_cromb_shape_and_c_swap():
    m = CrossMambaFusionSS2D(d_model=32, d_state=4)
    xr, xe = _rand(1, 4, 4, 32), _rand(1, 4, 4, 32)
    variables = _init(m, xr, xe)
    yr, ye = _apply(m, variables, xr, xe)
    assert yr.shape == xr.shape and ye.shape == xe.shape
    # swapping inputs must NOT merely swap outputs (the C matrices cross);
    # if C weren't swapped the op would factorize per modality.
    yr2, ye2 = _apply(m, variables, xe, xr)
    assert not np.allclose(yr2, ye, atol=1e-5)


def test_fusion_blocks():
    xr, xe = _rand(1, 4, 6, 16), _rand(1, 4, 6, 16)
    cromb = CrossMambaFusionBlock(hidden_dim=16, d_state=4)
    v = _init(cromb, xr, xe)
    r, e = _apply(cromb, v, xr, xe)
    assert r.shape == xr.shape and e.shape == xe.shape
    conmb = ConcatMambaFusionBlock(hidden_dim=16, d_state=4)
    v = _init(conmb, xr, xe)
    f = _apply(conmb, v, xr, xe)
    assert f.shape == xr.shape


@pytest.mark.parametrize("hw", [(8, 8), (7, 9)])
def test_patch_merging(hw):
    h, w = hw
    m = PatchMerging2D(out_dim=24)
    x = _rand(2, h, w, 12)
    v = _init(m, x)
    y = _apply(m, v, x)
    assert y.shape == (2, (h + 1) // 2, (w + 1) // 2, 24)


def test_vss_block_residual():
    m = VSSBlock(hidden_dim=16, drop_path=0.5)
    x = _rand(1, 4, 4, 16)
    v = _init(m, x)
    y = _apply(m, v, x)  # deterministic: drop_path off
    assert y.shape == x.shape
    # stochastic depth active under training rng
    y_tr = jax.jit(
        lambda v, x: m.apply(
            v, x, False, rngs={"dropout": jax.random.PRNGKey(1)}
        )
    )(v, x)
    assert y_tr.shape == x.shape


def test_backbone_pyramid():
    m = VSSMBackbone(depths=(1, 1, 1, 1), dims=(16, 32, 64, 128))
    x = _rand(1, 32, 48, 3)
    v = _init(m, x)
    outs = _apply(m, v, x)
    assert [o.shape for o in outs] == [
        (1, 8, 12, 16),
        (1, 4, 6, 32),
        (1, 2, 3, 64),
        (1, 1, 2, 128),
    ]


def test_decoder_upsample_modules():
    x = _rand(1, 3, 5, 32)
    pe = PatchExpand(dim=32)
    y = _apply(pe, _init(pe, x), x)
    assert y.shape == (1, 6, 10, 16)
    ue = UpsampleExpand(dim=32)
    y = _apply(ue, _init(ue, x), x)
    assert y.shape == (1, 6, 10, 16)
    fu = FinalUpsampleX4(dim=32)
    y = _apply(fu, _init(fu, x), x)
    assert y.shape == (1, 12, 20, 32)


def test_cvss_decoder_block():
    m = CVSSDecoderBlock(hidden_dim=18, d_state=4)
    x = _rand(1, 4, 4, 18)
    v = _init(m, x)
    y = _apply(m, v, x)
    assert y.shape == x.shape
    assert v["params"]["scale1"].shape == (18,)


def test_mamba_decoder_even_and_odd():
    dec = MambaDecoder(num_classes=5, embed_dim=8, depths=(1, 1, 1, 1))
    feats = [
        _rand(1, 16, 16, 8),
        _rand(1, 8, 8, 16),
        _rand(1, 4, 4, 32),
        _rand(1, 2, 2, 64),
    ]
    v = _init(dec, feats)
    y = _apply(dec, v, feats)
    assert y.shape == (1, 64, 64, 5)
    # PST900-style odd pyramid
    feats_odd = [
        _rand(1, 20, 18, 8),
        _rand(1, 10, 9, 16),
        _rand(1, 5, 5, 32),
        _rand(1, 3, 3, 64),
    ]
    v = _init(dec, feats_odd)
    y = _apply(dec, v, feats_odd)
    assert y.shape == (1, 80, 72, 5)


def test_segmentation_loss_ignore():
    logits = _rand(2, 4, 4, 3)
    labels = jnp.zeros((2, 4, 4), jnp.int32).at[0, 0, 0].set(255)
    loss = segmentation_loss(logits, labels)
    assert jnp.isfinite(loss)
    # all-ignored batch is finite (guard against 0/0)
    loss2 = segmentation_loss(logits, jnp.full((2, 4, 4), 255))
    assert jnp.isfinite(loss2) and loss2 == 0.0


def test_full_model_forward_and_grad():
    # miniature variant: same topology as sigma_tiny, CPU-friendly compile
    model = EncoderDecoder(num_classes=9, backbone="sigma_test")
    rgb = _rand(1, 32, 32, 3)
    mx = _rand(1, 32, 32, 3)
    v = _init(model, rgb, mx)
    logits = _apply(model, v, rgb, mx)
    assert logits.shape == (1, 32, 32, 9)
    assert bool(jnp.isfinite(logits).all())

    labels = jnp.zeros((1, 32, 32), jnp.int32)

    def loss_fn(params):
        out = model.apply({"params": params}, rgb, mx)
        return segmentation_loss(out, labels)

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(v["params"])
    assert jnp.isfinite(loss)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(g).all()) for g in flat)
    # every parameter receives gradient signal somewhere
    nonzero = sum(float(jnp.abs(g).sum()) > 0 for g in flat)
    assert nonzero / len(flat) > 0.9


def test_vssm_classifier():
    """Full classifier variant (reference VSSM, vmamba.py:1931-2147):
    patch embed -> stages -> LN -> GAP -> linear head."""
    import jax
    import jax.numpy as jnp

    from sigma_tpu.models.vssm import VSSMClassifier

    m = VSSMClassifier(
        num_classes=10, depths=(1, 1, 1, 1), dims=(16, 32, 64, 128),
        d_state=8, drop_path_rate=0.0,
    )
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    logits = m.apply(variables, x)
    assert logits.shape == (2, 10)
    # head params exist and the trunk param names match the backbone's
    assert "classifier_head" in variables["params"]
    assert "layers_0_blocks_0" in variables["params"]


def test_scanned_stage_equivalence():
    """Deep stages run under nn.scan with stacked params (compile-size fix
    for sigma_small/base). The scanned layout must equal the per-block
    layout when the per-block params are stacked along axis 0."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sigma_tpu.models.vssm import VSSMBackbone

    kw = dict(depths=(1, 3, 1, 1), dims=(8, 16, 32, 64), d_state=4,
              drop_path_rate=0.1, remat=False)
    m_unrolled = VSSMBackbone(scan_min_depth=99, **kw)
    m_scanned = VSSMBackbone(scan_min_depth=3, **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v_u = m_unrolled.init(jax.random.PRNGKey(1), x)

    # restack layers_1_blocks_{0,1,2} -> layers_1_scan
    p = dict(jax.tree_util.tree_map(lambda a: a, v_u["params"]))
    blocks = [p.pop(f"layers_1_blocks_{d}") for d in range(3)]
    p["layers_1_scan"] = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls, axis=0), *blocks
    )
    y_u = m_unrolled.apply(v_u, x)
    y_s = m_scanned.apply({"params": p}, x)
    for a, b in zip(y_u, y_s):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )
