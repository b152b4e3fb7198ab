"""Checkpoint-converter tests.

Layer-level numerical parity between torch modules (CPU) and the flax
layers fed with converted weights — this pins down every layout convention
the converter relies on — plus a tree-level ingest test against a synthetic
torch VMamba state dict with reference key names (vmamba.py:2137-2144
naming), checking strict=False semantics (classifier dropped, outnorms
fresh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sigma_tpu.models.vssm import VSSMBackbone
from sigma_tpu.utils.convert import convert_vmamba_trunk

KEY = jax.random.PRNGKey(0)


def test_linear_conversion():
    lin = torch.nn.Linear(6, 10)
    x = np.random.randn(4, 6).astype(np.float32)
    y_t = lin(torch.from_numpy(x)).detach().numpy()
    kernel = lin.weight.detach().numpy().T
    y_j = x @ kernel + lin.bias.detach().numpy()
    np.testing.assert_allclose(y_j, y_t, rtol=1e-5, atol=1e-6)


def test_conv_conversion():
    conv = torch.nn.Conv2d(3, 8, kernel_size=4, stride=4)
    x = np.random.randn(1, 3, 16, 16).astype(np.float32)
    y_t = conv(torch.from_numpy(x)).detach().numpy()  # (1, 8, 4, 4)
    from flax import linen as nn

    kernel = np.transpose(conv.weight.detach().numpy(), (2, 3, 1, 0))
    m = nn.Conv(8, (4, 4), strides=(4, 4))
    variables = {
        "params": {"kernel": jnp.asarray(kernel),
                   "bias": jnp.asarray(conv.bias.detach().numpy())}
    }
    y_j = m.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(y_j, (0, 3, 1, 2)), y_t, rtol=1e-4, atol=1e-5
    )


def test_depthwise_conv_conversion():
    c = 6
    conv = torch.nn.Conv2d(c, c, 3, padding=1, groups=c)
    x = np.random.randn(1, c, 8, 8).astype(np.float32)
    y_t = conv(torch.from_numpy(x)).detach().numpy()
    from flax import linen as nn

    kernel = np.transpose(conv.weight.detach().numpy(), (2, 3, 1, 0))
    m = nn.Conv(c, (3, 3), padding="SAME", feature_group_count=c)
    variables = {
        "params": {"kernel": jnp.asarray(kernel),
                   "bias": jnp.asarray(conv.bias.detach().numpy())}
    }
    y_j = m.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    np.testing.assert_allclose(
        np.transpose(y_j, (0, 3, 1, 2)), y_t, rtol=1e-4, atol=1e-5
    )


def test_layernorm_conversion():
    ln = torch.nn.LayerNorm(12)
    with torch.no_grad():
        ln.weight.uniform_(0.5, 1.5)
        ln.bias.uniform_(-0.5, 0.5)
    x = np.random.randn(3, 12).astype(np.float32)
    y_t = ln(torch.from_numpy(x)).detach().numpy()
    from flax import linen as nn

    m = nn.LayerNorm(epsilon=1e-5)
    variables = {
        "params": {"scale": jnp.asarray(ln.weight.detach().numpy()),
                   "bias": jnp.asarray(ln.bias.detach().numpy())}
    }
    y_j = m.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(y_j, y_t, rtol=1e-4, atol=1e-5)


def _synth_torch_trunk(depths, dims, d_state=16, ssm_ratio=2, in_ch=3):
    """Build a torch-style VMamba classification state dict (reference key
    names pre-remap: ln_1 / self_attention / patch_embed.proj)."""
    rng = np.random.default_rng(0)
    sd = {}

    def add(k, *shape):
        sd[k] = rng.standard_normal(shape).astype(np.float32)

    add("patch_embed.proj.weight", dims[0], in_ch, 4, 4)
    add("patch_embed.proj.bias", dims[0])
    add("patch_embed.norm.weight", dims[0])
    add("patch_embed.norm.bias", dims[0])
    for i, depth in enumerate(depths):
        d = dims[i]
        di = ssm_ratio * d
        r = -(-d // 16)
        for j in range(depth):
            b = f"layers.{i}.blocks.{j}"
            add(f"{b}.ln_1.weight", d)
            add(f"{b}.ln_1.bias", d)
            sa = f"{b}.self_attention"
            add(f"{sa}.in_proj.weight", 2 * di, d)
            add(f"{sa}.conv2d.weight", di, 1, 3, 3)
            add(f"{sa}.conv2d.bias", di)
            add(f"{sa}.x_proj_weight", 4, r + 2 * d_state, di)
            add(f"{sa}.dt_projs_weight", 4, di, r)
            add(f"{sa}.dt_projs_bias", 4, di)
            add(f"{sa}.A_logs", 4 * di, d_state)
            add(f"{sa}.Ds", 4 * di)
            add(f"{sa}.out_norm.weight", di)
            add(f"{sa}.out_norm.bias", di)
            add(f"{sa}.out_proj.weight", d, di)
        if i < len(depths) - 1:
            add(f"layers.{i}.downsample.norm.weight", 4 * d)
            add(f"layers.{i}.downsample.norm.bias", 4 * d)
            add(f"layers.{i}.downsample.reduction.weight", dims[i + 1], 4 * d)
    # classifier head: must be dropped by the converter
    add("classifier.norm.weight", dims[-1])
    add("classifier.head.weight", 1000, dims[-1])
    return sd


def test_trunk_ingest():
    depths, dims = (1, 1, 2, 1), (16, 32, 64, 128)
    trunk = VSSMBackbone(depths=depths, dims=dims, d_state=16)
    x = jnp.zeros((1, 32, 32, 3))
    variables = jax.jit(trunk.init)(KEY, x)
    sd = _synth_torch_trunk(depths, dims)
    new_params, loaded, missing = convert_vmamba_trunk(
        variables["params"], sd
    )
    # everything except the 4 outnorms (8 tensors) must load
    assert len(missing) == 8 and all("outnorm" in m for m in missing)
    assert set(loaded) == set(sd) - {
        "classifier.norm.weight", "classifier.head.weight",
    }
    # spot-check: x_proj_weight transposed into (K, D, C)
    got = np.asarray(new_params["layers_0_blocks_0"]["op"]["ssm"]["x_proj_weight"])
    want = np.transpose(
        sd["layers.0.blocks.0.self_attention.x_proj_weight"], (0, 2, 1)
    )
    np.testing.assert_array_equal(got, want)
    # converted trunk still runs
    outs = jax.jit(trunk.apply)({"params": new_params}, x)
    assert len(outs) == 4 and bool(jnp.isfinite(outs[0]).all())


def test_shape_mismatch_raises():
    depths, dims = (1, 1, 2, 1), (16, 32, 64, 128)
    trunk = VSSMBackbone(depths=depths, dims=dims, d_state=16)
    variables = jax.jit(trunk.init)(KEY, jnp.zeros((1, 32, 32, 3)))
    sd = _synth_torch_trunk(depths, dims)
    sd["patch_embed.proj.weight"] = sd["patch_embed.proj.weight"][:, :1]
    with pytest.raises(ValueError, match="shape mismatch"):
        convert_vmamba_trunk(variables["params"], sd)


def _synth_torch_mit(embed_dims, depths, heads, sr):
    rng = np.random.default_rng(1)
    sd = {}

    def add(k, *shape):
        sd[k] = rng.standard_normal(shape).astype(np.float32)

    in_ch = 3
    for i in range(4):
        d = embed_dims[i]
        p = 7 if i == 0 else 3
        add(f"patch_embed{i+1}.proj.weight", d, in_ch, p, p)
        add(f"patch_embed{i+1}.proj.bias", d)
        add(f"patch_embed{i+1}.norm.weight", d)
        add(f"patch_embed{i+1}.norm.bias", d)
        in_ch = d
        for j in range(depths[i]):
            b = f"block{i+1}.{j}"
            for nm in ("norm1", "norm2"):
                add(f"{b}.{nm}.weight", d)
                add(f"{b}.{nm}.bias", d)
            add(f"{b}.attn.q.weight", d, d)
            add(f"{b}.attn.q.bias", d)
            add(f"{b}.attn.kv.weight", 2 * d, d)
            add(f"{b}.attn.kv.bias", 2 * d)
            add(f"{b}.attn.proj.weight", d, d)
            add(f"{b}.attn.proj.bias", d)
            if sr[i] > 1:
                add(f"{b}.attn.sr.weight", d, d, sr[i], sr[i])
                add(f"{b}.attn.sr.bias", d)
                add(f"{b}.attn.norm.weight", d)
                add(f"{b}.attn.norm.bias", d)
            hid = 4 * d
            add(f"{b}.mlp.fc1.weight", hid, d)
            add(f"{b}.mlp.fc1.bias", hid)
            add(f"{b}.mlp.dwconv.dwconv.weight", hid, 1, 3, 3)
            add(f"{b}.mlp.dwconv.dwconv.bias", hid)
            add(f"{b}.mlp.fc2.weight", d, hid)
            add(f"{b}.mlp.fc2.bias", d)
        add(f"norm{i+1}.weight", d)
        add(f"norm{i+1}.bias", d)
    add("head.weight", 1000, embed_dims[-1])
    return sd


def test_mit_dualpath_ingest():
    from sigma_tpu.models.mit_encoder import MiTTrunk
    from sigma_tpu.utils.convert import convert_mit_trunk

    dims, depths, heads, sr = (8, 16, 32, 64), (1, 1, 1, 1), (1, 2, 4, 8), (8, 4, 2, 1)
    trunk = MiTTrunk(embed_dims=dims, depths=depths, num_heads=heads,
                     sr_ratios=sr)
    x = jnp.zeros((1, 64, 64, 3))
    v = jax.jit(trunk.init)(KEY, x)
    sd = _synth_torch_mit(dims, depths, heads, sr)
    new, loaded, missing = convert_mit_trunk(v["params"], sd)
    assert not missing, missing[:8]
    assert "head.weight" not in loaded
    # q kernel transposed
    got = np.asarray(new["block1_0"]["attn"]["q"]["kernel"])
    np.testing.assert_array_equal(got, sd["block1.0.attn.q.weight"].T)
    outs = jax.jit(trunk.apply)({"params": new}, x)
    assert len(outs) == 4


def test_swin_dualpath_ingest():
    from sigma_tpu.models.swin_encoder import DualSwinEncoder
    from sigma_tpu.utils.convert import convert_swin_dual

    enc = DualSwinEncoder(
        embed_dim=8, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8),
        window_size=4, attn_drop_rate=0.0,
    )
    x = jnp.zeros((1, 32, 32, 3))
    v = jax.jit(lambda: enc.init(KEY, x, x))()

    rng = np.random.default_rng(3)
    sd = {}

    def add(k, *shape):
        sd[k] = rng.standard_normal(shape).astype(np.float32)

    add("patch_embed.proj.weight", 8, 3, 4, 4)
    add("patch_embed.proj.bias", 8)
    add("patch_embed.norm.weight", 8)
    add("patch_embed.norm.bias", 8)
    dim = 8
    for i in range(4):
        b = f"layers.{i}.blocks.0"
        for nm in ("norm1", "norm2"):
            add(f"{b}.{nm}.weight", dim)
            add(f"{b}.{nm}.bias", dim)
        add(f"{b}.attn.qkv.weight", 3 * dim, dim)
        add(f"{b}.attn.qkv.bias", 3 * dim)
        add(f"{b}.attn.proj.weight", dim, dim)
        add(f"{b}.attn.proj.bias", dim)
        add(f"{b}.attn.relative_position_bias_table", 49, (1, 2, 4, 8)[i])
        add(f"{b}.mlp.fc1.weight", 4 * dim, dim)
        add(f"{b}.mlp.fc1.bias", 4 * dim)
        add(f"{b}.mlp.fc2.weight", dim, 4 * dim)
        add(f"{b}.mlp.fc2.bias", dim)
        if i < 3:
            add(f"layers.{i}.downsample.reduction.weight", 2 * dim, 4 * dim)
            add(f"layers.{i}.downsample.norm.weight", 4 * dim)
            add(f"layers.{i}.downsample.norm.bias", 4 * dim)
            dim *= 2

    new, loaded, missing = convert_swin_dual(v["params"], sd)
    # both trunks filled from the same checkpoint
    got = np.asarray(new["layers_0_blocks_0"]["attn"]["qkv"]["kernel"])
    got_d = np.asarray(new["layers_d_0_blocks_0"]["attn"]["qkv"]["kernel"])
    np.testing.assert_array_equal(got, sd["layers.0.blocks.0.attn.qkv.weight"].T)
    np.testing.assert_array_equal(got, got_d)
    # fusion modules remain fresh
    assert any("frm" in m or "ffm" in m for m in missing)
    # converted encoder runs
    outs, _ = enc.apply({"params": new}, x, x, mutable=["batch_stats"])
    assert len(outs) == 4
