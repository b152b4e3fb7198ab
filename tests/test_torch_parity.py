"""Numerical parity vs the torch reference model running on CPU.

The torch side runs the real reference modules (/root/reference/models/...)
with the CUDA kernel replaced by an exact pure-torch recurrence
(tests/torch_ref.py). Weights are exported from torch, converted through
sigma_tpu.utils.convert, and the flax forward must match — this validates
the converter transposes, init/layout conventions, LN eps, SE gating order,
and scan semantics in one stroke.

Reference tolerance envelope: fp32 rtol 6e-4 / atol 2e-3
(/root/reference/models/encoders/selective_scan/test_selective_scan.py:148).
"""

from __future__ import annotations

import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import torch

from torch_ref import load_reference

from sigma_tpu.utils import convert as C


def _sd(torch_mod, prefix="m"):
    return {
        f"{prefix}.{k}": v.detach().cpu().numpy()
        for k, v in torch_mod.state_dict().items()
    }


def _fill(flax_params, sd, key_fn):
    def resolve(parts, leaf):
        got = key_fn(parts)
        if got is None:
            return None
        key, fn = got
        if key not in sd:
            return None
        return key, fn(np.asarray(sd[key]))

    new, loaded, missing = C._generic_fill(flax_params, resolve)
    assert not missing, f"unconverted flax params: {missing}"
    return new


def _assert_close(jax_out, torch_out, atol=2e-3, rtol=6e-4, label=""):
    a = np.asarray(jax_out, np.float32)
    b = torch_out.detach().cpu().numpy().astype(np.float32)
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=label)


@pytest.fixture(scope="module")
def ref():
    return load_reference()


def test_ss2d_parity(ref):
    from sigma_tpu.models.ss2d import SS2D

    torch.manual_seed(0)
    tm = ref.vmamba.SS2D(d_model=32, d_state=8, ssm_ratio=2.0, dt_rank="auto")
    tm.eval()
    x = torch.randn(2, 8, 12, 32)

    jm = SS2D(d_model=32, d_state=8)
    params = jm.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()))["params"]
    params = _fill(params, _sd(tm), lambda p: C._ss2d_op_key("m", p))

    with torch.no_grad():
        ty = tm(x)
    jy = jm.apply({"params": params}, jnp.asarray(x.numpy()))
    _assert_close(jy, ty, label="SS2D")


def test_cromb_parity(ref):
    from sigma_tpu.models.ss2d import CrossMambaFusionSS2D

    torch.manual_seed(1)
    tm = ref.vmamba.CrossMambaFusion_SS2D_SSM(
        d_model=32, d_state=4, ssm_ratio=2.0, dt_rank="auto"
    )
    tm.eval()
    xr = torch.randn(2, 6, 10, 32)
    xe = torch.randn(2, 6, 10, 32)

    jm = CrossMambaFusionSS2D(d_model=32, d_state=4)
    params = jm.init(
        jax.random.PRNGKey(0), jnp.asarray(xr.numpy()), jnp.asarray(xe.numpy())
    )["params"]
    params = _fill(params, _sd(tm), lambda p: C._cromb_op_key("m", p))

    with torch.no_grad():
        tr, te = tm(xr, xe)
    jr, je = jm.apply(
        {"params": params}, jnp.asarray(xr.numpy()), jnp.asarray(xe.numpy())
    )
    _assert_close(jr, tr, label="CroMB rgb")
    _assert_close(je, te, label="CroMB e")


def test_conmb_parity(ref):
    from sigma_tpu.models.ss2d import ConMBSS2D

    torch.manual_seed(2)
    tm = ref.vmamba.ConMB_SS2D(
        d_model=32, d_state=4, ssm_ratio=2.0, dt_rank="auto"
    )
    tm.eval()
    xr = torch.randn(2, 6, 10, 32)
    xe = torch.randn(2, 6, 10, 32)

    jm = ConMBSS2D(d_model=32, d_state=4)
    params = jm.init(
        jax.random.PRNGKey(0), jnp.asarray(xr.numpy()), jnp.asarray(xe.numpy())
    )["params"]
    params = _fill(params, _sd(tm), lambda p: C._conmb_op_key("m", p))

    with torch.no_grad():
        ty = tm(xr, xe)
    jy = jm.apply(
        {"params": params}, jnp.asarray(xr.numpy()), jnp.asarray(xe.numpy())
    )
    _assert_close(jy, ty, label="ConMB")


def test_cvss_decoder_block_parity(ref):
    from sigma_tpu.models.vssm import CVSSDecoderBlock

    torch.manual_seed(3)
    tm = ref.vmamba.CVSSDecoderBlock(
        hidden_dim=32, drop_path=0.0, d_state=4, ssm_ratio=2.0,
        dt_rank="auto", mlp_ratio=0.0, norm_layer=torch.nn.LayerNorm,
    )
    tm.eval()
    x = torch.randn(2, 8, 8, 32)

    jm = CVSSDecoderBlock(hidden_dim=32, d_state=4)
    params = jm.init(jax.random.PRNGKey(0), jnp.asarray(x.numpy()))["params"]
    params = _fill(params, _sd(tm), lambda p: C._cvss_block_key("m", p))

    with torch.no_grad():
        ty = tm(x)
    jy = jm.apply({"params": params}, jnp.asarray(x.numpy()))
    _assert_close(jy, ty, label="CVSSDecoderBlock")


def _build_torch_sigma_test(ref, num_classes=9, hw=(64, 64)):
    """Reference-architecture model at sigma_mini scale (depths 1,1,2,1;
    dims 32 — the smallest non-degenerate CAB squeeze) — full encoder +
    fusion + MambaDecoder."""
    torch.manual_seed(4)
    enc = ref.dual_vmamba.RGBXTransformer(
        depths=[1, 1, 2, 1], dims=32, pretrained=None, mlp_ratio=0.0,
        downsample_version="v1", drop_path_rate=0.1,
    )
    dec = ref.mamba_decoder.MambaDecoder(
        img_size=list(hw), in_channels=[32, 64, 128, 256],
        num_classes=num_classes, embed_dim=32, deep_supervision=False,
    )
    enc.eval()
    dec.eval()

    def forward(rgb_nchw, x_nchw):
        feats = enc(rgb_nchw, x_nchw)
        out = dec(feats)
        if isinstance(out, tuple):
            out = out[0]
        return torch.nn.functional.interpolate(
            out, size=hw, mode="bilinear", align_corners=False
        )

    sd = {}
    sd.update({f"backbone.{k}": v for k, v in _sd(enc, "x").items()})
    sd.update({f"decode_head.{k}": v for k, v in _sd(dec, "x").items()})
    # strip the helper prefix
    sd = {k.replace(".x.", ".", 1): v for k, v in sd.items()}
    return forward, sd


def test_full_sigma_parity(ref):
    """Full-model logits parity: trunk + CroMB/ConMB + MambaDecoder."""
    from sigma_tpu.models.builder import EncoderDecoder

    fwd, sd = _build_torch_sigma_test(ref)
    rgb = torch.randn(1, 3, 64, 64)
    mx = torch.randn(1, 3, 64, 64)

    jm = EncoderDecoder(num_classes=9, backbone="sigma_mini")
    rgb_j = jnp.asarray(rgb.permute(0, 2, 3, 1).numpy())
    mx_j = jnp.asarray(mx.permute(0, 2, 3, 1).numpy())
    params = jm.init(jax.random.PRNGKey(0), rgb_j, mx_j)["params"]

    new_params, loaded, missing = C.convert_sigma_full(params, sd)
    assert not missing, f"unconverted flax params: {missing}"

    with torch.no_grad():
        ty = fwd(rgb, mx)  # (1, 9, 64, 64)
    jy = jm.apply({"params": new_params}, rgb_j, mx_j)  # (1, 64, 64, 9)
    _assert_close(
        jnp.transpose(jy, (0, 3, 1, 2)), ty, atol=5e-3, rtol=1e-3,
        label="full sigma logits",
    )


def test_full_checkpoint_roundtrip(ref, tmp_path):
    """eval.py -e <full_sigma>.pth path: envelope handling + dispatch."""
    from sigma_tpu.models.builder import EncoderDecoder

    _, sd = _build_torch_sigma_test(ref)
    path = tmp_path / "sigma_full.pth"
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}},
               str(path))

    jm = EncoderDecoder(num_classes=9, backbone="sigma_mini")
    rgb = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jm.init(jax.random.PRNGKey(0), rgb, rgb)["params"]
    loaded = C.load_checkpoint_into_params(params, str(path))
    direct, n_loaded, missing = C.convert_sigma_full(params, sd)
    assert not missing

    flat_a = jax.tree_util.tree_leaves(loaded)
    flat_b = jax.tree_util.tree_leaves(direct)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vmamba_imagenet_ckpt_ingest(ref, tmp_path):
    """ImageNet VMamba classifier checkpoints use PRE-remap key names
    (`patch_embed.proj`, `ln_1`, `self_attention`, `norm`, `head` — the
    reference renames them at load, vmamba.py:2111-2147). Build a real
    reference Backbone_VSSM state dict, rename keys back to the published
    checkpoint convention, and assert our trunk ingest consumes it."""
    import torch

    tm = ref.vmamba.Backbone_VSSM(
        depths=(1, 1, 1, 1), dims=(16, 32, 64, 128), d_state=8,
        ssm_ratio=2.0, out_indices=(0, 1, 2, 3), downsample_version="v1",
        mlp_ratio=0.0,
    )
    sd = tm.state_dict()
    # inverse of the reference's change_name remaps => published key names
    renamed = {}
    for k, v in sd.items():
        k2 = k.replace("patch_embed.0", "patch_embed.proj")
        k2 = k2.replace("patch_embed.2", "patch_embed.norm")
        k2 = k2.replace(".norm.", ".ln_1.") if ".blocks." in k2 else k2
        k2 = k2.replace(".op.", ".self_attention.")
        renamed[k2] = v
    # a real classifier ckpt also carries the head; ingest must drop it
    renamed["classifier.head.weight"] = torch.zeros(10, 128)
    renamed["classifier.head.bias"] = torch.zeros(10)
    path = tmp_path / "vmamba_tiny_synth.pth"
    torch.save({"model": renamed}, path)

    from sigma_tpu.models.sigma_encoder import SigmaEncoder

    enc = SigmaEncoder(
        depths=(1, 1, 1, 1), dims=(16, 32, 64, 128), d_state=8,
        drop_path_rate=0.0,
    )
    rgb = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), rgb, rgb)
    params = {"backbone": variables["params"]}
    new_params = C.load_vmamba_into_params(params, str(path))
    # outnorms are in the trunk; every trunk tensor must have been loaded
    trunk = params["backbone"]["vssm"]
    new_trunk = new_params["backbone"]["vssm"]
    _, loaded, missing = C.convert_vmamba_trunk(
        trunk, C.load_torch_state_dict(str(path))
    )
    assert not missing, f"trunk params not covered by ckpt: {missing}"
    # and the loaded values actually landed (pick one deep leaf)
    pe = new_trunk["patch_embed"]["proj"]["kernel"]
    assert np.asarray(pe).shape == (4, 4, 3, 16)


def test_scanned_trunk_convert_parity(ref):
    """Deep stages stored as nn.scan-stacked params: the trunk converter
    must stack the per-block torch tensors, and the converted scanned
    model must match the torch reference forward."""
    from sigma_tpu.models.vssm import VSSMBackbone

    depths, dims = (1, 2, 1, 1), (16, 32, 64, 128)
    tm = ref.vmamba.Backbone_VSSM(
        depths=depths, dims=dims, d_state=8, ssm_ratio=2.0,
        out_indices=(0, 1, 2, 3), downsample_version="v1", mlp_ratio=0.0,
        drop_path_rate=0.0,
    )
    tm.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}

    fm = VSSMBackbone(
        depths=depths, dims=dims, d_state=8, drop_path_rate=0.0,
        remat=False, scan_min_depth=2,  # stage 1 (depth 2) scans
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    variables = fm.init(jax.random.PRNGKey(1), x)
    assert "layers_1_scan" in variables["params"]
    new_trunk, loaded, missing = C.convert_vmamba_trunk(
        variables["params"], sd
    )
    assert not missing, missing
    # every torch block tensor of stage 1 must have been consumed
    assert any("layers.1.blocks.1" in k for k in loaded)

    y_flax = fm.apply({"params": new_trunk}, x)
    with torch.no_grad():
        y_torch = tm(torch.from_numpy(
            np.asarray(x.transpose(0, 3, 1, 2), np.float32)
        ))
    for a, b, lbl in zip(y_flax, y_torch, "0123"):
        _assert_close(a.transpose(0, 3, 1, 2), b, label=f"stage{lbl}")


def test_vssm_classifier_parity(ref, tmp_path):
    """Full VSSM classifier (reference vmamba.py:1931-2147): torch logits
    parity at tiny dims AND checkpoint ingest with the head KEPT
    (classifier.norm/avgpool/head tail, vmamba.py:2006-2012)."""
    import torch

    from sigma_tpu.models.vssm import VSSMClassifier
    from sigma_tpu.utils.convert import convert_vmamba_trunk

    depths, dims = (1, 1, 1, 1), (16, 32, 64, 128)
    tm = ref.vmamba.VSSM(
        depths=depths, dims=dims, d_state=8, ssm_ratio=2.0,
        num_classes=10, mlp_ratio=0.0, drop_path_rate=0.0,
        downsample_version="v1",
    )
    tm.eval()
    sd = {k: v.detach().cpu().numpy() for k, v in tm.state_dict().items()}

    fm = VSSMClassifier(
        num_classes=10, depths=depths, dims=dims, d_state=8,
        drop_path_rate=0.0,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    variables = fm.init(jax.random.PRNGKey(1), x)
    new_params, loaded, missing = convert_vmamba_trunk(
        variables["params"], sd
    )
    assert not missing, missing
    # the classifier tail must have been consumed from the ckpt
    assert any(k.startswith("classifier.head") for k in loaded)
    assert any(k.startswith("classifier.norm") for k in loaded)

    logits = fm.apply({"params": new_params}, x)
    with torch.no_grad():
        logits_t = tm(torch.from_numpy(
            np.asarray(x.transpose(0, 3, 1, 2), np.float32)
        ))
    _assert_close(logits, logits_t, label="classifier logits")


@pytest.mark.parametrize(
    "name,depths,dims",
    [
        ("tiny", (2, 2, 9, 2), (96, 192, 384, 768)),
        ("small", (2, 2, 27, 2), (96, 192, 384, 768)),
        ("base", (2, 2, 27, 2), (128, 256, 512, 1024)),
    ],
)
def test_released_ckpt_key_coverage(ref, name, depths, dims):
    """Real-weights ingest rehearsal: the released VMamba ImageNet
    checkpoints (git-LFS stubs in this environment) carry the PRE-remap key
    names (`patch_embed.proj`, `ln_1`, `self_attention`, `norm`, `head` —
    renamed at load by reference vmamba.py:2111-2147) at the exact
    tiny/small/base hyperparameters of dual_vmamba.py:113-144. Synthesize
    that key set from the REAL reference Backbone_VSSM state dict at full
    depth/width and assert the converter consumes 100% of it (classifier
    tail dropped, outnorms fresh-init — the reference's strict=False diff,
    vmamba.py:2180-2191)."""
    from sigma_tpu.models.vssm import VSSMBackbone
    from sigma_tpu.utils.convert import convert_vmamba_trunk

    tm = ref.vmamba.Backbone_VSSM(
        depths=depths, dims=dims, d_state=16, ssm_ratio=2.0,
        out_indices=(0, 1, 2, 3), downsample_version="v1", mlp_ratio=0.0,
    )
    sd = {}
    for k, v in tm.state_dict().items():
        if k.startswith("outnorm"):
            continue  # classification ckpts have no outnorms
        k2 = k.replace("patch_embed.0", "patch_embed.proj")
        k2 = k2.replace("patch_embed.2", "patch_embed.norm")
        if ".blocks." in k2:
            k2 = k2.replace(".norm.", ".ln_1.")
        k2 = k2.replace(".op.", ".self_attention.")
        sd[k2] = v.detach().cpu().numpy()
    # classifier tail as released (must be dropped by the trunk ingest)
    sd["norm.weight"] = np.zeros(dims[-1], np.float32)
    sd["norm.bias"] = np.zeros(dims[-1], np.float32)
    sd["head.weight"] = np.zeros((1000, dims[-1]), np.float32)
    sd["head.bias"] = np.zeros(1000, np.float32)
    del tm

    trunk = VSSMBackbone(depths=depths, dims=dims, d_state=16)
    shapes = jax.eval_shape(
        trunk.init, jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    params = jax.tree_util.tree_map(
        lambda s: np.zeros(s.shape, s.dtype), shapes["params"]
    )
    _, loaded, missing = convert_vmamba_trunk(params, sd)
    assert all("outnorm" in m for m in missing), missing
    classifier_keys = {k for k in sd if k.startswith(("norm.", "head."))}
    uncovered = set(sd) - set(loaded) - classifier_keys
    assert not uncovered, f"released {name} keys not ingested: {sorted(uncovered)[:10]}"
