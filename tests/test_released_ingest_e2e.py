"""End-to-end released-checkpoint ingest rehearsal.

The reference pipeline starts from the released VMamba ImageNet ckpts
(`/root/reference/models/encoders/vmamba.py:2180-2191`,
`pretrained/vmamba/*.pth` — git-LFS stubs in this environment). This test
synthesizes a checkpoint in the EXACT released envelope — a torch-saved
`.pth` whose payload sits under the `model` key with the PRE-remap torch
key names (`patch_embed.proj`, `ln_1`, `self_attention`, `norm`, `head`;
renamed at load by reference vmamba.py:2111-2147) and torch tensor layouts
— and drives it through the real `eval.py -e ckpt.pth` CLI against a
synthetic val set. It fails if the converter ever drifts from the released
format (`/root/reference/utils/pyt_utils.py:155-192` strict=False
semantics) or if the CLI ingest path breaks.

Key-name ground truth comes from the reference torch module's state_dict
(tests/torch_ref.py), not from our own converter — a converter drift
cannot self-consistently pass.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pytest

import cv2

torch = pytest.importorskip("torch")

from torch_ref import load_reference  # noqa: E402

# sigma_test hyperparameters (sigma_tpu/models/sigma_encoder.py:97-99):
# the smallest variant eval.py can build fast on the CPU test host
DEPTHS = (1, 1, 2, 1)
DIMS = (16, 32, 64, 128)


@pytest.fixture(scope="module")
def ref():
    return load_reference()


@pytest.fixture(scope="module")
def val_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("released_e2e")
    (root / "RGB").mkdir()
    (root / "Label").mkdir()
    (root / "Modal").mkdir()
    rng = np.random.default_rng(3)
    names = ["a", "b"]
    for n in names:
        img = rng.integers(0, 255, (32, 32, 3), np.uint8)
        cv2.imwrite(str(root / "RGB" / f"{n}.png"), img)
        cv2.imwrite(
            str(root / "Label" / f"{n}.png"),
            rng.integers(0, 9, (32, 32), np.uint8),
        )
        cv2.imwrite(str(root / "Modal" / f"{n}.png"), img[:, :, 0])
    (root / "train2.txt").write_text("\n".join(names) + "\n")
    (root / "test.txt").write_text("\n".join(names) + "\n")
    return str(root)


def _released_state_dict(ref):
    """Reference Backbone_VSSM state dict renamed to the RELEASED
    (classification-checkpoint) key names, plus the classifier tail."""
    torch.manual_seed(0)
    tm = ref.vmamba.Backbone_VSSM(
        depths=list(DEPTHS), dims=list(DIMS), d_state=16, ssm_ratio=2.0,
        out_indices=(0, 1, 2, 3), downsample_version="v1", mlp_ratio=0.0,
    )
    sd = {}
    for k, v in tm.state_dict().items():
        if k.startswith("outnorm"):
            continue  # classification ckpts carry no outnorms
        k2 = k.replace("patch_embed.0", "patch_embed.proj")
        k2 = k2.replace("patch_embed.2", "patch_embed.norm")
        if ".blocks." in k2:
            k2 = k2.replace(".norm.", ".ln_1.")
        k2 = k2.replace(".op.", ".self_attention.")
        sd[k2] = v.detach().clone()
    # classifier tail exactly as released (dropped by the trunk ingest)
    sd["norm.weight"] = torch.zeros(DIMS[-1])
    sd["norm.bias"] = torch.zeros(DIMS[-1])
    sd["head.weight"] = torch.zeros(1000, DIMS[-1])
    sd["head.bias"] = torch.zeros(1000)
    return sd


def _load_eval_cli():
    """Import the REPO's eval.py by path: torch_ref prepends
    /root/reference to sys.path, whose own eval.py would shadow it."""
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "eval.py")
    spec = importlib.util.spec_from_file_location("sigma_tpu_eval_cli", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_eval_cli_ingests_released_envelope(ref, val_root, tmp_path):
    eval_mod = _load_eval_cli()
    from configs import get_config
    from sigma_tpu.models.builder import build_model
    from sigma_tpu.utils.convert import load_checkpoint_into_params

    sd = _released_state_dict(ref)
    ckpt = tmp_path / "vssm_test_ckpt_epoch_292.pth"
    # released envelope: payload under the `model` key (vmamba.py:2183)
    torch.save({"model": sd}, str(ckpt))

    # direct converter check first: every released tensor except the
    # classifier tail must be consumed, and the params must change
    import functools

    import jax
    import jax.numpy as jnp

    cfg = get_config("mfnet", dataset_path=val_root)
    object.__setattr__(cfg, "backbone", "sigma_test")
    object.__setattr__(cfg, "image_height", 32)
    object.__setattr__(cfg, "image_width", 32)
    model = build_model(cfg)
    sample = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, return_aux=True))(
        jax.random.PRNGKey(0), sample, sample
    )
    params = load_checkpoint_into_params(variables["params"], str(ckpt))
    before = jax.tree_util.tree_leaves(
        variables["params"]["backbone"]["vssm"]
    )
    after = jax.tree_util.tree_leaves(params["backbone"]["vssm"])
    n_changed = sum(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    )
    # torch-init weights differ from flax-init weights wherever a released
    # tensor was ingested (biases are zero under both inits — not counted)
    assert n_changed >= 20, (
        f"released weights did not reach the params tree ({n_changed})"
    )

    # end-to-end CLI: eval.py -e ckpt.pth must load + score
    log_dir = str(tmp_path / "log")
    rc = eval_mod.main([
        "-n", "mfnet",
        "--dataset-path", val_root,
        "--backbone", "sigma_test",
        "-e", str(ckpt),
        "--log-dir", log_dir,
        "--override", "image_height=32",
        "--override", "image_width=32",
        "--override", "eval_crop_size=(32, 32)",
        "--override", "eval_scale_array=(1.0,)",
        "--override", "eval_flip=False",
    ])
    assert rc == 0


def test_eval_cli_rejects_drifted_envelope(ref, val_root, tmp_path):
    """A key-scheme drift (e.g. the post-remap names the reference only
    uses IN MEMORY) must be detected, not silently fresh-initialized: the
    ingest logs unexpected keys and the trunk stays at init."""
    import functools

    import jax
    import jax.numpy as jnp

    from configs import get_config
    from sigma_tpu.models.builder import build_model
    from sigma_tpu.utils.convert import load_checkpoint_into_params

    sd = _released_state_dict(ref)
    # simulate drift: scramble every trunk key out of the released scheme
    drifted = {re.sub(r"^layers\.", "stages.", k): v for k, v in sd.items()}
    ckpt = tmp_path / "drifted.pth"
    torch.save({"model": drifted}, str(ckpt))

    cfg = get_config("mfnet", dataset_path=val_root)
    object.__setattr__(cfg, "backbone", "sigma_test")
    model = build_model(cfg)
    sample = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, return_aux=True))(
        jax.random.PRNGKey(0), sample, sample
    )
    params = load_checkpoint_into_params(variables["params"], str(ckpt))
    # stage tensors must NOT have been ingested under the drifted names
    vssm_b = variables["params"]["backbone"]["vssm"]
    vssm_a = params["backbone"]["vssm"]
    for key in vssm_b:
        if not key.startswith("layers_"):
            continue
        lv_before = jax.tree_util.tree_leaves(vssm_b[key])
        lv_after = jax.tree_util.tree_leaves(vssm_a[key])
        assert all(
            np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(lv_before, lv_after)
        ), key
