"""PyTorch VMamba checkpoint -> flax params converter.

Reproduces the reference's pretrained ingest (`/root/reference/models/
encoders/vmamba.py:2111-2191`): VMamba ImageNet classification checkpoints
are loaded into the Siamese trunk with key remapping
(`patch_embed.proj -> patch_embed.0`, `ln_1 -> norm`,
`self_attention -> op`) and strict=False (classifier head and missing
outnorms are tolerated). Because the trunk is weight-shared (Siamese), one
copy fills both modalities by construction.

Layout conventions converted here:
  torch Linear   (out, in)        -> flax Dense kernel (in, out)        [T]
  torch Conv2d   (O, I, kh, kw)   -> flax Conv kernel (kh, kw, I, O)
  depthwise conv (C, 1, kh, kw)   -> (kh, kw, 1, C)
  x_proj_weight  (K, C, D)        -> (K, D, C)
  dt_projs_weight(K, D, R)        -> (K, R, D)
  LayerNorm weight/bias           -> scale/bias
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from sigma_tpu.engine.logger import get_logger


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.npz checkpoint into {name: np.ndarray}."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    import torch  # CPU-only wheel is available in this image

    obj = torch.load(path, map_location="cpu", weights_only=False)
    for key in ("model", "state_dict", "module"):
        if isinstance(obj, dict) and key in obj:
            obj = obj[key]
            break
    return {
        k: v.detach().cpu().numpy()
        for k, v in obj.items()
        if hasattr(v, "detach")
    }


def _strip(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def _torch_candidates(flax_path: tuple[str, ...]) -> list[tuple[str, Any]]:
    """Map a flax param path (under the VSSM trunk) to candidate torch keys
    with their transform. Returns [(torch_key, transform_fn), ...]."""
    t = lambda w: w.T
    conv = lambda w: np.transpose(w, (2, 3, 1, 0))
    xproj = lambda w: np.transpose(w, (0, 2, 1))
    dtw = lambda w: np.transpose(w, (0, 2, 1))
    ident = lambda w: w

    parts = list(flax_path)
    out: list[tuple[str, Any]] = []

    def add(key, fn=ident):
        out.append((key, fn))

    if parts[0] == "patch_embed":
        sub, leaf = parts[1], parts[2]
        if sub == "proj":
            fn = conv if leaf == "kernel" else ident
            tleaf = "weight" if leaf == "kernel" else "bias"
            add(f"patch_embed.proj.{tleaf}", fn)
            add(f"patch_embed.0.{tleaf}", fn)
        else:  # norm
            tleaf = "weight" if leaf == "scale" else "bias"
            add(f"patch_embed.norm.{tleaf}")
            add(f"patch_embed.2.{tleaf}")
        return out

    if parts[0].startswith("outnorm"):
        tleaf = "weight" if parts[1] == "scale" else "bias"
        add(f"{parts[0]}.{tleaf}")
        return out

    if parts[0].startswith("layers_"):
        seg = parts[0].split("_")
        i = seg[1]
        if seg[2] == "downsample":
            sub, leaf = parts[1], parts[2]
            if sub == "reduction":
                add(f"layers.{i}.downsample.reduction.weight", t)
            else:
                tleaf = "weight" if leaf == "scale" else "bias"
                add(f"layers.{i}.downsample.norm.{tleaf}")
            return out
        j = seg[3]
        base_ops = [
            f"layers.{i}.blocks.{j}.self_attention",
            f"layers.{i}.blocks.{j}.op",
        ]
        if parts[1] == "norm":
            tleaf = "weight" if parts[2] == "scale" else "bias"
            add(f"layers.{i}.blocks.{j}.ln_1.{tleaf}")
            add(f"layers.{i}.blocks.{j}.norm.{tleaf}")
            return out
        if parts[1] == "op":
            rest = parts[2:]
            for base in base_ops:
                if rest[0] in ("in_proj", "out_proj"):
                    if rest[1] == "kernel":
                        add(f"{base}.{rest[0]}.weight", t)
                    else:
                        add(f"{base}.{rest[0]}.bias")
                elif rest[0] == "conv2d":
                    if rest[1] == "kernel":
                        add(f"{base}.conv2d.weight", conv)
                    else:
                        add(f"{base}.conv2d.bias")
                elif rest[0] == "ssm":
                    name = rest[1]
                    fn = {
                        "x_proj_weight": xproj,
                        "dt_projs_weight": dtw,
                    }.get(name, ident)
                    add(f"{base}.{name}", fn)
                elif rest[0] == "out_norm":
                    tleaf = "weight" if rest[1] == "scale" else "bias"
                    add(f"{base}.out_norm.{tleaf}")
            return out
    return out


def convert_vmamba_trunk(flax_trunk: Any, sd: Dict[str, np.ndarray]):
    """Fill a VSSMBackbone params tree from a torch VMamba state dict.

    Returns (new_tree, loaded_keys, missing_paths)."""
    import jax

    sd = _strip(sd)
    loaded, missing = [], []

    def fill(path, leaf):
        parts = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        for key, fn in _torch_candidates(parts):
            if key in sd:
                w = fn(np.asarray(sd[key]))
                if w.shape != leaf.shape:
                    raise ValueError(
                        f"shape mismatch for {'.'.join(parts)}: ckpt "
                        f"{w.shape} vs model {leaf.shape}"
                    )
                loaded.append(key)
                return w.astype(np.asarray(leaf).dtype)
        missing.append(".".join(parts))
        return leaf

    new_tree = jax.tree_util.tree_map_with_path(fill, flax_trunk)
    return new_tree, loaded, missing


def load_vmamba_into_params(params: Any, ckpt_path: str):
    """Load a VMamba ImageNet checkpoint into the `backbone/vssm` subtree of
    a full EncoderDecoder params tree (strict=False semantics)."""
    logger = get_logger()
    sd = load_torch_state_dict(ckpt_path)
    trunk = params["backbone"]["vssm"]
    new_trunk, loaded, missing = convert_vmamba_trunk(trunk, sd)
    unexpected = sorted(set(_strip(sd)) - set(loaded))
    logger.info(
        "vmamba ingest: %d tensors loaded, %d missing (fresh init), "
        "%d unexpected (dropped, e.g. classifier head)",
        len(loaded), len(missing), len(unexpected),
    )
    if missing:
        logger.debug("missing: %s", missing)
    out = dict(params)
    backbone = dict(out["backbone"])
    backbone["vssm"] = new_trunk
    out["backbone"] = backbone
    return out


# ---------------------------------------------------------------------------
# Dual-path ingest for the alternative backbones: the reference duplicates
# single-trunk ImageNet weights into both modality trunks
# (dual_segformer.py:438-473 `load_dualpath_model`, dual_swin.py analogue).
# ---------------------------------------------------------------------------


def _generic_fill(tree, resolve):
    """Walk a flax params tree; `resolve(path_tuple, leaf)` returns a
    converted array or None (keep init). Returns (tree, loaded, missing)."""
    import jax

    loaded, missing = [], []

    def fill(path, leaf):
        parts = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        got = resolve(parts, leaf)
        if got is None:
            missing.append(".".join(parts))
            return leaf
        key, w = got
        if w.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {'.'.join(parts)}: ckpt {w.shape} "
                f"vs model {leaf.shape}"
            )
        loaded.append(key)
        return w.astype(np.asarray(leaf).dtype)

    new = jax.tree_util.tree_map_with_path(fill, tree)
    return new, loaded, missing


def convert_mit_trunk(flax_trunk, sd):
    """Fill one MiTTrunk params tree from a torch SegFormer (MiT) ImageNet
    state dict. Key scheme: patch_embed{i}.{proj,norm}, block{i}.{j}.*,
    norm{i}."""
    sd = _strip(sd)
    t = lambda w: w.T
    conv = lambda w: np.transpose(w, (2, 3, 1, 0))

    def resolve(parts, leaf):
        name = parts[0]
        if name.startswith("patch_embed"):
            sub, lf = parts[1], parts[2]
            if sub == "proj":
                key = f"{name}.proj.{'weight' if lf == 'kernel' else 'bias'}"
                fn = conv if lf == "kernel" else (lambda w: w)
            else:
                key = f"{name}.norm.{'weight' if lf == 'scale' else 'bias'}"
                fn = lambda w: w
        elif name.startswith("block"):
            stage, j = name[5:].split("_")
            base = f"block{stage}.{j}"
            rest = parts[1:]
            fn = lambda w: w
            if rest[0] in ("norm1", "norm2"):
                key = f"{base}.{rest[0]}.{'weight' if rest[1] == 'scale' else 'bias'}"
            elif rest[0] == "attn":
                sub, lf = rest[1], rest[2]
                if sub in ("q", "kv", "proj"):
                    key = f"{base}.attn.{sub}.{'weight' if lf == 'kernel' else 'bias'}"
                    fn = t if lf == "kernel" else fn
                elif sub == "sr":
                    key = f"{base}.attn.sr.{'weight' if lf == 'kernel' else 'bias'}"
                    fn = conv if lf == "kernel" else fn
                else:  # sr_norm
                    key = f"{base}.attn.norm.{'weight' if lf == 'scale' else 'bias'}"
            elif rest[0] == "mlp":
                sub, lf = rest[1], rest[2]
                if sub == "dwconv":
                    key = f"{base}.mlp.dwconv.dwconv.{'weight' if lf == 'kernel' else 'bias'}"
                    fn = conv if lf == "kernel" else fn
                else:
                    key = f"{base}.mlp.{sub}.{'weight' if lf == 'kernel' else 'bias'}"
                    fn = t if lf == "kernel" else fn
            else:
                return None
        elif name.startswith("norm"):
            key = f"{name}.{'weight' if parts[1] == 'scale' else 'bias'}"
            fn = lambda w: w
        else:
            return None
        if key in sd:
            return key, fn(np.asarray(sd[key]))
        return None

    return _generic_fill(flax_trunk, resolve)


def load_mit_dualpath(params, ckpt_path: str):
    """Duplicate a single-trunk MiT checkpoint into both modality trunks
    (reference load_dualpath_model semantics)."""
    logger = get_logger()
    sd = load_torch_state_dict(ckpt_path)
    out = dict(params)
    backbone = dict(out["backbone"])
    total_loaded = 0
    for trunk_name in ("trunk", "extra_trunk"):
        new, loaded, missing = convert_mit_trunk(backbone[trunk_name], sd)
        backbone[trunk_name] = new
        total_loaded += len(loaded)
        logger.info(
            "mit ingest %s: %d loaded, %d fresh", trunk_name, len(loaded),
            len(missing),
        )
    out["backbone"] = backbone
    return out


def convert_swin_dual(flax_encoder, sd):
    """Fill a DualSwinEncoder params tree from a single-trunk torch Swin
    ImageNet state dict, duplicating weights into the modal-X path
    (reference dual_swin.py `load_dualpath_model`). FRM/FFM and per-stage
    out-norms stay at fresh init (they do not exist upstream)."""
    sd = _strip(sd)
    t = lambda w: w.T
    conv = lambda w: np.transpose(w, (2, 3, 1, 0))

    def resolve(parts, leaf):
        name = parts[0]
        # strip the modal-X suffix/prefix: both trunks get the same weights
        if name.startswith("patch_embed"):
            lf = parts[-1]
            key = f"patch_embed.proj.{'weight' if lf == 'kernel' else 'bias'}"
            return (key, conv(np.asarray(sd[key]))
                    if lf == "kernel" else np.asarray(sd[key])) \
                if key in sd else None
        if name.startswith("patch_norm"):
            key = f"patch_embed.norm.{'weight' if parts[-1] == 'scale' else 'bias'}"
            return (key, np.asarray(sd[key])) if key in sd else None
        core = name.replace("layers_d_", "layers_", 1) if name.startswith(
            "layers_d_") else name
        if core.startswith("layers_"):
            seg = core.split("_")
            i = seg[1]
            if seg[2] == "downsample":
                sub, lf = parts[1], parts[2]
                if sub == "reduction":
                    key = f"layers.{i}.downsample.reduction.weight"
                    return (key, t(np.asarray(sd[key]))) if key in sd else None
                key = f"layers.{i}.downsample.norm.{'weight' if lf == 'scale' else 'bias'}"
                return (key, np.asarray(sd[key])) if key in sd else None
            j = seg[3]
            base = f"layers.{i}.blocks.{j}"
            rest = parts[1:]
            if rest[0] in ("norm1", "norm2"):
                key = f"{base}.{rest[0]}.{'weight' if rest[1] == 'scale' else 'bias'}"
                return (key, np.asarray(sd[key])) if key in sd else None
            if rest[0] == "attn":
                sub = rest[1]
                if sub == "relative_position_bias_table":
                    key = f"{base}.attn.relative_position_bias_table"
                    return (key, np.asarray(sd[key])) if key in sd else None
                lf = rest[2]
                key = f"{base}.attn.{sub}.{'weight' if lf == 'kernel' else 'bias'}"
                if key in sd:
                    w = np.asarray(sd[key])
                    return key, (t(w) if lf == "kernel" else w)
                return None
            if rest[0] == "mlp":
                sub, lf = rest[1], rest[2]
                key = f"{base}.mlp.{sub}.{'weight' if lf == 'kernel' else 'bias'}"
                if key in sd:
                    w = np.asarray(sd[key])
                    return key, (t(w) if lf == "kernel" else w)
                return None
        return None

    return _generic_fill(flax_encoder, resolve)


def load_swin_dualpath(params, ckpt_path: str):
    logger = get_logger()
    sd = load_torch_state_dict(ckpt_path)
    new, loaded, missing = convert_swin_dual(params["backbone"], sd)
    logger.info("swin dual ingest: %d loaded, %d fresh", len(loaded),
                len(missing))
    out = dict(params)
    out["backbone"] = new
    return out
