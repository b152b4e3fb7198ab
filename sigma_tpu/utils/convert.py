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

    if parts[0] == "classifier_norm":
        # reference classifier: nn.Sequential(norm, permute, avgpool,
        # flatten, head) => classifier.norm / classifier.head
        # (vmamba.py:2006-2012)
        tleaf = "weight" if parts[1] == "scale" else "bias"
        add(f"classifier.norm.{tleaf}")
        add(f"norm.{tleaf}")  # published-ckpt name before remap
        return out

    if parts[0] == "classifier_head":
        if parts[1] == "kernel":
            add("classifier.head.weight", t)
            add("head.weight", t)
        else:
            add("classifier.head.bias")
            add("head.bias")
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


def _is_scan_seg(p: str) -> bool:
    return p.startswith("layers_") and p.endswith("_scan")


def _scan_stack_resolve(parts, leaf, per_block_resolve):
    """Resolve a stacked nn.scan stage leaf (deep stages run under nn.scan
    with params stacked along axis 0) by resolving each per-block torch key
    and stacking. Returns (keys, stacked) or None."""
    idx = next(i for i, p in enumerate(parts) if _is_scan_seg(p))
    stage = parts[idx][: -len("_scan")]  # "layers_{i}"
    depth = leaf.shape[0]
    keys, ws = [], []
    for j in range(depth):
        pj = parts[:idx] + (f"{stage}_blocks_{j}",) + parts[idx + 1 :]
        got = per_block_resolve(pj)
        if got is None:
            return None
        keys.append(got[0])
        ws.append(got[1])
    return keys, np.stack(ws, axis=0)


def convert_vmamba_trunk(flax_trunk: Any, sd: Dict[str, np.ndarray]):
    """Fill a VSSMBackbone params tree from a torch VMamba state dict.

    Returns (new_tree, loaded_keys, missing_paths)."""
    import jax

    sd = _strip(sd)
    loaded, missing = [], []

    def pb(pj):
        for key, fn in _torch_candidates(pj):
            if key in sd:
                return key, fn(np.asarray(sd[key]))
        return None

    def fill(path, leaf):
        parts = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path
        )
        if any(_is_scan_seg(p) for p in parts):
            got = _scan_stack_resolve(parts, leaf, pb)
            if got is not None:
                keys, w = got
                if w.shape != leaf.shape:
                    raise ValueError(
                        f"shape mismatch for {'.'.join(parts)}: ckpt "
                        f"{w.shape} vs model {leaf.shape}"
                    )
                loaded.extend(keys)
                return w.astype(np.asarray(leaf).dtype)
            missing.append(".".join(parts))
            return leaf
        got = pb(parts)
        if got is not None:
            key, w = got
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
# Full trained-Sigma checkpoint converter: maps a COMPLETE torch Sigma model
# (Siamese trunk + CroMB/ConMB fusion + MambaDecoder) to the flax tree, so
# `eval.py -e <sigma>.pth` can score reference-released checkpoints.
# Envelope handling (`model`/`state_dict`/`module` keys, `module.` strip)
# follows /root/reference/utils/pyt_utils.py:155-192.
# ---------------------------------------------------------------------------

_T = lambda w: w.T
_CONV = lambda w: np.transpose(w, (2, 3, 1, 0))
_K_T = lambda w: np.transpose(w, (0, 2, 1))
_CONV1x1 = lambda w: w[:, :, 0, 0].T  # torch (O,I,1,1) -> flax Dense (I,O)
_ID = lambda w: w


def _ss2d_op_key(base: str, rest) -> "tuple[str, Any] | None":
    """Resolve a flax path under an SS2D `op` module to (torch_key, fn).

    base = torch prefix of the op module (e.g. '...blocks.0.op')."""
    if rest[0] in ("in_proj", "out_proj"):
        if rest[1] == "kernel":
            return f"{base}.{rest[0]}.weight", _T
        return f"{base}.{rest[0]}.bias", _ID
    if rest[0] == "conv2d":
        if rest[1] == "kernel":
            return f"{base}.conv2d.weight", _CONV
        return f"{base}.conv2d.bias", _ID
    if rest[0] == "ssm":
        fn = {"x_proj_weight": _K_T, "dt_projs_weight": _K_T}.get(rest[1], _ID)
        return f"{base}.{rest[1]}", fn
    if rest[0] == "out_norm":
        return (
            f"{base}.out_norm.{'weight' if rest[1] == 'scale' else 'bias'}",
            _ID,
        )
    return None


def _cromb_op_key(base: str, rest) -> "tuple[str, Any] | None":
    """CrossMambaFusion_SS2D_SSM op (vmamba.py:1549-1640 + CMA_ssm
    Cross_Mamba_Attention_SSM vmamba.py:1407-1545)."""
    name = rest[0]
    if name in ("in_proj", "in_proj_modalx", "out_proj_rgb", "out_proj_e"):
        if rest[1] == "kernel":
            return f"{base}.{name}.weight", _T
        return f"{base}.{name}.bias", _ID
    if name == "conv2d":
        if rest[1] == "kernel":
            return f"{base}.conv2d.weight", _CONV
        return f"{base}.conv2d.bias", _ID
    if name.startswith("x_proj_"):
        return f"{base}.CMA_ssm.{name}.weight", _T
    if name.startswith("dt_proj_"):
        # flax: dt_proj_{s}_weight / dt_proj_{s}_bias
        stem, leaf = name.rsplit("_", 1)
        return f"{base}.CMA_ssm.{stem}.{leaf}", (_T if leaf == "weight" else _ID)
    if name.startswith("A_log_") or name.startswith("D_"):
        return f"{base}.CMA_ssm.{name}", _ID
    if name.startswith("out_norm_"):
        return (
            f"{base}.CMA_ssm.{name}.{'weight' if rest[1] == 'scale' else 'bias'}",
            _ID,
        )
    return None


def _conmb_op_key(base: str, rest) -> "tuple[str, Any] | None":
    """ConMB_SS2D op (vmamba.py:1092-1284)."""
    name = rest[0]
    if name in ("in_proj", "in_proj_modalx", "out_proj"):
        if rest[1] == "kernel":
            return f"{base}.{name}.weight", _T
        return f"{base}.{name}.bias", _ID
    if name in ("conv2d", "conv2d_modalx"):
        if rest[1] == "kernel":
            return f"{base}.{name}.weight", _CONV
        return f"{base}.{name}.bias", _ID
    if name == "ssm":
        fn = {"x_proj_weight": _K_T, "dt_projs_weight": _K_T}.get(rest[1], _ID)
        return f"{base}.{rest[1]}", fn
    if name in ("out_norm1", "out_norm2"):
        return (
            f"{base}.{name}.{'weight' if rest[1] == 'scale' else 'bias'}",
            _ID,
        )
    if name.startswith(("fc1_", "fc2_")):
        # flax fc1_0/fc1_1 <- torch fc1.0/fc1.2 (Sequential with SiLU at 1)
        seq, idx = name.split("_")
        return f"{base}.{seq}.{0 if idx == '0' else 2}.weight", _T
    return None


def _cvss_block_key(base: str, rest) -> "tuple[str, Any] | None":
    """CVSSDecoderBlock (vmamba.py:1760-1811): scale1/2, norm1/2, op (SS2D),
    conv_blk = ChannelAttentionBlock `cab` Sequential (vmamba.py:1744-1757)."""
    name = rest[0]
    if name in ("scale1", "scale2"):
        return f"{base}.{name}", _ID
    if name in ("norm1", "norm2"):
        return (
            f"{base}.{name}.{'weight' if rest[1] == 'scale' else 'bias'}",
            _ID,
        )
    if name == "op":
        return _ss2d_op_key(f"{base}.op", rest[1:])
    if name == "conv_blk":
        sub = rest[1]
        if sub == "conv1":
            key = f"{base}.conv_blk.cab.0.{'weight' if rest[2] == 'kernel' else 'bias'}"
            return key, (_CONV if rest[2] == "kernel" else _ID)
        if sub == "conv2":
            key = f"{base}.conv_blk.cab.2.{'weight' if rest[2] == 'kernel' else 'bias'}"
            return key, (_CONV if rest[2] == "kernel" else _ID)
        if sub == "attn":
            fc = {"fc_0": 0, "fc_1": 2}[rest[2]]
            return f"{base}.conv_blk.cab.3.fc.{fc}.weight", _CONV1x1
    return None


def _sigma_full_resolve(parts, sd):
    """Map a flax EncoderDecoder param path to (torch_key, transform)."""
    if parts[0] == "backbone":
        sub = parts[1]
        if sub == "vssm":
            for key, fn in _torch_candidates(parts[2:]):
                if f"backbone.vssm.{key}" in sd:
                    return f"backbone.vssm.{key}", fn
            return None
        if sub.startswith("cross_mamba_"):
            i = sub[len("cross_mamba_"):]
            assert parts[2] == "op"
            return _cromb_op_key(f"backbone.cross_mamba.{i}.op", parts[3:])
        if sub.startswith("channel_attn_mamba_"):
            i = sub[len("channel_attn_mamba_"):]
            assert parts[2] == "op"
            return _conmb_op_key(
                f"backbone.channel_attn_mamba.{i}.op", parts[3:]
            )
        return None
    if parts[0] == "decode_head":
        sub = parts[1]
        if sub == "layers_up_0":
            if parts[2] == "expand":
                return "decode_head.layers_up.0.expand.weight", _T
            return (
                f"decode_head.layers_up.0.norm.{'weight' if parts[3] == 'scale' else 'bias'}",
                _ID,
            )
        if sub.startswith("layers_up_"):
            i = sub[len("layers_up_"):]
            base = f"decode_head.layers_up.{i}"
            if parts[2].startswith("blocks_"):
                j = parts[2][len("blocks_"):]
                return _cvss_block_key(f"{base}.blocks.{j}", parts[3:])
            if parts[2] == "upsample":
                if parts[3] == "linear":
                    return f"{base}.upsample.linear.weight", _T
                return (
                    f"{base}.upsample.norm.{'weight' if parts[4] == 'scale' else 'bias'}",
                    _ID,
                )
            return None
        if sub == "norm_up":
            return (
                f"decode_head.norm_up.{'weight' if parts[2] == 'scale' else 'bias'}",
                _ID,
            )
        if sub == "up":
            if parts[2] in ("linear1", "linear2"):
                return f"decode_head.up.{parts[2]}.weight", _T
            return (
                f"decode_head.up.norm.{'weight' if parts[3] == 'scale' else 'bias'}",
                _ID,
            )
        if sub == "output":
            return "decode_head.output.weight", _CONV1x1
    return None


def convert_sigma_full(params: Any, sd: Dict[str, np.ndarray]):
    """Fill a full EncoderDecoder params tree from a trained torch Sigma
    state dict. Returns (new_params, loaded, missing)."""
    sd = _strip(sd)

    def pb(pj):
        got = _sigma_full_resolve(pj, sd)
        if got is None:
            return None
        key, fn = got
        if key not in sd:
            return None
        return key, fn(np.asarray(sd[key]))

    def resolve(parts, leaf):
        if any(_is_scan_seg(p) for p in parts):
            return _scan_stack_resolve(parts, leaf, pb)
        return pb(parts)

    return _generic_fill(params, resolve)


def load_checkpoint_into_params(params: Any, ckpt_path: str):
    """Dispatch: full trained Sigma checkpoint -> convert_sigma_full;
    trunk-only VMamba ImageNet checkpoint -> load_vmamba_into_params."""
    logger = get_logger()
    sd = _strip(load_torch_state_dict(ckpt_path))
    if any(k.startswith(("backbone.", "decode_head.")) for k in sd):
        new_params, loaded, missing = convert_sigma_full(params, sd)
        unexpected = sorted(set(sd) - set(loaded))
        logger.info(
            "sigma full ingest: %d loaded, %d fresh-init, %d unexpected",
            len(loaded), len(missing), len(unexpected),
        )
        if missing:
            logger.warning("missing (fresh init): %s", missing[:20])
        if unexpected:
            logger.debug("unexpected: %s", unexpected[:20])
        return new_params
    return load_vmamba_into_params(params, ckpt_path)


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
        if isinstance(key, list):  # stacked nn.scan stage: one key per block
            loaded.extend(key)
        else:
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
