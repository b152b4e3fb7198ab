"""Top-level EncoderDecoder network and model registry.

Reference: `/root/reference/models/builder.py:13-166`. The flax module is
pure: it maps (rgb, modal_x) -> logits upsampled to the input resolution
(`encode_decode`, builder.py:128-144). The training loss (CE with
ignore-index 255, builder.py:146-156) lives in `segmentation_loss` so the
same module serves train and eval.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from sigma_tpu.models.common import LN_EPS, resize_bilinear
from sigma_tpu.models.decoders import MambaDecoder, MLPDecoder
from sigma_tpu.models.decoders.deeplabv3plus import DeepLabV3Plus
from sigma_tpu.models.decoders.fcnhead import FCNHead
from sigma_tpu.models.decoders.upernet import UPerHead
from sigma_tpu.models.mit_encoder import MIT_VARIANTS, DualMiTEncoder
from sigma_tpu.models.sigma_encoder import SIGMA_VARIANTS, SigmaEncoder
from sigma_tpu.models.swin_encoder import SWIN_VARIANTS, DualSwinEncoder

Dtype = Any


class EncoderDecoder(nn.Module):
    """Sigma RGB-X segmentation network: Siamese VMamba encoder + decoder."""

    num_classes: int
    backbone: str = "sigma_tiny"
    decoder: str = "MambaDecoder"
    decoder_embed_dim: int = 512  # MLPDecoder only
    drop_path_rate: float | None = None  # None -> variant default
    ln_eps: float = LN_EPS
    scan_chunk: int = 128
    deep_supervision: bool = False  # MambaDecoder aux heads (builder.py:102)
    # rematerialize blocks in the bwd pass: True everywhere, False never,
    # or an int TOKEN THRESHOLD (H*W) — only blocks at least that large
    # remat (selective remat: the stride-4 blocks dominate both residual
    # memory and recompute cost; smaller blocks save residuals and skip
    # the recompute)
    remat: Any = True
    dtype: Dtype = jnp.float32

    aux_rate: float = 0.4  # aux-head loss weight (builder.py:87,96)

    @nn.compact
    def __call__(self, rgb, modal_x, deterministic: bool = True,
                 return_aux: bool = False):
        if self.backbone in SIGMA_VARIANTS:
            variant = dict(SIGMA_VARIANTS[self.backbone])
            if self.drop_path_rate is not None:
                variant["drop_path_rate"] = self.drop_path_rate
            dims = variant["dims"]
            feats = SigmaEncoder(
                **variant,
                ln_eps=self.ln_eps,
                scan_chunk=self.scan_chunk,
                remat=self.remat,
                dtype=self.dtype,
                name="backbone",
            )(rgb, modal_x, deterministic=deterministic)
        elif self.backbone in MIT_VARIANTS:
            variant = dict(MIT_VARIANTS[self.backbone])
            if self.drop_path_rate is not None:
                variant["drop_path_rate"] = self.drop_path_rate
            dims = variant["embed_dims"]
            feats = DualMiTEncoder(
                **variant, dtype=self.dtype, name="backbone",
            )(rgb, modal_x, deterministic=deterministic)
        elif self.backbone in SWIN_VARIANTS:
            variant = dict(SWIN_VARIANTS[self.backbone])
            if self.drop_path_rate is not None:
                variant["drop_path_rate"] = self.drop_path_rate
            dims = tuple(variant["embed_dim"] * 2**i for i in range(4))
            feats = DualSwinEncoder(
                **variant, dtype=self.dtype, name="backbone",
            )(rgb, modal_x, deterministic=deterministic)
        else:
            raise ValueError(
                f"unknown backbone {self.backbone!r}; options: "
                f"{sorted(SIGMA_VARIANTS) + sorted(MIT_VARIANTS) + sorted(SWIN_VARIANTS)}"
            )

        aux = None
        if self.decoder == "MambaDecoder":
            logits = MambaDecoder(
                num_classes=self.num_classes,
                embed_dim=dims[0],
                ln_eps=self.ln_eps,
                scan_chunk=self.scan_chunk,
                deep_supervision=self.deep_supervision,
                remat=self.remat,
                dtype=self.dtype,
                name="decode_head",
            )(feats, deterministic=deterministic)
            if self.deep_supervision:
                # aux = list of full-res DS logits, each CE-weighted 1.0
                # (reference builder.py:158-165)
                logits, aux = logits
        elif self.decoder == "MLPDecoder":
            logits = MLPDecoder(
                num_classes=self.num_classes,
                embed_dim=self.decoder_embed_dim,
                dtype=self.dtype,
                name="decode_head",
            )(feats, deterministic=deterministic)
        elif self.decoder == "UPernet":
            logits = UPerHead(
                num_classes=self.num_classes,
                channels=512,
                dtype=self.dtype,
                name="decode_head",
            )(feats, deterministic=deterministic)
            if return_aux:  # aux FCN head on the 1/16 feature (builder.py:86-88)
                aux = FCNHead(
                    num_classes=self.num_classes, dtype=self.dtype,
                    name="aux_head",
                )(feats[2], deterministic=deterministic)
        elif self.decoder == "deeplabv3+":
            logits = DeepLabV3Plus(
                num_classes=self.num_classes,
                dtype=self.dtype,
                name="decode_head",
            )(feats, deterministic=deterministic)
            if return_aux:
                aux = FCNHead(
                    num_classes=self.num_classes, dtype=self.dtype,
                    name="aux_head",
                )(feats[2], deterministic=deterministic)
        elif self.decoder in ("FCN", "fcn"):
            logits = FCNHead(
                num_classes=self.num_classes, dtype=self.dtype,
                name="decode_head",
            )(feats[-1], deterministic=deterministic)
        else:
            raise ValueError(f"unknown decoder {self.decoder!r}")

        h, w = rgb.shape[1:3]
        if logits.shape[1:3] != (h, w):
            logits = resize_bilinear(logits, h, w)
        if return_aux:
            if isinstance(aux, (list, tuple)):
                aux = [
                    resize_bilinear(a, h, w) if a.shape[1:3] != (h, w) else a
                    for a in aux
                ]
            elif aux is not None and aux.shape[1:3] != (h, w):
                aux = resize_bilinear(aux, h, w)
            return logits, aux
        return logits


def build_model(cfg) -> EncoderDecoder:
    """Construct the network from a config namespace (configs/*.py)."""
    return EncoderDecoder(
        num_classes=cfg.num_classes,
        backbone=cfg.backbone,
        decoder=cfg.decoder,
        decoder_embed_dim=getattr(cfg, "decoder_embed_dim", 512),
        deep_supervision=getattr(cfg, "deep_supervision", False),
        remat=getattr(cfg, "remat", True),
        scan_chunk=getattr(cfg, "scan_chunk", 128),
        dtype=jnp.bfloat16 if getattr(cfg, "bf16", False) else jnp.float32,
    )


def segmentation_loss(logits, labels, ignore_index: int = 255):
    """Mean CE over valid pixels (torch CrossEntropyLoss(ignore_index=255)).

    logits: (B, H, W, C) float; labels: (B, H, W) int.
    """
    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    # one-hot multiply-reduce instead of take_along_axis: the gather (and
    # its scatter adjoint) ran at ~1 GiB/s on TPU (52 ms/step at batch 8);
    # the compare-select-reduce fuses into the softmax region
    onehot = jax.nn.one_hot(safe_labels, logits.shape[-1], dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(valid.sum(), 1)
    return nll.sum() / count
