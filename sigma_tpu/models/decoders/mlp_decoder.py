"""SegFormer-style all-MLP decode head.

Reference: `/root/reference/models/decoders/MLPDecoder.py:22-81` — per-level
linear embedding, bilinear upsample of all levels to the stride-4 grid,
concat, 1x1 fuse conv + BatchNorm + ReLU, dropout, 1x1 classifier.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from sigma_tpu.models.common import resize_bilinear, torch_linear_kernel_init

Dtype = Any


class MLPDecoder(nn.Module):
    num_classes: int
    embed_dim: int = 512
    dropout_ratio: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, deterministic: bool = True):
        _, h, w, _ = inputs[0].shape
        embeds = []
        for i, x in enumerate(inputs):
            e = nn.Dense(
                self.embed_dim,
                kernel_init=torch_linear_kernel_init(x.shape[-1]),
                bias_init=torch_linear_kernel_init(x.shape[-1]),
                dtype=self.dtype,
                name=f"linear_c{i + 1}",
            )(x)
            if e.shape[1:3] != (h, w):
                e = resize_bilinear(e, h, w)
            embeds.append(e)
        # reference concat order is [c4, c3, c2, c1] (MLPDecoder.py:69)
        x = jnp.concatenate(embeds[::-1], axis=-1)
        x = nn.Dense(
            self.embed_dim,
            use_bias=False,
            kernel_init=torch_linear_kernel_init(4 * self.embed_dim),
            dtype=self.dtype,
            name="linear_fuse",
        )(x)
        x = nn.BatchNorm(
            use_running_average=deterministic,
            momentum=0.9,
            epsilon=1e-5,
            name="bn",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)
        logits = nn.Dense(
            self.num_classes,
            kernel_init=torch_linear_kernel_init(self.embed_dim),
            bias_init=torch_linear_kernel_init(self.embed_dim),
            dtype=self.dtype,
            name="linear_pred",
        )(x)
        return logits
