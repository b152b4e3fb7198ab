"""Shared layers and initializers for the sigma_tpu model zoo.

Initializer notes (parity with the reference, which mixes PyTorch-default
inits with explicit ones — see SURVEY.md §2.5):
  * `torch_linear_kernel_init` / `torch_linear_bias_init`: PyTorch
    `nn.Linear` defaults (kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))).
    Used where the reference keeps Linear defaults (fusion modules, decoder
    linears).
  * `trunc_normal_init(0.02)`: used where the reference VSSM applies
    `_init_weights` (vmamba.py:2016-2023) to Linears inside the backbone.
  * dt-projection init: U(+-dt_rank**-0.5) weight and softplus-inverse bias
    (vmamba.py:728-753).
  * A_log S4D init `log(1..N)` and D ones (vmamba.py:755-782).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# Default LayerNorm epsilon: torch nn.LayerNorm default (1e-5), which is what
# every live code path in the reference ends up using (the partial(eps=1e-6)
# in block signatures is always overridden by nn.LayerNorm at call sites).
LN_EPS = 1e-5


def torch_linear_kernel_init(in_features: int):
    bound = 1.0 / math.sqrt(in_features)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_linear_bias_init(in_features: int):
    return torch_linear_kernel_init(in_features)


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


def dt_proj_kernel_init(dt_rank: int, dt_scale: float = 1.0):
    std = dt_rank**-0.5 * dt_scale

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -std, std)

    return init


def dt_proj_bias_init(dt_min: float = 0.001, dt_max: float = 0.1, floor: float = 1e-4):
    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(
            jax.random.uniform(key, shape, jnp.float32)
            * (math.log(dt_max) - math.log(dt_min))
            + math.log(dt_min)
        )
        dt = jnp.clip(dt, floor, None)
        # inverse of softplus
        inv = dt + jnp.log(-jnp.expm1(-dt))
        return inv.astype(dtype)

    return init


def a_log_init(copies: int, d_inner: int, d_state: int):
    import numpy as np

    def init(key, shape, dtype=jnp.float32):
        del key
        # computed in numpy so the S4D init is backend-exact (XLA CPU's log
        # is a fast approximation)
        a = np.log(np.arange(1, d_state + 1, dtype=np.float32))
        out = np.tile(a[None, :], (copies * d_inner, 1))
        assert out.shape == tuple(shape), (out.shape, shape)
        return jnp.asarray(out, dtype)

    return init


class DropPath(nn.Module):
    """Per-sample stochastic depth."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Mlp(nn.Module):
    hidden_features: int
    out_features: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_features = x.shape[-1]
        x = nn.Dense(
            self.hidden_features,
            dtype=self.dtype,
            kernel_init=torch_linear_kernel_init(in_features),
            bias_init=torch_linear_bias_init(in_features),
            name="fc1",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(
            self.out_features,
            dtype=self.dtype,
            kernel_init=torch_linear_kernel_init(self.hidden_features),
            bias_init=torch_linear_bias_init(self.hidden_features),
            name="fc2",
        )(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


def layer_norm(name: str | None = None, eps: float = LN_EPS, dtype=jnp.float32):
    # LayerNorm in float32 for stability regardless of activation dtype.
    return nn.LayerNorm(epsilon=eps, name=name, dtype=dtype)


def depthwise_conv3x3(features: int, bias: bool = True, name: str | None = None,
                      dtype: Dtype = jnp.float32):
    """3x3 depthwise conv, NHWC, stride 1, SAME padding (torch padding=1)."""
    return nn.Conv(
        features=features,
        kernel_size=(3, 3),
        feature_group_count=features,
        use_bias=bias,
        padding="SAME",
        name=name,
        dtype=dtype,
    )


def _up2x_axis(x, axis):
    """Exact 2x half-pixel bilinear along one axis: out[2i] = .25*in[i-1] +
    .75*in[i], out[2i+1] = .75*in[i] + .25*in[i+1] (edge-clamped)."""
    import jax.lax as lax

    lo = jnp.concatenate(
        [lax.slice_in_dim(x, 0, 1, axis=axis),
         lax.slice_in_dim(x, 0, x.shape[axis] - 1, axis=axis)], axis)
    hi = jnp.concatenate(
        [lax.slice_in_dim(x, 1, x.shape[axis], axis=axis),
         lax.slice_in_dim(x, x.shape[axis] - 1, x.shape[axis], axis=axis)],
        axis)
    even = 0.75 * x + 0.25 * lo
    odd = 0.75 * x + 0.25 * hi
    out = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] *= 2
    return out.reshape(shape)


def resize_bilinear(x, h: int, w: int):
    """NHWC bilinear resize, half-pixel centers (torch align_corners=False).

    The exact-2x case (the decoder's UpsampleExpand / FinalUpsample_X4 hot
    path) uses a closed-form lerp instead of jax.image.resize — the
    gather-based lowering costs ~3ms/fwd at the decoder head resolution.
    """
    b, ih, iw, c = x.shape
    if h == 2 * ih and w == 2 * iw:
        return _up2x_axis(_up2x_axis(x, 1), 2)
    return jax.image.resize(x, (b, h, w, c), method="bilinear")
