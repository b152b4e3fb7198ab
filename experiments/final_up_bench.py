"""A/B the decoder final-upsample head: current closed-form 2x lerp chain vs
joint-phase upsample vs depthwise conv_transpose, with and without fp32 LN
converts. Shapes: decoder head (b8, 120x160x96 -> 480x640 logits)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/sigma_tpu_xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from sigma_tpu.models.common import resize_bilinear, _up2x_axis

B, H, W, C = 8, 120, 160, 96

def up2x2_phases(x):
    """Joint 2x2 half-pixel bilinear: 4 phase images interleaved."""
    def sh(a, axis, d):  # edge-clamped shift
        if d == -1:
            lo = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
            return jnp.concatenate([lo, jax.lax.slice_in_dim(a, 0, a.shape[axis]-1, axis=axis)], axis)
        hi = jax.lax.slice_in_dim(a, a.shape[axis]-1, a.shape[axis], axis=axis)
        return jnp.concatenate([jax.lax.slice_in_dim(a, 1, a.shape[axis], axis=axis), hi], axis)
    up, dn = sh(x, 1, -1), sh(x, 1, +1)
    rows_e = 0.75 * x + 0.25 * up      # out row 2i
    rows_o = 0.75 * x + 0.25 * dn      # out row 2i+1
    def cols(r):
        lf, rt = sh(r, 2, -1), sh(r, 2, +1)
        return 0.75 * r + 0.25 * lf, 0.75 * r + 0.25 * rt
    e_l, e_r = cols(rows_e)
    o_l, o_r = cols(rows_o)
    ph = jnp.stack([jnp.stack([e_l, e_r], 3), jnp.stack([o_l, o_r], 3)], 2)
    b, h, w2 = x.shape[0], x.shape[1], x.shape[2]
    return ph.reshape(b, 2*h, 2*w2, x.shape[3])

K1 = jnp.asarray([0.25, 0.75, 0.75, 0.25], jnp.float32)
def up2x_convt(x):
    k = (K1[:, None] * K1[None, :])[:, :, None, None]  # (4,4,1,1)
    kd = jnp.tile(k, (1, 1, 1, 1))
    c = x.shape[-1]
    kern = jnp.broadcast_to(k, (4, 4, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=((2, 1), (2, 1)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)

def timeit(f, x, iters=20):
    jf = jax.jit(f)
    r = jf(x); float(jnp.asarray(r).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jf(x)
    float(jnp.asarray(r).ravel()[0])
    return (time.perf_counter() - t0) / iters

x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C), jnp.bfloat16)
w1 = jax.random.normal(jax.random.PRNGKey(1), (C, C), jnp.bfloat16) * 0.1
wo = jax.random.normal(jax.random.PRNGKey(2), (C, 9), jnp.bfloat16) * 0.1
g = jnp.ones((C,), jnp.float32); be = jnp.zeros((C,), jnp.float32)

def ln_f32(v):
    v32 = v.astype(jnp.float32)
    mu = v32.mean(-1, keepdims=True)
    var = ((v32 - mu) ** 2).mean(-1, keepdims=True)
    return ((v32 - mu) * jax.lax.rsqrt(var + 1e-5) * g + be)

def head(up):
    def f(x):
        y = up(x @ w1)
        y = up((y.astype(jnp.bfloat16) @ w1))
        y = ln_f32(y)
        return (y.astype(jnp.bfloat16) @ wo).astype(jnp.float32).sum()
    return f

for name, up in [("lerp-chain (current)", lambda v: resize_bilinear(v, 2*v.shape[1], 2*v.shape[2])),
                 ("phase-joint", up2x2_phases),
                 ("conv-transpose", up2x_convt)]:
    # numeric check vs current
    ref = resize_bilinear(x.astype(jnp.float32), 2*H, 2*W)
    got = up(x.astype(jnp.float32))
    err = float(jnp.abs(ref - got).max())
    tf = timeit(head(up), x)
    fg = jax.jit(jax.grad(lambda v, f=head(up): f(v)))
    float(jnp.asarray(fg(x)).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10):
        r = fg(x)
    float(jnp.asarray(r).ravel()[0])
    tg = (time.perf_counter() - t0) / 10
    print(f"{name:22s} maxerr {err:.2e}  head fwd {tf*1e3:6.2f} ms  fwd+bwd {tg*1e3:6.2f} ms")
