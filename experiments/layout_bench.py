"""Micro-benchmarks for the fused-K SS2D pipeline redesign.

Measures the layout primitives the new design needs on the real chip:
  - (B,H,W,C) -> (B,W,H,C) transpose (column-major scan direction)
  - lax.rev along L (reversed scan directions)
  - lane-concat of 4 (B,L,D) into (B,L,4D) (fused-K kernel input)
  - natural-layout projection matmul vs the per-direction batched einsum
  - fp32 vs bf16 big matmul (MXU rate check)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sigma_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, *args, iters=20, label=""):
    float(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        float(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:52s} {dt * 1e3:9.3f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    B, H, W, D = 4, 120, 160, 192
    L = H * W
    x = jax.random.normal(key, (B, H, W, D), jnp.float32)

    timed(jax.jit(lambda x: jnp.swapaxes(x, 1, 2).sum()), x,
          label="transpose HWC->WHC (4,120,160,192)")
    xl = x.reshape(B, L, D)
    timed(jax.jit(lambda x: jnp.flip(x, axis=1).sum()), xl,
          label="flip L (4,19200,192)")

    def fused_lanes(x):
        xn = x.reshape(B, L, D)
        xt = jnp.swapaxes(x, 1, 2).reshape(B, L, D)
        out = jnp.concatenate(
            [xn, xt, jnp.flip(xn, 1), jnp.flip(xt, 1)], axis=-1
        )
        return out.sum()

    timed(jax.jit(fused_lanes), x, label="cross_scan fused-lane build (B,L,4D)")

    # natural-layout single projection matmul for all K
    K, R, N = 4, 12, 16
    wn = jax.random.normal(key, (D, K * (R + 2 * N)), jnp.float32)
    timed(jax.jit(lambda x, w: (x.reshape(-1, D) @ w).sum()), xl, wn,
          label="natural proj matmul (BL,192)@(192,176)")

    # per-direction batched einsum (current)
    xs = jax.random.normal(key, (B, K, L, D), jnp.float32)
    wk = jax.random.normal(key, (K, D, R + 2 * N), jnp.float32)
    timed(jax.jit(lambda xs, w: jnp.einsum("bkld,kdc->bklc", xs, w).sum()),
          xs, wk, label="per-K batched einsum (current)")

    # MXU rate: fp32 vs bf16
    a = jax.random.normal(key, (8192, 2048), jnp.float32)
    b = jax.random.normal(key, (2048, 2048), jnp.float32)
    t32 = timed(jax.jit(lambda a, b: (a @ b).sum()), a, b,
                label="matmul 8192x2048x2048 fp32")
    ab, bb = a.astype(jnp.bfloat16), b.astype(jnp.bfloat16)
    t16 = timed(jax.jit(lambda a, b: (a @ b).astype(jnp.float32).sum()),
                ab, bb, label="matmul 8192x2048x2048 bf16")
    fl = 2 * 8192 * 2048 * 2048
    print(f"fp32 {fl / t32 / 1e12:.1f} TFLOP/s   bf16 {fl / t16 / 1e12:.1f} TFLOP/s")

    # depthwise conv 3x3 at stage-1
    import flax.linen as nn

    class DW(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(D, (3, 3), feature_group_count=D, padding="SAME")(x)

    dw = DW()
    v = jax.jit(dw.init)(key, x)
    timed(jax.jit(lambda v, x: dw.apply(v, x).sum()), v, x,
          label="depthwise conv3x3 (4,120,160,192) fp32")

    # LayerNorm at stage-1
    ln = nn.LayerNorm()
    vl = jax.jit(ln.init)(key, x)
    timed(jax.jit(lambda v, x: ln.apply(v, x).sum()), vl, x,
          label="LayerNorm (4,120,160,192)")


if __name__ == "__main__":
    main()
