"""Layout/compute micro-benchmarks with tunnel latency cancelled."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sigma_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from experiments.timing import chain_loop, op_time


def main():
    key = jax.random.PRNGKey(0)
    B, H, W, D = 4, 120, 160, 192
    L = H * W
    x = jax.random.normal(key, (B, H, W, D), jnp.float32)
    xl = x.reshape(B, L, D)

    op_time(lambda n: chain_loop(lambda v: jnp.swapaxes(v, 1, 2), x, n),
            label="transpose HWC->WHC (4,120,160,192)")
    op_time(lambda n: chain_loop(lambda v: jnp.flip(v, 1), xl, n),
            label="flip L (4,19200,192)")

    def fused_build(v):
        xn = v.reshape(B, L, D)
        xt = jnp.swapaxes(v, 1, 2).reshape(B, L, D)
        return jnp.concatenate(
            [xn, xt, jnp.flip(xn, 1), jnp.flip(xt, 1)], axis=-1
        )

    op_time(lambda n: chain_loop(fused_build, x, n),
            label="cross_scan fused-lane build (B,L,4D)")

    K, R, N = 4, 12, 16
    wn = jax.random.normal(key, (D, K * (R + 2 * N)), jnp.float32)
    op_time(lambda n: chain_loop(lambda v: (v.reshape(-1, D) @ wn)
                                 .reshape(B, L, -1)[..., :D], xl, n),
            label="natural proj matmul (BL,192)@(192,176)")

    xs = jax.random.normal(key, (B, K, L, D), jnp.float32)
    wk = jax.random.normal(key, (K, D, R + 2 * N), jnp.float32)
    op_time(lambda n: chain_loop(
        lambda v: jnp.einsum("bkld,kdc->bklc", v, wk)[..., :D], xs, n),
        label="per-K batched einsum (current)")

    a = jax.random.normal(key, (8192, 2048), jnp.float32)
    b = jax.random.normal(key, (2048, 2048), jnp.float32)
    t32 = op_time(lambda n: chain_loop(lambda v: v @ b, a, n),
                  label="matmul 8192x2048x2048 fp32")
    bb = b.astype(jnp.bfloat16)
    t16 = op_time(lambda n: chain_loop(lambda v: v @ bb,
                                       a.astype(jnp.bfloat16), n),
                  label="matmul 8192x2048x2048 bf16")
    fl = 2 * 8192 * 2048 * 2048
    print(f"  -> fp32 {fl/t32/1e12:.1f} TFLOP/s   bf16 {fl/t16/1e12:.1f} TFLOP/s")

    import flax.linen as nn

    class DW(nn.Module):
        @nn.compact
        def __call__(self, v):
            return nn.Conv(D, (3, 3), feature_group_count=D,
                           padding="SAME")(v)

    dw = DW()
    vdw = jax.jit(dw.init)(key, x)
    op_time(lambda n: chain_loop(lambda v: dw.apply(vdw, v), x, n),
            label="depthwise conv3x3 (4,120,160,192) fp32")

    ln = nn.LayerNorm()
    vln = jax.jit(ln.init)(key, x)
    op_time(lambda n: chain_loop(lambda v: ln.apply(vln, v), x, n),
            label="LayerNorm (4,120,160,192)")

    # current scan kernel at stage-1 (single call)
    from sigma_tpu.ops import selective_scan_cl
    bg, dg = 16, 192
    u = jax.random.normal(key, (bg, L, dg), jnp.float32)
    dlt = jax.random.normal(key, (bg, L, dg), jnp.float32) * 0.01
    A = -jnp.exp(jax.random.normal(key, (4, N, dg)))
    Bm = jax.random.normal(key, (bg, L, N))
    Cm = jax.random.normal(key, (bg, L, N))

    op_time(lambda n: chain_loop(
        lambda v: selective_scan_cl(v, dlt, A, Bm, Cm, delta_softplus=True),
        u, n), n_lo=1, n_hi=4,
        label="current scan kernel bg=16 L=19200 dg=192")


if __name__ == "__main__":
    main()
