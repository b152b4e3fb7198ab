#!/usr/bin/env python
"""Benchmark: sigma_tiny inference throughput at MFNet resolution.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline note (BASELINE.md): the reference publishes no speed numbers.
The north-star is >=2x A100 frames/sec per v5e chip at 640x480 RGB-X.
A100 fwd throughput for Sigma-T is ~19 img/s (estimated from the paper's
FLOPs/latency figure class); we report vs_baseline against 2x that
(38 img/s) so vs_baseline >= 1.0 means the target is met.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_S = 38.0  # 2x estimated A100 fwd fps for Sigma-T @ 480x640


def main():
    import os

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "SIGMA_TPU_COMPILE_CACHE",
                os.path.expanduser("~/.cache/sigma_tpu_xla"),
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from sigma_tpu.models.builder import EncoderDecoder

    batch = 2
    model = EncoderDecoder(num_classes=9, backbone="sigma_tiny")
    rgb = jnp.zeros((batch, 480, 640, 3), jnp.float32)
    mx = jnp.zeros((batch, 480, 640, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), rgb, mx)

    fwd = jax.jit(lambda v, a, b: model.apply(v, a, b).sum())
    # warmup/compile; NB block_until_ready is unreliable under the axon
    # tunnel, so synchronize via scalar readback
    float(fwd(variables, rgb, mx))

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = float(fwd(variables, rgb, mx))
    dt = time.perf_counter() - t0
    img_per_s = batch * iters / dt

    print(
        json.dumps(
            {
                "metric": "sigma_tiny_fwd_480x640",
                "value": round(img_per_s, 3),
                "unit": "img/s",
                "vs_baseline": round(img_per_s / BASELINE_IMG_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
