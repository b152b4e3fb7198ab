#!/usr/bin/env python
"""Benchmark: Sigma throughput on one TPU chip at MFNet resolution.

Prints the headline JSON line EARLY and re-prints an enriched line after
every extra section (last JSON line on stdout = current best snapshot):
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Headline metric: sigma_tiny forward img/s at 480x640 (batch 8, bf16
matmul activations, scan fp32 — the deployment configuration). Extras
report train-step throughput (batch 8, device-norm uint8 path),
sigma_base forward + MFU, sliding-eval latency, fp32 forward, and a
batch-16 serving point.

Robustness (round-3 postmortem: the driver bench timed out with zero
output because the single JSON print sat after ~10 XLA compiles):
  * the headline is measured FIRST and printed immediately (flushed);
  * each extra section re-prints the full enriched JSON line;
  * a soft deadline (BENCH_DEADLINE_S, default 900s) skips remaining
    extras once the budget is spent — skipped sections are recorded;
  * a daemon heartbeat re-prints the latest snapshot every 60s so a
    hard kill mid-compile still leaves a fresh JSON line in the tail.

Baseline note: the reference publishes no speed numbers. The 38 img/s
bar is the BASELINE.md north-star (>=2x an ESTIMATED ~19 img/s A100
Sigma-T forward); see BASELINE.md "Throughput bar derivation" for the
assumptions behind that estimate and their uncertainty.

Timing method: the axon tunnel costs ~29 ms per dispatch+readback, so a
naive per-call loop under-reports. Forward measurements run the op n
times inside one jitted fori_loop with a data-dependent carry and
difference two loop lengths, cancelling the fixed dispatch cost.
"""

from __future__ import annotations

import json
import os
import threading
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_PER_S = 38.0  # 2x estimated A100 fwd fps for Sigma-T @ 480x640
V5E_PEAK_BF16 = 197e12
V5E_PEAK_FP32 = 49e12

_T0 = time.monotonic()
_DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", "900"))

_result: dict = {}
_result_lock = threading.Lock()


def _emit():
    with _result_lock:
        line = json.dumps(_result)
    print(line, flush=True)


def _remaining():
    return _DEADLINE_S - (time.monotonic() - _T0)


def _heartbeat():
    while True:
        time.sleep(60)
        if _result:
            _emit()


def _timed(fn):
    t0 = time.perf_counter()
    r = fn()
    float(jnp.asarray(r).ravel()[0])  # tunnel-safe sync
    return time.perf_counter() - t0


def _loop_time(loop_fn, n_lo=1, n_hi=5, reps=2):
    f_lo, f_hi = (lambda: loop_fn(n_lo)), (lambda: loop_fn(n_hi))
    _timed(f_lo)
    _timed(f_hi)
    t_lo = min(_timed(f_lo) for _ in range(reps))
    t_hi = min(_timed(f_hi) for _ in range(reps))
    return (t_hi - t_lo) / (n_hi - n_lo)


def _fwd_loop(model, variables, batch, h, w):
    """Returns loop_fn(n): n chained forward passes in ONE dispatch.

    The trip count is a RUNTIME argument (fori_loop lowers to a while
    loop), so a single compiled graph — one forward body, not an
    n_hi-times-unrolled one — serves every n. This matters on slow-compile
    hosts: the round-3 driver bench died compiling ~10 multi-unrolled
    graphs before printing anything.

    `variables` must be a jit ARGUMENT, not a closure capture — captured
    params are embedded as HLO constants, and sigma_base's ~700MB of them
    blows past the compile-request size limit (HTTP 413)."""

    def run(variables, n):
        key = jax.random.PRNGKey(0)
        rgb = jax.random.uniform(key, (batch, h, w, 3), jnp.float32)
        mx = jax.random.uniform(key, (batch, h, w, 3), jnp.float32)

        def body(_, carry):
            rgb_, s = carry
            logits = model.apply(variables, rgb_, mx)
            s2 = logits.astype(jnp.float32).mean()
            return rgb_ + s2 * 1e-20, s + s2

        _, s = jax.lax.fori_loop(0, n, body, (rgb, jnp.float32(0)))
        return s

    jitted = jax.jit(run)
    return lambda n: jitted(variables, jnp.int32(n))


def bench_fwd(backbone, batch, bf16, num_classes=9, h=480, w=640):
    from sigma_tpu.models.builder import EncoderDecoder

    model = EncoderDecoder(
        num_classes=num_classes, backbone=backbone,
        dtype=jnp.bfloat16 if bf16 else jnp.float32,
    )
    rgb = jnp.zeros((batch, h, w, 3), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), rgb, rgb)
    t = _loop_time(_fwd_loop(model, variables, batch, h, w))
    return batch / t, model, variables


def bench_train_step(batch=8, bf16=True, h=480, w=640, backbone=None):
    """One full train step (fwd+bwd+adamw) on the device-norm uint8 path."""
    import numpy as np
    import optax

    from configs import get_config
    from sigma_tpu.engine.optim import build_optimizer
    from sigma_tpu.engine.train import create_train_state, make_train_step
    from sigma_tpu.models.builder import build_model
    from sigma_tpu.utils.lr_schedule import warmup_poly_lr

    cfg = get_config("mfnet")
    object.__setattr__(cfg, "batch_size", batch)
    object.__setattr__(cfg, "bf16", bf16)
    if backbone is not None:
        object.__setattr__(cfg, "backbone", backbone)
    model = build_model(cfg)
    sample = {
        "data": np.zeros((batch, h, w, 3), np.uint8),
        "modal_x": np.zeros((batch, h, w, 3), np.uint8),
        "label": np.zeros((batch, h, w), np.int32),
        "margins": np.zeros((batch, 4), np.int32),
    }
    schedule = warmup_poly_lr(cfg.lr, cfg.lr_power, 100, 10)
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0), sample, optax.identity()
    )
    tx = build_optimizer(cfg, schedule, state.params)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(
        model, tx, norm_mean=cfg.norm_mean, norm_std=cfg.norm_std
    )

    batch_dev = {k: jnp.asarray(v) for k, v in sample.items()}
    rng = jax.random.PRNGKey(1)

    # measure the DEPLOYMENT pattern: sequential donated step() calls with
    # one trailing sync. (A jitted fori_loop over the step under-reports by
    # ~30%: the ~600MB train state becomes a loop carry that XLA copies
    # every iteration; real training never does that.) Dispatches overlap
    # device work, so chaining amortizes the per-call tunnel latency.
    state, loss = step(state, batch_dev, rng)  # compile
    float(loss)
    state, loss = step(state, batch_dev, rng)  # warm
    float(loss)
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, loss = step(state, batch_dev, rng)
    float(loss)  # tunnel-safe sync
    t = (time.perf_counter() - t0) / n
    return batch / t


# ---------------------------------------------------------------- sections

def _sec_flops(ctx):
    """Forward MFU vs bf16 peak, from the ANALYTIC model-FLOPs count
    (matmuls/convs at 2MKN + the 9BLDN scan closed form — the convention
    the reference's fvcore tooling and the BASELINE bar derivation use;
    BASELINE.md "FLOPs accounting"). Shape-only jaxpr walk: no compile."""
    from sigma_tpu.utils.flops import analytic_flops_split

    model, variables = ctx["model"], ctx["variables"]

    def fwd(v, a, b):
        return model.apply(v, a, b).astype(jnp.float32).sum()

    rgb = jnp.zeros((8, 480, 640, 3), jnp.float32)
    mm, scans = analytic_flops_split(fwd, variables, rgb, rgb)
    fl_an = mm + scans
    return {
        "fwd_mfu_pct": round(
            fl_an * (ctx["fps_bf16"] / 8) / V5E_PEAK_BF16 * 100, 2
        ),
        "fwd_gflops_analytic_b8": round(fl_an / 1e9, 1),
        "fwd_gflops_mm_b8": round(mm / 1e9, 1),
        "fwd_gflops_scan_b8": round(scans / 1e9, 1),
    }


def _sec_flops_xla(ctx):
    """Every-HLO-op FLOPs per XLA's cost analysis (diagnostic; costs a
    full extra model compile, so it runs last)."""
    from sigma_tpu.utils.flops import xla_flops

    model, variables = ctx["model"], ctx["variables"]

    def fwd(v, a, b):
        return model.apply(v, a, b).astype(jnp.float32).sum()

    rgb = jnp.zeros((8, 480, 640, 3), jnp.float32)
    return {"fwd_gflops_xla_b8": round(xla_flops(fwd, variables, rgb, rgb) / 1e9, 1)}


def _sec_train_b8(ctx):
    return {"train_img_s_b8": round(bench_train_step(8, True), 2)}


def _sec_base_fwd(ctx):
    fps_base, base_model, base_vars = bench_fwd("sigma_base", 4, bf16=True)
    out = {"sigma_base_fwd_img_s": round(fps_base, 2)}
    try:
        from sigma_tpu.utils.flops import analytic_flops

        def bfwd(v, a, b):
            return base_model.apply(v, a, b).astype(jnp.float32).sum()

        rgb4 = jnp.zeros((4, 480, 640, 3), jnp.float32)
        bfl = analytic_flops(bfwd, base_vars, rgb4, rgb4)
        out["sigma_base_fwd_mfu_pct"] = round(
            bfl * (fps_base / 4) / V5E_PEAK_BF16 * 100, 2
        )
    except Exception as e:  # pragma: no cover
        out["sigma_base_mfu_err"] = type(e).__name__
    return out


def _sec_eval(ctx):
    """NYU-protocol sliding eval of one 480x640 image: 3 scales x flip
    x window grid, exp-score accumulation (reference evaluator.py:433-522)."""
    import numpy as np

    from sigma_tpu.engine.evaluator import SlidingEvaluator

    ev = SlidingEvaluator(
        ctx["model"], 9, (0.485, 0.456, 0.406), (0.229, 0.224, 0.225),
        multi_scales=(0.75, 1.0, 1.25), is_flip=True,
        eval_crop_size=(480, 640), stride_rate=2 / 3,
    )
    img = np.random.randint(0, 255, (480, 640, 3), np.uint8)
    ev.sliding_eval(ctx["variables"], img, img)  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        ev.sliding_eval(ctx["variables"], img, img)
    return {"eval_s_per_img": round((time.perf_counter() - t0) / 3, 3)}


def _sec_fwd_fp32(ctx):
    fps_fp32, _, _ = bench_fwd("sigma_tiny", 8, bf16=False)
    return {"fwd_fp32_img_s": round(fps_fp32, 2)}


def _sec_fwd_b16(ctx):
    fps_b16, _, _ = bench_fwd("sigma_tiny", 16, bf16=True)
    return {"fwd_img_s_b16": round(fps_b16, 2)}


def _sec_base_train(ctx):
    return {
        "sigma_base_train_img_s_b4": round(
            bench_train_step(4, True, backbone="sigma_base"), 2
        )
    }


def _sec_train_b16(ctx):
    """Large-batch training point (measured ~on par with b8: the step is
    device-bound, so there is no fixed-cost amortization to collect)."""
    return {"train_img_s_b16": round(bench_train_step(16, True), 2)}


def _sec_latency_b1(ctx):
    """Single-image serving latency (the reference's robotics use case):
    one fwd at batch 1, dispatch overhead excluded by the loop-difference
    method like the headline."""
    fps1, _, _ = bench_fwd("sigma_tiny", 1, bf16=True)
    return {"fwd_latency_b1_ms": round(1000.0 / fps1, 1)}


def main():
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

    threading.Thread(target=_heartbeat, daemon=True).start()

    # headline FIRST: sigma_tiny fwd, batch 8, bf16 matmuls (scan fp32)
    fps_bf16, model, variables = bench_fwd("sigma_tiny", 8, bf16=True)
    with _result_lock:
        _result.update(
            metric="sigma_tiny_fwd_480x640_bf16",
            value=round(fps_bf16, 3),
            unit="img/s",
            vs_baseline=round(fps_bf16 / BASELINE_IMG_PER_S, 3),
            headline_wall_s=round(time.monotonic() - _T0, 1),
        )
    _emit()

    ctx = {"fps_bf16": fps_bf16, "model": model, "variables": variables}

    # (name, fn, cold-compile-inclusive cost estimate in seconds) — ordered
    # by importance; a section only starts if the budget still covers its
    # estimate.  BENCH_<NAME>=0 skips a section explicitly.
    # estimates = measured cold section wall (sec_times, 2026-08-20 run:
    # flops 9 / train 283 / base_fwd 138 / eval 152 / fp32 82 / b16 79 /
    # base_train 382 / flops_xla 55) + ~20% margin
    sections = [
        ("flops", _sec_flops, 20),
        ("train_b8", _sec_train_b8, 340),
        ("base_fwd", _sec_base_fwd, 170),
        ("eval", _sec_eval, 190),
        ("fwd_fp32", _sec_fwd_fp32, 210),
        ("fwd_b16", _sec_fwd_b16, 100),
        ("base_train", _sec_base_train, 430),
        ("train_b16", _sec_train_b16, 320),
        ("latency_b1", _sec_latency_b1, 110),
        ("flops_xla", _sec_flops_xla, 80),
    ]
    skipped = []
    sec_times = {}
    for name, fn, est in sections:
        if os.environ.get(f"BENCH_{name.upper()}", "1") == "0":
            skipped.append(name + ":env")
            continue
        if _remaining() < est:
            skipped.append(name + ":deadline")
            continue
        t_sec = time.monotonic()
        try:
            out = fn(ctx)
        except Exception as e:  # pragma: no cover
            out = {f"{name}_err": type(e).__name__}
        sec_times[name] = round(time.monotonic() - t_sec, 1)
        with _result_lock:
            _result.update(out)
            _result["sec_times"] = sec_times
            if skipped:
                _result["skipped"] = ",".join(skipped)
        _emit()
    with _result_lock:
        if skipped:
            _result["skipped"] = ",".join(skipped)
        _result["bench_wall_s"] = round(time.monotonic() - _T0, 1)
    _emit()


if __name__ == "__main__":
    main()
