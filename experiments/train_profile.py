"""Profile one train step with xprof; print top HLO self-time ops.

Usage: python experiments/train_profile.py [outdir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sigma_tpu_xla")
)

import glob

import jax.numpy as jnp
import numpy as np
import optax

from configs import get_config
from sigma_tpu.engine.optim import build_optimizer
from sigma_tpu.engine.train import create_train_state, make_train_step
from sigma_tpu.models.builder import build_model
from sigma_tpu.utils.lr_schedule import warmup_poly_lr


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_trace"
    batch, h, w = 8, 480, 640
    cfg = get_config("mfnet")
    object.__setattr__(cfg, "batch_size", batch)
    object.__setattr__(cfg, "bf16", True)
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

    jstep = jax.jit(step)
    state, loss = jstep(state, batch_dev, rng)
    jax.block_until_ready(loss)

    jax.profiler.start_trace(out)
    for _ in range(3):
        state, loss = jstep(state, batch_dev, rng)
    jax.block_until_ready(loss)
    jax.profiler.stop_trace()

    pbs = glob.glob(os.path.join(out, "**", "*.xplane.pb"), recursive=True)
    from xprof.convert.raw_to_tool_data import xspace_to_tool_data

    data, _ = xspace_to_tool_data(pbs, "hlo_stats", {})
    d = json.loads(data) if isinstance(data, (str, bytes)) else data
    labels = [c.get("label", c.get("id")) for c in d["cols"]]
    idx = {l: i for i, l in enumerate(labels)}
    t_i = idx["Total self time (us)"]
    cat_i = idx["HLO op category"]
    op_i = idx["Framework op name"]
    bw_i = idx["Measured memory BW (GiB/s)"]
    bound_i = idx["Bound by"]
    src_i = idx["Source Info"]

    def val(row, i):
        return row["c"][i].get("v")

    body = sorted(d["rows"], key=lambda r: -float(val(r, t_i) or 0))
    total = sum(float(val(r, t_i) or 0) for r in body)
    print(f"total self time: {total/1e3/3:.2f} ms/step (3 steps)")
    agg = {}
    for r in body:
        c = val(r, cat_i)
        agg[c] = agg.get(c, 0.0) + float(val(r, t_i) or 0)
    for c, t in sorted(agg.items(), key=lambda kv: -kv[1]):
        print(f"{t/3/1e3:9.2f}ms  {t/total*100:5.1f}%  [cat] {c}")
    print("--- top 35 ops ---")
    import re
    for r in body[:35]:
        t = float(val(r, t_i) or 0)
        src = re.sub(r"<[^>]*>", "", str(val(r, src_i) or ""))
        print(f"{t/3/1e3:9.2f}ms {t/total*100:5.1f}% "
              f"bw={val(r, bw_i):7.1f} {val(r, bound_i):>4} "
              f"{str(val(r, cat_i))[:18]:18} "
              f"{str(val(r, op_i))[:70]:70} {src[:40]}")


if __name__ == "__main__":
    main()
