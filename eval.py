#!/usr/bin/env python
"""Standalone evaluation entry point.

TPU counterpart of `/root/reference/eval.py`: build the network without a
criterion, construct the val dataset, run the sliding-window evaluator over
one or more checkpoints, optionally dumping raw + palette-colored PNGs.

Usage:
  python eval.py -n mfnet -e 100            # evaluate epoch 100
  python eval.py -n mfnet -e 80-100         # epoch range
  python eval.py -n mfnet -e last           # last checkpoint
  python eval.py -n mfnet -e ckpt.pth       # a torch/converted checkpoint
  python eval.py -n mfnet -e 100 -p out/    # also save predictions
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np


def parse_epochs(spec: str, ckpt_dir: str):
    """Resolve `-e` into a list of epoch ints or a single file path
    (reference evaluator.py:110-141 semantics)."""
    if spec.endswith((".pth", ".npz")):
        return [spec]
    if spec == "last":
        return [None]
    if "-" in spec:
        lo, _, hi = spec.partition("-")
        lo = int(lo)
        if hi:
            return list(range(lo, int(hi) + 1))
        # open range: everything >= lo that exists
        out = []
        if os.path.isdir(ckpt_dir):
            for name in os.listdir(ckpt_dir):
                if name.startswith("epoch-") and name != "epoch-last":
                    try:
                        n = int(name.split("-")[1])
                    except ValueError:
                        continue
                    if n >= lo:
                        out.append(n)
        return sorted(out)
    return [int(spec)]


def main(argv=None):
    p = argparse.ArgumentParser(description="sigma_tpu evaluator")
    p.add_argument("-n", "--dataset", required=True)
    p.add_argument("--dataset-path", default=None)
    p.add_argument("-e", "--epochs", default="last")
    p.add_argument("-p", "--save-path", default=None)
    p.add_argument("--backbone", default=None)
    p.add_argument("--decoder", default=None)
    p.add_argument("--log-dir", default=None)
    p.add_argument("--override", action="append", default=[],
                   metavar="KEY=VAL",
                   help="config field override, repeatable; VAL is parsed "
                        "as a python literal")
    args = p.parse_args(argv)

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

    from configs import get_config
    from sigma_tpu.data import RGBXDataset, ValPre
    from sigma_tpu.engine import get_logger
    from sigma_tpu.engine.checkpoint import restore_checkpoint
    from sigma_tpu.engine.evaluator import SlidingEvaluator
    from sigma_tpu.models.builder import build_model
    from sigma_tpu.utils.visualize import print_iou, save_prediction

    overrides = {}
    if args.dataset_path:
        overrides["dataset_path"] = args.dataset_path
    cfg = get_config(args.dataset, **overrides)
    for field, val in [
        ("backbone", args.backbone),
        ("decoder", args.decoder),
        ("log_dir", args.log_dir),
    ]:
        if val is not None:
            object.__setattr__(cfg, field, val)
    import ast
    for ov in args.override:
        k, v = ov.split("=", 1)
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass  # keep as string
        object.__setattr__(cfg, k, v)
    ckpt_dir = cfg.checkpoint_dir or os.path.join(cfg.log_dir, "checkpoint")

    logger = get_logger()
    model = build_model(cfg)
    dataset = RGBXDataset(cfg.data_setting(), "val", ValPre())
    evaluator = SlidingEvaluator(
        model,
        cfg.num_classes,
        cfg.norm_mean,
        cfg.norm_std,
        multi_scales=cfg.eval_scale_array,
        is_flip=cfg.eval_flip,
        eval_crop_size=cfg.eval_crop_size,
        stride_rate=cfg.eval_stride_rate,
    )

    # template params for orbax restore
    import jax.numpy as jnp

    import functools

    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, cfg.image_height, cfg.image_width, 3), jnp.float32)
    variables = jax.jit(functools.partial(model.init, return_aux=True))(
        rng, sample, sample
    )

    save_fn = None
    if args.save_path:
        colors = RGBXDataset.get_class_colors(max(41, cfg.num_classes))

        def save_fn(fn, pred):
            save_prediction(args.save_path, fn, pred, colors, cfg.background)

    results = {}
    for spec in parse_epochs(args.epochs, ckpt_dir):
        batch_stats = variables.get("batch_stats")
        if isinstance(spec, str):  # direct checkpoint file
            from sigma_tpu.utils.convert import load_checkpoint_into_params

            params = load_checkpoint_into_params(variables["params"], spec)
            label = spec
        else:
            state, epoch = restore_checkpoint(ckpt_dir, None, spec)
            params = state["params"]
            if state.get("batch_stats") is not None:
                batch_stats = state["batch_stats"]
            label = f"epoch-{epoch}"
        eval_vars = {"params": params}
        if batch_stats is not None:
            # BatchNorm decoders (MLPDecoder et al.) need the running
            # stats collection at eval time
            eval_vars["batch_stats"] = batch_stats
        miou, detail = evaluator.run(eval_vars, dataset)
        print_iou(
            detail["iou"],
            detail["mean_pixel_acc"],
            detail["pixel_acc"],
            list(cfg.class_names),
        )
        logger.info("%s: mIoU %.2f", label, miou)
        results[label] = miou
    return 0


if __name__ == "__main__":
    sys.exit(main())
