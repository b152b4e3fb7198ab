#!/usr/bin/env python
"""Training entry point.

TPU-native counterpart of the reference trainer (`/root/reference/
train.py:37-275`): config selection by dataset name, seeding, data-parallel
mesh (instead of DDP process groups), AdamW + warmup-poly LR, per-iteration
loss logging, epoch checkpoints with best-mIoU retention, and in-train
sliding-window validation.

Usage:
  python train.py -n mfnet [--dataset-path PATH] [--batch-size N]
                  [--epochs N] [--steps N] [-c] [--bf16] [--no-eval]

Multi-host: launch one process per host with JAX_COORDINATOR_ADDR etc. and
pass --distributed; devices attach automatically.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="sigma_tpu trainer")
    p.add_argument("-n", "--dataset", required=True,
                   help="mfnet | pst900 | nyu | sunrgbd")
    p.add_argument("--dataset-path", default=None)
    p.add_argument("-c", "--continue", dest="resume", action="store_true",
                   help="resume from the last checkpoint")
    p.add_argument("--backbone", default=None,
                   help="sigma_tiny | sigma_small | sigma_base")
    p.add_argument("--decoder", default=None)
    p.add_argument("--pretrained", default=None,
                   help="VMamba ImageNet checkpoint (.pth or converted .npz)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps", type=int, default=None,
                   help="cap total train steps (smoke tests)")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--no-eval", action="store_true")
    p.add_argument("--log-dir", default=None)
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler device trace of iters "
                        "20..30 of the first epoch into DIR "
                        "(view with tensorboard or xprof)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize()")
    p.add_argument("--num-workers", type=int, default=None)
    p.add_argument("--override", action="append", default=[],
                   metavar="KEY=VAL",
                   help="config field override, repeatable; VAL is parsed "
                        "as a python literal (smoke/simulation runs)")
    return p.parse_args(argv)


def _enable_compilation_cache():
    cache = os.environ.get(
        "SIGMA_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/sigma_tpu_xla"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None):
    args = parse_args(argv)
    # CPU-simulation runs (tests, smoke): this environment's TPU plugin
    # ignores the JAX_PLATFORMS env var, so honor an explicit request via
    # jax.config before first backend use
    force = os.environ.get("SIGMA_FORCE_PLATFORM")
    if force:
        try:
            jax.config.update("jax_platforms", force)
        except Exception:
            pass
    _enable_compilation_cache()
    if args.distributed:
        jax.distributed.initialize()

    from configs import get_config
    from sigma_tpu.data import RGBXDataset, TrainLoader, TrainPre, ValPre
    from sigma_tpu.engine import (
        build_optimizer,
        create_train_state,
        get_logger,
        make_train_step,
    )
    from sigma_tpu.engine.checkpoint import (
        finalize_checkpoints,
        load_val_scores,
        prune_checkpoints,
        restore_checkpoint,
        save_checkpoint,
        save_val_scores,
    )
    from sigma_tpu.engine.evaluator import SlidingEvaluator
    from sigma_tpu.models.builder import build_model
    from sigma_tpu.parallel import make_mesh, shard_batch
    from sigma_tpu.utils.lr_schedule import warmup_poly_lr

    overrides = {}
    if args.dataset_path:
        overrides["dataset_path"] = args.dataset_path
    cfg = get_config(args.dataset, **overrides)
    for field, val in [
        ("backbone", args.backbone),
        ("decoder", args.decoder),
        ("batch_size", args.batch_size),
        ("nepochs", args.epochs),
        ("lr", args.lr),
        ("pretrained_model", args.pretrained),
        ("log_dir", args.log_dir),
        ("num_workers", args.num_workers),
    ]:
        if val is not None:
            object.__setattr__(cfg, field, val)
    if args.bf16:
        object.__setattr__(cfg, "bf16", True)
    import ast
    for ov in args.override:
        k, v = ov.split("=", 1)
        try:
            v = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            pass  # keep as string
        object.__setattr__(cfg, k, v)
    if not cfg.checkpoint_dir:
        object.__setattr__(
            cfg, "checkpoint_dir", os.path.join(cfg.log_dir, "checkpoint")
        )

    logger = get_logger(cfg.log_dir,
                        os.path.join(cfg.log_dir, "train.log")
                        if cfg.log_dir else None)
    logger.info("devices: %s", jax.devices())
    mesh = make_mesh(cfg.mesh_shape)

    # --- data ---
    dataset = RGBXDataset(
        cfg.data_setting(), "train",
        TrainPre(cfg.norm_mean, cfg.norm_std, cfg,
                 device_norm=cfg.device_norm),
        file_length=cfg.batch_size * cfg.niters_per_epoch,
        seed=cfg.seed,
    )
    loader = TrainLoader(
        dataset,
        global_batch_size=cfg.batch_size,
        niters_per_epoch=cfg.niters_per_epoch,
        num_workers=cfg.num_workers,
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        seed=cfg.seed,
    )

    # --- model / optimizer ---
    model = build_model(cfg)
    total_iters = cfg.nepochs * cfg.niters_per_epoch
    schedule = warmup_poly_lr(
        cfg.lr, cfg.lr_power, total_iters,
        cfg.niters_per_epoch * cfg.warm_up_epoch,
    )
    rng = jax.random.PRNGKey(cfg.seed)
    sample = {
        "data": jnp.zeros(
            (max(1, cfg.batch_size // jax.process_count()),
             cfg.image_height, cfg.image_width, 3), jnp.float32),
        "modal_x": jnp.zeros(
            (max(1, cfg.batch_size // jax.process_count()),
             cfg.image_height, cfg.image_width, 3), jnp.float32),
    }
    # tx needs params for its masks; bootstrap with a dummy then rebuild
    import optax
    state = create_train_state(model, cfg, rng, sample, optax.identity())
    tx = build_optimizer(cfg, schedule, state.params)
    state = state.replace(opt_state=tx.init(state.params))

    if cfg.pretrained_model:
        from sigma_tpu.utils.convert import load_vmamba_into_params
        params = load_vmamba_into_params(state.params, cfg.pretrained_model)
        state = state.replace(params=params)
        logger.info("loaded pretrained backbone: %s", cfg.pretrained_model)

    start_epoch = 1
    if args.resume:
        state, last_epoch = restore_checkpoint(cfg.checkpoint_dir, state)
        start_epoch = last_epoch + 1
        logger.info("resumed from epoch %d", last_epoch)

    train_step = make_train_step(
        model, tx, mesh=mesh,
        norm_mean=cfg.norm_mean, norm_std=cfg.norm_std,
    )
    step_rng = jax.random.PRNGKey(cfg.seed + 1)

    tb = None
    if cfg.log_dir and jax.process_index() == 0:
        try:
            from tensorboardX import SummaryWriter
            tb = SummaryWriter(os.path.join(cfg.log_dir, "tb"))
        except Exception:
            pass

    evaluator = None
    val_dataset = None
    best_miou, best_epoch = -1.0, -1
    # (mIoU, epoch) history for best-k retention; reloaded on --resume so
    # pruning never discards pre-resume best checkpoints
    val_scores = (
        load_val_scores(cfg.checkpoint_dir)
        if args.resume and cfg.checkpoint_dir else []
    )
    for m, e in val_scores:
        if m > best_miou:
            best_miou, best_epoch = m, e
    if not args.no_eval:
        val_dataset = RGBXDataset(cfg.data_setting(), "val", ValPre())
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

    total_steps = 0
    trace_active = False
    for epoch in range(start_epoch, cfg.nepochs + 1):
        loader.set_epoch(epoch)
        t_epoch = time.time()
        losses = []  # device scalars; only synced at log points
        epoch_steps = 0
        t_win, steps_win = time.time(), 0
        for it, batch in enumerate(loader):
            if args.profile and epoch == start_epoch:
                if total_steps == 20:
                    jax.profiler.start_trace(args.profile)
                    trace_active = True
                elif total_steps == 30 and trace_active:
                    jax.block_until_ready(loss)
                    jax.profiler.stop_trace()
                    trace_active = False
                    logger.info("profiler trace written to %s", args.profile)
            batch = shard_batch(mesh, batch)
            state, loss = train_step(state, batch, step_rng)
            losses.append(loss)
            total_steps += 1
            epoch_steps += 1
            steps_win += 1
            if (it + 1) % 10 == 0 or it == 0:
                # sync point: one host readback per 10 iters so input
                # uploads overlap device compute in between
                lr_now = float(schedule(total_steps))
                loss_now = float(loss)  # sync
                dt_win = time.time() - t_win
                logger.info(
                    "epoch %d iter %d/%d loss %.4f lr %.3e "
                    "%.0f ms/step %.1f img/s",
                    epoch, it + 1, cfg.niters_per_epoch, loss_now, lr_now,
                    dt_win / steps_win * 1e3,
                    steps_win * cfg.batch_size / dt_win,
                )
                t_win, steps_win = time.time(), 0
            if args.steps and total_steps >= args.steps:
                break
        if trace_active:
            # run ended (or epoch ended) before the in-loop stop fired
            jax.block_until_ready(losses[-1])
            jax.profiler.stop_trace()
            trace_active = False
            logger.info("profiler trace written to %s", args.profile)
        epoch_loss = float(jnp.mean(jnp.stack(losses))) if losses else 0.0
        logger.info(
            "epoch %d done in %.1fs mean-loss %.4f",
            epoch, time.time() - t_epoch, epoch_loss,
        )
        if tb is not None:
            tb.add_scalar("train_loss", epoch_loss, epoch)

        should_ckpt = (
            epoch >= cfg.checkpoint_start_epoch
            and epoch % cfg.checkpoint_step == 0
        ) or epoch == cfg.nepochs or (args.steps and total_steps >= args.steps)
        # NOTE: checkpoint save and evaluator.run are collective — every
        # process must enter (orbax coordinates the multi-host write; the
        # evaluator self-shards the val set and all-gathers confusion
        # matrices). Only logging/pruning side effects are rank-0 gated.
        # Reference semantics: rank-0 in-train val, train.py:213-246.
        if should_ckpt and cfg.checkpoint_dir:
            save_checkpoint(
                cfg.checkpoint_dir, state, epoch,
                async_save=getattr(cfg, "async_checkpoint", False),
            )
            if evaluator is not None:
                eval_vars = {"params": state.params}
                if state.batch_stats is not None:
                    eval_vars["batch_stats"] = state.batch_stats
                miou, detail = evaluator.run(eval_vars, val_dataset)
                is_main = jax.process_index() == 0
                if is_main:
                    logger.info("epoch %d mIoU %.2f", epoch, miou)
                if cfg.log_dir and is_main:
                    # per-epoch val log + rolling pointer (reference
                    # evaluator.py:146-147 val_*.log / val_last.log)
                    from sigma_tpu.utils.visualize import print_iou

                    val_path = os.path.join(
                        cfg.log_dir, f"val_epoch_{epoch}.log"
                    )
                    with open(val_path, "w") as f:
                        f.write(f"epoch {epoch} mIoU {miou:.4f}\n")
                        for i, iou in enumerate(detail["iou"]):
                            f.write(f"class {i}: {iou * 100:.3f}\n")
                    last = os.path.join(cfg.log_dir, "val_last.log")
                    if os.path.islink(last) or os.path.exists(last):
                        os.remove(last)
                    os.symlink(os.path.abspath(val_path), last)
                if tb is not None:
                    tb.add_scalar("val_miou", miou, epoch)
                val_scores.append((miou, epoch))
                if miou > best_miou:
                    best_miou, best_epoch = miou, epoch
                save_val_scores(cfg.checkpoint_dir, val_scores)
                if is_main:
                    logger.info(
                        "best mIoU %.2f @ epoch %d", best_miou, best_epoch
                    )
                    # best-k retention (k=1 = the reference's best-only
                    # policy, train.py:233-244)
                    k = max(1, getattr(cfg, "keep_best_k", 1))
                    keep = [e for _, e in
                            sorted(val_scores, reverse=True)[:k]]
                    prune_checkpoints(cfg.checkpoint_dir, keep)
        if args.steps and total_steps >= args.steps:
            break

    finalize_checkpoints()  # drain any in-flight async save
    logger.info("training finished (%d steps)", total_steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
