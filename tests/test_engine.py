"""End-to-end engine tests: data pipeline, train step on an 8-device mesh,
checkpoint round-trip, sliding evaluator, LR schedule, optimizer masks."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from configs import get_config
from sigma_tpu.data import RGBXDataset, TrainLoader, TrainPre, ValPre
from sigma_tpu.engine.checkpoint import (
    prune_checkpoints,
    restore_checkpoint,
    save_checkpoint,
)
from sigma_tpu.engine.evaluator import SlidingEvaluator
from sigma_tpu.engine.optim import build_optimizer, decay_mask, frozen_ssm_mask
from sigma_tpu.engine.train import create_train_state, make_train_step
from sigma_tpu.models.builder import build_model
from sigma_tpu.parallel import make_mesh, shard_batch
from sigma_tpu.utils.lr_schedule import warmup_poly_lr
from sigma_tpu.utils.metrics import compute_score, hist_info

import cv2


@pytest.fixture(scope="module")
def synth_dataset(tmp_path_factory):
    """Tiny synthetic RGB-X dataset on disk (8 train / 2 val images)."""
    root = tmp_path_factory.mktemp("mfnet_synth")
    (root / "RGB").mkdir()
    (root / "Label").mkdir()
    (root / "Modal").mkdir()
    rng = np.random.default_rng(0)
    names = [f"img{i:02d}" for i in range(10)]
    for n in names:
        h, w = 40, 56
        cv2.imwrite(str(root / "RGB" / f"{n}.png"),
                    rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        label = rng.integers(0, 9, (h, w)).astype(np.uint8)
        label[0, 0] = 255  # ignore pixel
        cv2.imwrite(str(root / "Label" / f"{n}.png"), label)
        cv2.imwrite(str(root / "Modal" / f"{n}.png"),
                    rng.integers(0, 255, (h, w), dtype=np.uint8))
    (root / "train2.txt").write_text("\n".join(names[:8]) + "\n")
    (root / "test.txt").write_text("\n".join(names[8:]) + "\n")
    return str(root)


def _tiny_cfg(synth_root):
    cfg = get_config("mfnet", dataset_path=synth_root)
    object.__setattr__(cfg, "backbone", "sigma_test")
    object.__setattr__(cfg, "image_height", 32)
    object.__setattr__(cfg, "image_width", 32)
    object.__setattr__(cfg, "eval_crop_size", (32, 32))
    object.__setattr__(cfg, "batch_size", 8)
    object.__setattr__(cfg, "num_workers", 2)
    return cfg


def test_dataset_and_loader(synth_dataset):
    cfg = _tiny_cfg(synth_dataset)
    ds = RGBXDataset(
        cfg.data_setting(), "train",
        TrainPre(cfg.norm_mean, cfg.norm_std, cfg),
        file_length=cfg.batch_size * 2,
    )
    ds.set_epoch(0)
    item = ds[0]
    assert item["data"].shape == (32, 32, 3)
    assert item["modal_x"].shape == (32, 32, 3)
    assert item["label"].shape == (32, 32)
    assert item["label"].dtype == np.int32

    loader = TrainLoader(ds, global_batch_size=8, niters_per_epoch=2,
                         num_workers=2)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["data"].shape == (8, 32, 32, 3)
    # determinism: same epoch -> same batches
    loader2 = TrainLoader(ds, global_batch_size=8, niters_per_epoch=2,
                          num_workers=2)
    batches2 = list(loader2)
    np.testing.assert_array_equal(batches[0]["data"], batches2[0]["data"])


def test_loader_sharding(synth_dataset):
    cfg = _tiny_cfg(synth_dataset)
    ds = RGBXDataset(
        cfg.data_setting(), "train",
        TrainPre(cfg.norm_mean, cfg.norm_std, cfg),
        file_length=16,
    )
    full = list(TrainLoader(ds, 8, 1, num_workers=1))[0]
    half0 = list(TrainLoader(ds, 8, 1, num_workers=1, process_index=0,
                             process_count=2))[0]
    half1 = list(TrainLoader(ds, 8, 1, num_workers=1, process_index=1,
                             process_count=2))[0]
    np.testing.assert_array_equal(full["data"][:4], half0["data"])
    np.testing.assert_array_equal(full["data"][4:], half1["data"])


def test_train_step_on_mesh(synth_dataset):
    cfg = _tiny_cfg(synth_dataset)
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    mesh = make_mesh((8,))
    model = build_model(cfg)
    schedule = warmup_poly_lr(cfg.lr, cfg.lr_power, 100, 10)
    batch = {
        "data": np.random.rand(8, 32, 32, 3).astype(np.float32),
        "modal_x": np.random.rand(8, 32, 32, 3).astype(np.float32),
        "label": np.random.randint(0, 9, (8, 32, 32)).astype(np.int32),
    }
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, cfg, rng, batch, optax.identity())
    tx = build_optimizer(cfg, schedule, state.params)
    state = state.replace(opt_state=tx.init(state.params))
    step = make_train_step(model, tx, mesh=mesh)
    sharded = shard_batch(mesh, batch)
    losses = []
    for i in range(3):
        state, loss = step(state, sharded, jax.random.PRNGKey(1))
        losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    # overfitting a fixed batch must reduce loss
    for _ in range(7):
        state, loss = step(state, sharded, jax.random.PRNGKey(1))
    assert float(loss) < losses[0]


def test_checkpoint_roundtrip(tmp_path, synth_dataset):
    cfg = _tiny_cfg(synth_dataset)
    model = build_model(cfg)
    batch = {
        "data": np.zeros((1, 32, 32, 3), np.float32),
        "modal_x": np.zeros((1, 32, 32, 3), np.float32),
    }
    rng = jax.random.PRNGKey(0)
    tx = optax.adamw(1e-4)
    state = create_train_state(model, cfg, rng, batch, tx)
    ckdir = str(tmp_path / "ck")
    save_checkpoint(ckdir, state, epoch=7)
    restored, epoch = restore_checkpoint(ckdir, state)
    assert epoch == 7
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        state.params, restored.params,
    )
    # raw (template-free) restore for eval
    raw, epoch = restore_checkpoint(ckdir, None)
    assert epoch == 7 and "params" in raw
    # pruning keeps only the best epoch
    save_checkpoint(ckdir, state, epoch=8)
    prune_checkpoints(ckdir, keep_epochs=8)
    assert not os.path.exists(os.path.join(ckdir, "epoch-7"))
    assert os.path.exists(os.path.join(ckdir, "epoch-8"))


def test_checkpoint_async_and_best_k(tmp_path, synth_dataset):
    from sigma_tpu.engine.checkpoint import finalize_checkpoints

    cfg = _tiny_cfg(synth_dataset)
    model = build_model(cfg)
    batch = {
        "data": np.zeros((1, 32, 32, 3), np.float32),
        "modal_x": np.zeros((1, 32, 32, 3), np.float32),
    }
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0), batch, optax.adamw(1e-4)
    )
    ckdir = str(tmp_path / "ck")
    # async save: epoch-last is only published once the write is durable
    save_checkpoint(ckdir, state, epoch=1, async_save=True)
    save_checkpoint(ckdir, state, epoch=2, async_save=True)  # drains ep 1
    with open(os.path.join(ckdir, "epoch-last")) as f:
        assert int(f.read()) == 1
    finalize_checkpoints()
    with open(os.path.join(ckdir, "epoch-last")) as f:
        assert int(f.read()) == 2
    restored, epoch = restore_checkpoint(ckdir, state)
    assert epoch == 2
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        state.params, restored.params,
    )
    # best-k retention: keep the 2 best epochs of three
    save_checkpoint(ckdir, state, epoch=3)
    prune_checkpoints(ckdir, keep_epochs=[2, 3])
    assert not os.path.exists(os.path.join(ckdir, "epoch-1"))
    assert os.path.exists(os.path.join(ckdir, "epoch-2"))
    assert os.path.exists(os.path.join(ckdir, "epoch-3"))


def test_checkpoint_pointer_safety(tmp_path, synth_dataset):
    """Crash-safety invariants around the epoch-last pointer:

    a) pruning never deletes the pointer's current target (with async
       saves the pointer lags one save behind, so the newest-best policy
       would otherwise rmtree the only restorable checkpoint);
    b) restore falls back to the newest complete epoch-N dir when the
       pointer is missing (killed before publish) or dangling (pruned).
    """
    from sigma_tpu.engine.checkpoint import finalize_checkpoints

    cfg = _tiny_cfg(synth_dataset)
    model = build_model(cfg)
    batch = {
        "data": np.zeros((1, 32, 32, 3), np.float32),
        "modal_x": np.zeros((1, 32, 32, 3), np.float32),
    }
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0), batch, optax.adamw(1e-4)
    )
    ckdir = str(tmp_path / "ck")

    # (a) epoch-2 async save is pending, pointer still -> epoch-1.
    # best-k=1 says keep only epoch 2; epoch-1 (the pointer target) and
    # epoch-2 (pending) must BOTH survive so --resume works at any instant.
    save_checkpoint(ckdir, state, epoch=1, async_save=True)
    save_checkpoint(ckdir, state, epoch=2, async_save=True)
    with open(os.path.join(ckdir, "epoch-last")) as f:
        assert int(f.read()) == 1
    prune_checkpoints(ckdir, keep_epochs=[2])
    assert os.path.exists(os.path.join(ckdir, "epoch-1"))
    restored, epoch = restore_checkpoint(ckdir, state)  # mid-window resume
    assert epoch == 1
    finalize_checkpoints()
    # pointer advanced; now epoch-1 is prunable
    prune_checkpoints(ckdir, keep_epochs=[2])
    assert not os.path.exists(os.path.join(ckdir, "epoch-1"))
    assert os.path.exists(os.path.join(ckdir, "epoch-2"))

    # (b) missing pointer -> newest complete dir
    os.remove(os.path.join(ckdir, "epoch-last"))
    restored, epoch = restore_checkpoint(ckdir, state)
    assert epoch == 2
    # dangling pointer -> newest complete dir
    with open(os.path.join(ckdir, "epoch-last"), "w") as f:
        f.write("99")
    restored, epoch = restore_checkpoint(ckdir, state)
    assert epoch == 2


def test_val_scores_persistence(tmp_path):
    from sigma_tpu.engine.checkpoint import load_val_scores, save_val_scores

    ckdir = str(tmp_path / "ck")
    assert load_val_scores(ckdir) == []
    save_val_scores(ckdir, [(41.2, 5), (43.7, 10)])
    assert load_val_scores(ckdir) == [(41.2, 5), (43.7, 10)]


def test_evaluator_on_synth(synth_dataset):
    cfg = _tiny_cfg(synth_dataset)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, sample, sample)
    val_ds = RGBXDataset(cfg.data_setting(), "val", ValPre())
    ev = SlidingEvaluator(
        model, cfg.num_classes, cfg.norm_mean, cfg.norm_std,
        multi_scales=(0.75, 1.0), is_flip=True,
        eval_crop_size=(32, 32), stride_rate=2 / 3,
    )
    miou, detail = ev.run(variables, val_ds)
    assert 0.0 <= miou <= 100.0
    assert detail["iou"].shape == (9,)


def test_evaluator_multi_device_batch(synth_dataset):
    """Intra-process multi-device eval (reference evaluator.py:244-290
    used one worker process per GPU; here the image axis shards over the
    local mesh): the batched path must produce EXACTLY the single-device
    predictions and mIoU, including the padded tail group, and its model
    dispatches must actually span all mesh devices."""
    cfg = _tiny_cfg(synth_dataset)
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = jax.jit(model.init)(rng, sample, sample)
    # 3 same-shaped val images -> one full group of 2 + a padded tail
    val_ds = RGBXDataset(cfg.data_setting(), "val", ValPre())
    items = [val_ds[i % len(val_ds)] for i in range(3)]

    class _DS:
        def __len__(self):
            return len(items)

        def __getitem__(self, i):
            return items[i]

    kwargs = dict(
        multi_scales=(0.75, 1.0), is_flip=True,
        eval_crop_size=(32, 32), stride_rate=2 / 3,
    )
    ev1 = SlidingEvaluator(
        model, cfg.num_classes, cfg.norm_mean, cfg.norm_std, **kwargs
    )
    miou1, det1 = ev1.run(variables, _DS())

    ndev = jax.device_count()
    mesh = make_mesh((ndev,))
    evn = SlidingEvaluator(
        model, cfg.num_classes, cfg.norm_mean, cfg.norm_std,
        mesh=mesh, **kwargs
    )
    assert evn.image_batch == ndev
    # 3 items -> ONE padded group of ndev: exercises tail-pad semantics
    miou_n, det_n = evn.run(variables, _DS())
    np.testing.assert_allclose(miou_n, miou1, atol=1e-6)
    np.testing.assert_allclose(det_n["iou"], det1["iou"], atol=1e-6)

    # per-image prediction equality at a full device batch
    group = [items[i % len(items)] for i in range(ndev)]
    preds1 = np.stack([
        ev1.sliding_eval(variables, it["data"], it["modal_x"])
        for it in group
    ])
    predsn = evn.sliding_eval_batch(
        variables,
        [it["data"] for it in group],
        [it["modal_x"] for it in group],
    )
    np.testing.assert_array_equal(predsn, preds1)

    # the batched graphs really shard the image axis over the mesh
    img = jnp.asarray(np.stack([it["data"] for it in group]))
    mx = jnp.asarray(np.stack([it["modal_x"] for it in group]))
    h0, w0 = items[0]["data"].shape[:2]
    pad_hw, margin, spans, window_hw, wmargin = evn._scale_geometry(h0, w0)
    bucket = 1 if len(spans) == 1 else evn.window_batch
    win_hw = (spans[0][1] - spans[0][0], spans[0][3] - spans[0][2])
    extract = evn._extract(
        (h0, w0, 3), 3, pad_hw, margin, win_hw, wmargin, bucket, n=ndev
    )
    starts = np.asarray([(sy, sx) for sy, _, sx, _ in spans], np.int32)
    starts = starts[:bucket]
    if len(starts) < bucket:
        starts = np.concatenate(
            [starts, np.repeat(starts[-1:], bucket - len(starts), axis=0)]
        )
    cr, _cx = extract(img, mx, jnp.asarray(starts))
    sharding = cr.sharding
    assert len(sharding.device_set) == ndev, sharding


def test_warmup_poly_schedule():
    sched = warmup_poly_lr(6e-5, 0.9, total_iters=1000, warmup_steps=100)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(50)), 3e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(100)), 6e-5 * 0.9**0.9, rtol=1e-5)
    np.testing.assert_allclose(
        float(sched(999)), 6e-5 * 0.001**0.9, rtol=1e-4
    )


def test_optimizer_masks(synth_dataset):
    cfg = _tiny_cfg(synth_dataset)
    model = build_model(cfg)
    batch = {
        "data": np.zeros((1, 32, 32, 3), np.float32),
        "modal_x": np.zeros((1, 32, 32, 3), np.float32),
    }
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), batch["data"],
                                    batch["modal_x"])
    params = variables["params"]
    dm = decay_mask(params)
    fm = frozen_ssm_mask(params)
    flat_dm = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(dm)[0]
    }
    flat_fm = {
        jax.tree_util.keystr(p): v
        for p, v in jax.tree_util.tree_flatten_with_path(fm)[0]
    }
    # kernels decay, biases/norm scales don't
    assert any(v for k, v in flat_dm.items() if "kernel" in k)
    assert not any(v for k, v in flat_dm.items() if k.endswith("bias"))
    # A_logs / Ds / dt biases never decay
    assert not any(v for k, v in flat_dm.items() if "A_logs" in k or "'Ds'" in k)
    # frozen mask hits the SSM tensors and nothing else structural
    assert any(v for k, v in flat_fm.items() if "A_logs" in k)
    assert any(v for k, v in flat_fm.items() if "x_proj_weight" in k)
    assert not any(v for k, v in flat_fm.items() if "in_proj" in k)


def test_metrics_reference_semantics():
    pred = np.array([[0, 1], [2, 1]])
    gt = np.array([[0, 1], [255, 2]])
    hist, labeled, correct = hist_info(3, pred, gt)
    assert labeled == 3 and correct == 2
    assert hist[2, 1] == 1  # gt=2 predicted as 1
    iou, miou, *_ = compute_score(hist, correct, labeled)
    assert iou[0] == 1.0 and iou[1] == 0.5 and iou[2] == 0.0


def test_multi_stage_lr():
    from sigma_tpu.utils.lr_schedule import multi_stage_lr

    sched = multi_stage_lr([(100, 1e-3), (200, 1e-4), (300, 1e-5)])
    np.testing.assert_allclose(float(sched(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(150)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(sched(250)), 1e-5, rtol=1e-6)
    np.testing.assert_allclose(float(sched(999)), 1e-5, rtol=1e-6)
