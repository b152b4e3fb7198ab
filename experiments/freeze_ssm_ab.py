"""A/B the `freeze_ssm_tensors` divergence on the overfit proxy.

The reference trainer accidentally never steps the raw SSM tensors
(SURVEY §7(d)); we train them by default. This runs the same 4-image
overfit recipe as tests/test_overfit.py through the real train.py main
with the flag off (our default) and on (strict reference parity) and
reports the final mIoU + the epoch-loss trajectory of each.

CPU-only (tests/conftest-style env), ~15 min per arm on the 1-core host.
"""
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/sigma_tpu_test_xla"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import tempfile

import numpy as np

import cv2


def make_dataset(root):
    os.makedirs(f"{root}/RGB")
    os.makedirs(f"{root}/Label")
    os.makedirs(f"{root}/Modal")
    rng = np.random.default_rng(42)
    names = [f"im{i}" for i in range(4)]
    for n in names:
        gh, gw = 4, 4
        grid = rng.integers(0, 2, (gh, gw, 3), dtype=np.uint8) * 255
        img = np.kron(grid, np.ones((8, 8, 1), dtype=np.uint8))
        label = ((img[:, :, 2] > 127) * 1 + (img[:, :, 1] > 127) * 2).astype(
            np.uint8
        )
        cv2.imwrite(f"{root}/RGB/{n}.png", img)
        cv2.imwrite(f"{root}/Label/{n}.png", label)
        cv2.imwrite(f"{root}/Modal/{n}.png", img[:, :, 0])
    with open(f"{root}/train2.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    with open(f"{root}/test.txt", "w") as f:
        f.write("\n".join(names) + "\n")


def run_arm(root, freeze, epochs=60):
    import importlib

    import train as train_mod

    importlib.reload(train_mod)
    log_dir = tempfile.mkdtemp(prefix=f"freeze_{freeze}_")
    rc = train_mod.main([
        "-n", "mfnet",
        "--dataset-path", root,
        "--backbone", "sigma_test",
        "--batch-size", "4",
        "--epochs", str(epochs),
        "--lr", "2e-3",
        "--log-dir", log_dir,
        "--override", "image_height=32",
        "--override", "image_width=32",
        "--override", "eval_crop_size=(32, 32)",
        "--override", "num_train_imgs=4",
        "--override", "num_workers=1",
        "--override", "checkpoint_start_epoch=9999",
        "--override", "eval_scale_array=(1.0,)",
        "--override", "warm_up_epoch=2",
        "--override", "train_scale_array=(0.75, 1.0, 1.25)",
        "--override", "mesh_shape=(1,)",
        "--override", f"freeze_ssm_tensors={freeze}",
    ])
    assert rc in (0, None), rc
    val = os.path.join(log_dir, f"val_epoch_{epochs}.log")
    miou = float(re.search(r"mIoU ([0-9.]+)", open(val).read()).group(1))
    # epoch losses from the train log lines
    losses = []
    for f in sorted(os.listdir(log_dir)):
        if f.startswith("train_") and f.endswith(".log"):
            for line in open(os.path.join(log_dir, f)):
                m = re.search(r"epoch (\d+).*loss ([0-9.]+)", line)
                if m:
                    losses.append((int(m.group(1)), float(m.group(2))))
    return miou, losses[-5:]


root = tempfile.mkdtemp(prefix="freeze_ab_data_")
make_dataset(root)
for freeze in (False, True):
    miou, tail = run_arm(root, freeze)
    print(f"freeze_ssm_tensors={freeze}: final mIoU {miou:.2f}  "
          f"last epoch losses {tail}", flush=True)
