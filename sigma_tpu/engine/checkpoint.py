"""Checkpoint save/restore with the reference's retention policy.

Reference: `/root/reference/engine/engine.py:89-156` (save `{model,
optimizer, epoch, iteration}`, `epoch-last` link, restore resumes at
epoch+1) and `train.py:233-244` (keep only the best-mIoU epoch by deleting
the losers). Storage is orbax (async-capable, multi-host safe) instead of
torch.save.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from sigma_tpu.engine.logger import get_logger


def _ckpt_path(ckpt_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(ckpt_dir), f"epoch-{epoch}")


def save_checkpoint(ckpt_dir: str, state, epoch: int) -> str:
    """Write {state, epoch} under ckpt_dir/epoch-N and update epoch-last."""
    logger = get_logger()
    t0 = time.time()
    os.makedirs(ckpt_dir, exist_ok=True)
    path = _ckpt_path(ckpt_dir, epoch)
    ckptr = ocp.StandardCheckpointer()
    # multi-host: every process calls save (orbax coordinates); only the
    # lead process clears a stale dir, with a barrier so nobody starts
    # writing into a directory that is mid-removal
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        if jax.process_index() == 0 and os.path.exists(path):
            shutil.rmtree(path)
        multihost_utils.sync_global_devices(f"ckpt-clear-{epoch}")
    elif os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        with open(os.path.join(ckpt_dir, "epoch-last"), "w") as f:
            f.write(str(epoch))
    logger.info(
        "saved checkpoint %s (%.2fs)", path, time.time() - t0
    )
    return path


def restore_checkpoint(ckpt_dir: str, state_template=None,
                       epoch: Optional[int] = None):
    """Restore (state, epoch). `epoch=None` reads the epoch-last pointer.

    With `state_template=None` the raw saved pytree (nested dicts) is
    returned — useful for eval-only restores that don't rebuild the
    optimizer state.
    """
    if epoch is None:
        with open(os.path.join(ckpt_dir, "epoch-last")) as f:
            epoch = int(f.read().strip())
    path = _ckpt_path(ckpt_dir, epoch)
    ckptr = ocp.StandardCheckpointer()
    if state_template is None:
        state = ckptr.restore(path)
    else:
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, state_template
        )
        state = ckptr.restore(path, abstract)
    return state, epoch


def prune_checkpoints(ckpt_dir: str, keep_epoch: int):
    """Best-only retention: delete every epoch-N except `keep_epoch`
    (train.py:233-244)."""
    logger = get_logger()
    if not os.path.isdir(ckpt_dir):
        return
    for name in os.listdir(ckpt_dir):
        if not name.startswith("epoch-") or name == "epoch-last":
            continue
        try:
            n = int(name.split("-", 1)[1])
        except ValueError:
            continue
        if n != keep_epoch:
            shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)
            logger.info("pruned checkpoint epoch-%d (best=%d)", n, keep_epoch)
