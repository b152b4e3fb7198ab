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


# async-save bookkeeping: one in-flight save at a time. The epoch-last
# pointer is only advanced once the async write is DURABLE (at the next
# save, an explicit finalize, or interpreter exit) — a crash mid-write can
# never leave the pointer referencing a half-written checkpoint.
_ASYNC = {"ckptr": None, "pending": None}


def _write_pointer(ckpt_dir: str, epoch: int):
    if jax.process_index() == 0:
        with open(os.path.join(ckpt_dir, "epoch-last"), "w") as f:
            f.write(str(epoch))


def finalize_checkpoints():
    """Block until any in-flight async save is durable, then publish its
    epoch-last pointer. No-op when nothing is pending."""
    if _ASYNC["pending"] is not None:
        ckpt_dir, path, epoch, t0 = _ASYNC["pending"]
        _ASYNC["ckptr"].wait_until_finished()
        _ASYNC["pending"] = None
        _write_pointer(ckpt_dir, epoch)
        get_logger().info(
            "async checkpoint %s durable (%.2fs since dispatch)",
            path, time.time() - t0,
        )


def save_checkpoint(ckpt_dir: str, state, epoch: int,
                    async_save: bool = False) -> str:
    """Write {state, epoch} under ckpt_dir/epoch-N and update epoch-last.

    `async_save=True` returns as soon as the device arrays are snapshotted
    to host memory; the filesystem write proceeds in background threads
    (orbax AsyncCheckpointer) and is awaited at the NEXT save /
    `finalize_checkpoints()`, overlapping checkpoint IO with training."""
    logger = get_logger()
    t0 = time.time()
    finalize_checkpoints()  # at most one in-flight async save
    os.makedirs(ckpt_dir, exist_ok=True)
    path = _ckpt_path(ckpt_dir, epoch)
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
    if async_save:
        if _ASYNC["ckptr"] is None:
            _ASYNC["ckptr"] = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler()
            )
            import atexit

            atexit.register(finalize_checkpoints)
        _ASYNC["ckptr"].save(path, args=ocp.args.StandardSave(state))
        _ASYNC["pending"] = (ckpt_dir, path, epoch, t0)
        logger.info(
            "dispatched async checkpoint %s (%.2fs blocking)",
            path, time.time() - t0,
        )
        return path
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    _write_pointer(ckpt_dir, epoch)
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


def prune_checkpoints(ckpt_dir: str, keep_epochs):
    """Best-k retention: delete every epoch-N not in `keep_epochs` (an int
    for the reference's best-only policy, train.py:233-244, or an iterable
    of epochs for best-k). Never touches an in-flight async save."""
    logger = get_logger()
    if not os.path.isdir(ckpt_dir):
        return
    if isinstance(keep_epochs, int):
        keep_epochs = (keep_epochs,)
    keep = set(keep_epochs)
    if _ASYNC["pending"] is not None:
        keep.add(_ASYNC["pending"][2])
    for name in os.listdir(ckpt_dir):
        if not name.startswith("epoch-") or name == "epoch-last":
            continue
        try:
            n = int(name.split("-", 1)[1])
        except ValueError:
            continue
        if n not in keep:
            shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)
            logger.info(
                "pruned checkpoint epoch-%d (kept %s)", n, sorted(keep)
            )
