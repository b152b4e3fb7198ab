"""Checkpoint save/restore with the reference's retention policy.

Reference: `/root/reference/engine/engine.py:89-156` (save `{model,
optimizer, epoch, iteration}`, `epoch-last` link, restore resumes at
epoch+1) and `train.py:233-244` (keep only the best-mIoU epoch by deleting
the losers). Storage is orbax (async-capable, multi-host safe) instead of
torch.save.
"""

from __future__ import annotations

import json
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


def _pointer_epoch(ckpt_dir: str) -> Optional[int]:
    try:
        with open(os.path.join(ckpt_dir, "epoch-last")) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def _epoch_dirs(ckpt_dir: str):
    """Epoch numbers of all complete epoch-N checkpoint directories.

    Orbax commits a checkpoint by atomically renaming its tmp directory
    into place, so presence of epoch-N implies a complete write."""
    out = []
    if not os.path.isdir(ckpt_dir):
        return out
    for name in os.listdir(ckpt_dir):
        if not name.startswith("epoch-") or name == "epoch-last":
            continue
        try:
            out.append(int(name.split("-", 1)[1]))
        except ValueError:
            continue
    return sorted(out)


def restore_checkpoint(ckpt_dir: str, state_template=None,
                       epoch: Optional[int] = None):
    """Restore (state, epoch). `epoch=None` reads the epoch-last pointer.

    If the pointer is missing or dangling (e.g. the process was killed
    after orbax committed an async save but before the pointer was
    published, or the pointed-to epoch was pruned), fall back to the
    newest complete epoch-N directory.

    With `state_template=None` the raw saved pytree (nested dicts) is
    returned — useful for eval-only restores that don't rebuild the
    optimizer state.
    """
    if epoch is None:
        epoch = _pointer_epoch(ckpt_dir)
        if epoch is None or not os.path.isdir(_ckpt_path(ckpt_dir, epoch)):
            complete = _epoch_dirs(ckpt_dir)
            if not complete:
                raise FileNotFoundError(
                    f"no checkpoint found under {ckpt_dir!r} "
                    "(no epoch-last pointer and no epoch-N directories)"
                )
            epoch = complete[-1]
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


def save_val_scores(ckpt_dir: str, scores):
    """Persist the (mIoU, epoch) validation history next to the
    checkpoints so best-k retention survives `--resume` (without it, a
    fresh process would prune previously retained best-k checkpoints on
    its first post-resume validation). Lead process only."""
    if jax.process_index() != 0:
        return
    os.makedirs(ckpt_dir, exist_ok=True)
    tmp = os.path.join(ckpt_dir, "val_scores.json.tmp")
    with open(tmp, "w") as f:
        json.dump([[float(m), int(e)] for m, e in scores], f)
    os.replace(tmp, os.path.join(ckpt_dir, "val_scores.json"))


def load_val_scores(ckpt_dir: str):
    """Load the persisted (mIoU, epoch) history; [] when absent."""
    try:
        with open(os.path.join(ckpt_dir, "val_scores.json")) as f:
            return [(float(m), int(e)) for m, e in json.load(f)]
    except (OSError, ValueError):
        return []


def prune_checkpoints(ckpt_dir: str, keep_epochs):
    """Best-k retention: delete every epoch-N not in `keep_epochs` (an int
    for the reference's best-only policy, train.py:233-244, or an iterable
    of epochs for best-k). Never touches an in-flight async save, nor the
    epoch the epoch-last pointer currently targets — with async saves the
    pointer lags one save behind (published at the next finalize), so its
    target must stay restorable until the pointer advances."""
    logger = get_logger()
    if not os.path.isdir(ckpt_dir):
        return
    if isinstance(keep_epochs, int):
        keep_epochs = (keep_epochs,)
    keep = set(keep_epochs)
    if _ASYNC["pending"] is not None:
        keep.add(_ASYNC["pending"][2])
    pointed = _pointer_epoch(ckpt_dir)
    if pointed is not None:
        keep.add(pointed)
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
