"""Optimizer construction with reference-parity parameter grouping.

The reference groups params via `group_weight` (`/root/reference/utils/
init_func.py:33-58`): weight decay applies to Linear/Conv kernels only;
biases and norm parameters get no decay. Raw SSM tensors (x_proj_weight,
dt_projs_weight/bias, A_logs, Ds, decoder scale1/scale2) are never yielded
by `.modules()` and therefore land in NEITHER group — the reference trainer
never steps them (SURVEY.md §7(d)). We train everything by default and
expose `freeze_ssm_tensors=True` for strict reference parity.
"""

from __future__ import annotations

from typing import Any

import jax
import optax

# param-path name fragments identifying the raw SSM tensors the reference
# trainer accidentally freezes
_SSM_TENSOR_NAMES = (
    "x_proj_weight",
    "dt_projs_weight",
    "dt_projs_bias",
    "A_logs",
    "Ds",
    "A_log_1",
    "A_log_2",
    "D_1",
    "D_2",
    "x_proj_1",
    "x_proj_2",
    "dt_proj_1_weight",
    "dt_proj_1_bias",
    "dt_proj_2_weight",
    "dt_proj_2_bias",
    "scale1",
    "scale2",
)

_NO_DECAY_NAMES = ("bias", "scale1", "scale2", "A_logs", "Ds", "A_log", "D_1", "D_2")


def _path_names(path) -> list[str]:
    return [getattr(k, "key", getattr(k, "name", str(k))) for k in path]


def decay_mask(params):
    """True where weight decay applies: >=2D kernels of dense/conv layers,
    excluding LayerNorm scales and SSM special tensors."""

    def fn(path, leaf):
        names = _path_names(path)
        last = names[-1]
        if leaf.ndim < 2:
            return False
        if last in ("kernel",) or last.endswith("weight") or last == "x_proj_weight":
            # norm params are 1-D so never reach here; embedding-style
            # kernels decay like the reference's Linear/Conv weights
            return True
        return False

    return jax.tree_util.tree_map_with_path(fn, params)


def frozen_ssm_mask(params):
    """True for tensors the reference trainer leaves unstepped."""

    def fn(path, leaf):
        del leaf
        names = _path_names(path)
        return any(
            n in _SSM_TENSOR_NAMES or n.rsplit("_", 1)[0] in _SSM_TENSOR_NAMES
            for n in names[-2:]
        )

    return jax.tree_util.tree_map_with_path(fn, params)


def build_optimizer(cfg, schedule, params) -> optax.GradientTransformation:
    """AdamW (default) or SGD+momentum, matching train.py:89-98."""
    mask = decay_mask(params)
    if cfg.optimizer == "AdamW":
        tx = optax.adamw(
            schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=cfg.weight_decay,
            mask=mask,
        )
    elif cfg.optimizer in ("SGDM", "SGD"):
        tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay, mask=mask),
            optax.sgd(schedule, momentum=cfg.momentum),
        )
    else:
        raise ValueError(f"unsupported optimizer {cfg.optimizer!r}")

    if getattr(cfg, "freeze_ssm_tensors", False):
        frozen = frozen_ssm_mask(params)
        tx = optax.chain(
            tx,
            optax.masked(optax.set_to_zero(), frozen),
        )
    return tx
