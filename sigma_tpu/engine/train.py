"""Train state and jitted SPMD train step.

TPU-native analogue of the reference train loop's inner iteration
(`/root/reference/train.py:151-178`): one jitted function computes the loss
(CE, ignore 255), backprops, and applies the optimizer. Under a data mesh
the batch is sharded on its leading axis and parameters are replicated, so
XLA inserts the cross-chip gradient all-reduce that DDP's hooks performed in
the reference (train.py:103-108, engine/engine.py:49-61).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sigma_tpu.models.builder import segmentation_loss


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any
    batch_stats: Any = None  # only for BatchNorm decoders (MLPDecoder)


def create_train_state(model, cfg, rng, sample_batch, tx) -> TrainState:
    variables = jax.jit(
        functools.partial(model.init, return_aux=True)
    )(rng, sample_batch["data"], sample_batch["modal_x"])
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        batch_stats=variables.get("batch_stats"),
    )


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    norm_mean=None,
    norm_std=None,
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, loss).

    batch: {"data": (B,H,W,3), "modal_x": (B,H,W,3), "label": (B,H,W)}.
    When the images arrive as uint8 (device-norm input path, 4x less
    host->device traffic), normalization and the zero-pad margins (key
    "margins", (B,4) = top/bottom/left/right) are applied on device —
    semantically identical to the host float pipeline
    (dataloader.py:37-45 of the reference).
    """
    mean = jnp.asarray(
        norm_mean if norm_mean is not None else (0.485, 0.456, 0.406),
        jnp.float32,
    )
    std = jnp.asarray(
        norm_std if norm_std is not None else (0.229, 0.224, 0.225),
        jnp.float32,
    )

    def _prep(batch):
        data = batch["data"]
        if data.dtype != jnp.uint8:
            return data, batch["modal_x"], batch["label"]

        def norm(img):
            return (img.astype(jnp.float32) / 255.0 - mean) / std

        b, h, w, _ = data.shape
        m = batch["margins"]  # (B, 4)
        rows = jnp.arange(h)[None, :, None]
        cols = jnp.arange(w)[None, None, :]
        mask = (
            (rows >= m[:, 0, None, None])
            & (rows < h - m[:, 1, None, None])
            & (cols >= m[:, 2, None, None])
            & (cols < w - m[:, 3, None, None])
        )[..., None]
        rgb = norm(data) * mask
        mx = norm(batch["modal_x"]) * mask
        return rgb, mx, batch["label"].astype(jnp.int32)

    def step_fn(state: TrainState, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)
        rgb_in, mx_in, labels = _prep(batch)
        batch_prepped = dict(batch, data=rgb_in, modal_x=mx_in, label=labels)

        def loss_fn(params):
            variables = {"params": params}
            kwargs = {}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                kwargs["mutable"] = ["batch_stats"]
            out = model.apply(
                variables,
                batch_prepped["data"],
                batch_prepped["modal_x"],
                deterministic=False,
                return_aux=True,
                rngs={"dropout": dropout_rng},
                **kwargs,
            )
            (logits, aux), new_vars = out if kwargs else (out, {})
            loss = segmentation_loss(logits, batch_prepped["label"])
            if isinstance(aux, (list, tuple)):
                # deep-supervision heads, unit weight each
                # (reference builder.py:158-165)
                for a in aux:
                    loss = loss + segmentation_loss(a, batch_prepped["label"])
            elif aux is not None:
                # auxiliary FCN-head loss (reference builder.py:152-156)
                loss = loss + getattr(model, "aux_rate", 0.4) * (
                    segmentation_loss(aux, batch_prepped["label"])
                )
            return loss, new_vars.get("batch_stats")

        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=params,
            opt_state=opt_state,
            batch_stats=new_bn,
        )
        return new_state, loss

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data_sharded, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )
