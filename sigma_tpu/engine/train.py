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
) -> Callable:
    """Returns train_step(state, batch, rng) -> (state, loss).

    batch: {"data": (B,H,W,3) f32, "modal_x": (B,H,W,3) f32,
            "label": (B,H,W) i32}
    """

    def step_fn(state: TrainState, batch, rng):
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            variables = {"params": params}
            kwargs = {}
            if state.batch_stats is not None:
                variables["batch_stats"] = state.batch_stats
                kwargs["mutable"] = ["batch_stats"]
            out = model.apply(
                variables,
                batch["data"],
                batch["modal_x"],
                deterministic=False,
                return_aux=True,
                rngs={"dropout": dropout_rng},
                **kwargs,
            )
            (logits, aux), new_vars = out if kwargs else (out, {})
            loss = segmentation_loss(logits, batch["label"])
            if aux is not None:
                # auxiliary FCN-head loss (reference builder.py:152-156)
                loss = loss + getattr(model, "aux_rate", 0.4) * (
                    segmentation_loss(aux, batch["label"])
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
