"""SyncBatchNorm semantics under the data mesh.

The reference wraps BN decoders in torch SyncBatchNorm under DDP
(`/root/reference/train.py:77-80`): batch statistics are computed over the
GLOBAL batch, not each device's shard. In this framework the train step is
jitted over the mesh with the batch sharded on the data axis, and flax
``nn.BatchNorm`` reduces over the batch axis of that global array — GSPMD
inserts the cross-device (and, multi-process, cross-host: the same program
runs under the global mesh of tests/test_multiprocess.py) all-reduce. This
test pins that: the ``batch_stats`` produced by a step on the 8-device mesh
must equal those of the identical global batch on a 1-device mesh.
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("decoder", ["MLPDecoder"])
def test_batch_stats_match_global_batch(decoder):
    from configs import get_config
    from sigma_tpu.engine.optim import build_optimizer
    from sigma_tpu.engine.train import create_train_state, make_train_step
    from sigma_tpu.models.builder import build_model
    from sigma_tpu.parallel import make_mesh, shard_batch
    from sigma_tpu.utils.lr_schedule import warmup_poly_lr

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs the 8-device CPU mesh (tests/conftest.py)")

    cfg = get_config("mfnet")
    object.__setattr__(cfg, "backbone", "sigma_test")
    object.__setattr__(cfg, "decoder", decoder)
    object.__setattr__(cfg, "batch_size", 8)

    rng0 = np.random.default_rng(0)
    h = w = 32
    batch = {
        "data": rng0.random((8, h, w, 3), np.float32),
        "modal_x": rng0.random((8, h, w, 3), np.float32),
        "label": rng0.integers(0, cfg.num_classes, (8, h, w)).astype(
            np.int32
        ),
    }
    model = build_model(cfg)
    schedule = warmup_poly_lr(cfg.lr, cfg.lr_power, 100, 10)
    init_batch = {k: v[:1] for k, v in batch.items()}
    state = create_train_state(
        model, cfg, jax.random.PRNGKey(0), init_batch, optax.identity()
    )
    assert state.batch_stats is not None, "decoder should carry BN stats"
    tx = build_optimizer(cfg, schedule, state.params)
    state0 = state.replace(opt_state=tx.init(state.params))

    stats = {}
    for n in (8, 1):
        mesh = make_mesh((n,), devices=devices[:n])
        step = make_train_step(model, tx, mesh=mesh, donate=False)
        new_state, _ = step(state0, shard_batch(mesh, batch), jax.random.PRNGKey(1))
        stats[n] = jax.device_get(new_state.batch_stats)

    flat8 = jax.tree_util.tree_leaves(stats[8])
    flat1 = jax.tree_util.tree_leaves(stats[1])
    assert len(flat8) == len(flat1) > 0
    for a, b in zip(flat8, flat1):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )
