"""Where does the multichip-dryrun cold compile time go?

Times, for the flagship sigma_tiny train step at SIGMA_DRYRUN_HW on an
8-device virtual CPU mesh: python trace+lower time, XLA compile time, and
one-step execution time — under knob overrides from argv:
  python experiments/dryrun_compile_probe.py [chunk=16] [remat=0] [hw=48x64]
Each invocation uses a FRESH throwaway compile cache (timings are cold).
"""
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

knobs = dict(kv.split("=", 1) for kv in sys.argv[1:])
hw = knobs.get("hw", "48x64")
n_devices = int(knobs.get("n", "8"))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={n_devices}"
    + knobs.get("xf", "")
).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update(
    "jax_compilation_cache_dir", tempfile.mkdtemp(prefix="dryrun_probe_")
)

import numpy as np  # noqa: E402
import optax  # noqa: E402

from configs import get_config  # noqa: E402
from sigma_tpu.engine.optim import build_optimizer  # noqa: E402
from sigma_tpu.engine.train import create_train_state, make_train_step  # noqa: E402
from sigma_tpu.models.builder import build_model  # noqa: E402
from sigma_tpu.parallel import make_mesh, shard_batch  # noqa: E402
from sigma_tpu.utils.lr_schedule import warmup_poly_lr  # noqa: E402

t_start = time.monotonic()


def lap(msg, t0=[t_start]):
    now = time.monotonic()
    print(f"[{now - t_start:7.1f}s] (+{now - t0[0]:6.1f}s) {msg}", flush=True)
    t0[0] = now


h, w = (int(v) for v in hw.split("x"))
cfg = get_config("mfnet")
object.__setattr__(cfg, "backbone", knobs.get("bk", "sigma_tiny"))
object.__setattr__(cfg, "batch_size", n_devices)
if "chunk" in knobs:
    object.__setattr__(cfg, "scan_chunk", int(knobs["chunk"]))
if "remat" in knobs:
    object.__setattr__(cfg, "remat", bool(int(knobs["remat"])))

devices = jax.devices()
mesh = make_mesh((n_devices,), devices=devices[:n_devices])
rng0 = np.random.default_rng(0)
batch = {
    "data": rng0.random((n_devices, h, w, 3), np.float32),
    "modal_x": rng0.random((n_devices, h, w, 3), np.float32),
    "label": rng0.integers(0, cfg.num_classes, (n_devices, h, w)).astype(
        np.int32
    ),
}
model = build_model(cfg)
lap("imports+setup done")

schedule = warmup_poly_lr(cfg.lr, cfg.lr_power, 1000, 10)
init_batch = {k: v[:1] for k, v in batch.items()}
state = create_train_state(
    model, cfg, jax.random.PRNGKey(0), init_batch, optax.identity()
)
lap("init (trace+compile+run)")
tx = build_optimizer(cfg, schedule, state.params)
state0 = state.replace(opt_state=tx.init(state.params))
lap("optimizer init")

step = make_train_step(model, tx, mesh=mesh, donate=False)
sharded = shard_batch(mesh, batch)
lowered = step.lower(state0, sharded, jax.random.PRNGKey(1))
lap("train step trace+lower")
compiled = lowered.compile()
lap("train step XLA compile")
_, loss = compiled(state0, sharded, jax.random.PRNGKey(1))
loss = float(loss)
lap(f"train step execute, loss={loss:.4f}")
