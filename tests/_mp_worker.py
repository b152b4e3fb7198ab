"""Worker for the 2-process CPU simulation test (test_multiprocess.py).

Each instance claims 4 virtual CPU devices and joins a 2-process JAX
distributed cluster, then drives the REAL train.py main() — loader shard,
global-array batch assembly, pjit train step over the global 8-device mesh,
orbax checkpoint barrier, and the evaluator's cross-process allgather.
This simulates the reference's multi-worker DDP runtime
(/root/reference/engine/engine.py:49-61) without multi-host hardware.
"""

import os
import sys

# must be set before jax import; override the pytest conftest's 8-device
# flag the subprocess may inherit. ONE device per process: the multi-process
# semantics (global-array assembly, allgather, ckpt barrier) are identical,
# and the SPMD compile is far cheaper — the bench machine can be a single
# CPU core, where the 2x4-device step compile alone exceeded 15 minutes.
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
os.environ["JAX_PLATFORMS"] = "cpu"

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main():
    pid = int(sys.argv[1])
    port = sys.argv[2]
    data_root = sys.argv[3]
    log_dir = sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    # persistent compile cache: repeat suite runs skip the expensive
    # step_fn compile entirely
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "SIGMA_TPU_TEST_CACHE",
            os.path.expanduser("~/.cache/sigma_tpu_test_xla"),
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=2,
        process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2, jax.devices()
    assert len(jax.local_devices()) == 1

    # establish the Gloo communicator NOW, while both workers are in
    # lockstep (a trivial collective compiles in seconds). Without this,
    # the first collective runs after the step_fn compile — on a loaded
    # 1-core host the two compiles can desynchronize by minutes and the
    # late worker misses Gloo's 30s context-init window
    # ("GetKeyValue() timed out", observed r4).
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("gloo-context-warmup")

    import train as train_mod

    rc = train_mod.main([
        "-n", "mfnet",
        "--dataset-path", data_root,
        "--backbone", "sigma_test",
        "--batch-size", "2",
        "--epochs", "1",
        "--log-dir", log_dir,
        "--override", "image_height=32",
        "--override", "image_width=32",
        "--override", "eval_crop_size=(32, 32)",
        "--override", "num_train_imgs=8",
        "--override", "num_workers=1",
        "--override", "checkpoint_start_epoch=1",
        "--override", "checkpoint_step=1",
        "--override", "eval_scale_array=(1.0,)",
        "--override", "warm_up_epoch=0",
    ])
    print(f"WORKER_{pid}_DONE rc={rc}", flush=True)
    sys.exit(rc or 0)


if __name__ == "__main__":
    main()
