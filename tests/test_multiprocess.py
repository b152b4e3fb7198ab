"""2-process CPU simulation of the multi-host runtime.

Spawns two subprocesses, each with 4 virtual CPU devices, joined via
`jax.distributed.initialize` into one 8-device cluster, and drives the real
`train.py` main(): sharded loader -> global-array batch assembly
(`make_array_from_process_local_data`) -> pjit train step over the global
mesh -> orbax checkpoint barrier -> evaluator with cross-process confusion
allgather. Parity target: the reference's DDP init + DistributedSampler
semantics (/root/reference/engine/engine.py:49-61,
dataloader/dataloader.py:77-80).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import cv2


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mfnet_mp")
    (root / "RGB").mkdir()
    (root / "Label").mkdir()
    (root / "Modal").mkdir()
    rng = np.random.default_rng(0)
    names = [f"img{i:02d}" for i in range(10)]
    for n in names:
        h, w = 40, 56
        cv2.imwrite(str(root / "RGB" / f"{n}.png"),
                    rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        label = rng.integers(0, 9, (h, w)).astype(np.uint8)
        label[0, 0] = 255
        cv2.imwrite(str(root / "Label" / f"{n}.png"), label)
        cv2.imwrite(str(root / "Modal" / f"{n}.png"),
                    rng.integers(0, 255, (h, w), dtype=np.uint8))
    (root / "train2.txt").write_text("\n".join(names[:8]) + "\n")
    (root / "test.txt").write_text("\n".join(names[8:]) + "\n")
    return str(root)


@pytest.mark.slow
def test_two_process_training(synth_root, tmp_path):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "_mp_worker.py")
    log_dir = str(tmp_path / "log")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # stream worker output to files so a timeout still leaves evidence
    log_files = [str(tmp_path / f"worker{pid}.log") for pid in (0, 1)]
    handles = [open(f, "w") for f in log_files]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), str(port), synth_root,
             log_dir],
            env=env, cwd=repo,
            stdout=handles[pid], stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    # generous: two cold step_fn compiles contend for what may be a single
    # CPU core; warm (cached) runs finish in a couple of minutes
    timeout = int(os.environ.get("MP_TEST_TIMEOUT", "2700"))
    try:
        for p in procs:
            p.wait(timeout=timeout)
    except subprocess.TimeoutExpired:
        for q in procs:
            q.kill()
        tails = "\n".join(
            f"--- worker {i} tail ---\n" + open(f).read()[-3000:]
            for i, f in enumerate(log_files)
        )
        raise AssertionError(f"2-proc run timed out ({timeout}s)\n{tails}")
    finally:
        for h in handles:
            h.close()
    outs = [open(f).read() for f in log_files]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid}:\n{out[-4000:]}"
        assert f"WORKER_{pid}_DONE rc=0" in out or \
            f"WORKER_{pid}_DONE rc=None" in out, out[-2000:]
    # artifacts: checkpoint written through the orbax barrier + the val
    # log written by rank 0 after the cross-process allgather
    ckpt_dir = os.path.join(log_dir, "checkpoint")
    assert os.path.isdir(os.path.join(ckpt_dir, "epoch-1")), outs[0][-2000:]
    assert os.path.exists(os.path.join(log_dir, "val_epoch_1.log")), \
        outs[0][-2000:]
