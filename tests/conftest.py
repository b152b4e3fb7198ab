"""Test harness config: run everything on a virtual 8-device CPU mesh.

Note: this environment's 'axon' TPU plugin ignores the JAX_PLATFORMS env
var, so the platform is forced via jax.config instead. XLA_FLAGS must be in
the environment before the CPU backend is first initialized.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite re-jits the same programs every run.
# READ-ONLY here: serializing large CPU executables from the long-lived
# pytest process aborted inside jax's cache write (reproduced at three
# different tests across three full-suite runs — always in
# compilation_cache.put_executable_and_time). Reads still hit; the cache
# is WARMED by the subprocess runs (test_overfit's train.py CLI, the
# multiprocess workers, the multichip dryrun), which write safely from
# short-lived processes.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get(
        "SIGMA_TPU_TEST_CACHE",
        os.path.expanduser("~/.cache/sigma_tpu_test_xla"),
    ),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
