"""Driver-runnable on-chip golden check: the full sigma_mini forward on
the REAL TPU (Pallas kernels, fp32) must match the committed CPU-generated
golden logits at the reference tolerance envelope. Run directly (NOT via
pytest — tests/conftest.py forces a CPU backend for the suite):

  python tests/run_golden_tpu.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.expanduser("~/.cache/sigma_tpu_xla"),
)

# TPU arithmetic does not vary by host ISA, so the on-chip check keeps the
# tight reference envelope (the portable tier exists for cross-machine
# XLA:CPU codegen variance; see test_golden_logits.check_against_fixture)
os.environ.setdefault("GOLDEN_STRICT", "1")

from test_golden_logits import check_against_fixture  # noqa: E402

if __name__ == "__main__":
    backend = jax.default_backend()
    check_against_fixture()
    print(f"golden logits OK on backend={backend}")
