"""Golden-logits fixture: pins the full-model forward numerics over time.

The torch-parity suite re-derives weights per run; nothing there pins the
composed model's output ACROSS code changes. This fixture freezes (input,
seed-inited params, expected fp32 logits) for sigma_mini at 64x80 — small
enough for 1-core CPU CI, structurally complete (4 VSSM stages, CroMB +
ConMB fusion, MambaDecoder). Any silent numerics drift from future kernel
tuning fails this test at the reference tolerance envelope
(rtol 6e-4 / atol 2e-3, selective_scan/test_selective_scan.py:148).

On CPU CI (tests/conftest.py forces JAX_PLATFORMS=cpu) this checks the
portable scan path; `python tests/run_golden_tpu.py` runs the SAME check
on the real chip through the Pallas kernels.

Regenerate deliberately (after an intentional numerics change) with:
  JAX_PLATFORMS=cpu python tests/test_golden_logits.py --regen
"""

from __future__ import annotations

import os

import numpy as np

FIXTURE = os.path.join(
    os.path.dirname(__file__), "fixtures", "golden_logits_sigma_mini.npz"
)
SEED = 42
H, W, CLASSES = 64, 80, 9


def _build():
    import jax
    import jax.numpy as jnp

    from sigma_tpu.models.builder import EncoderDecoder

    model = EncoderDecoder(
        num_classes=CLASSES, backbone="sigma_mini", drop_path_rate=0.0
    )
    rng = np.random.default_rng(123)
    rgb = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    mx = rng.standard_normal((1, H, W, 3)).astype(np.float32)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(SEED), jnp.asarray(rgb), jnp.asarray(mx)
    )
    return model, variables, rgb, mx


def compute_logits():
    import jax

    model, variables, rgb, mx = _build()
    logits = jax.jit(model.apply)(variables, rgb, mx)
    return np.asarray(logits, np.float32), rgb, mx


def check_against_fixture():
    data = np.load(FIXTURE)
    logits, rgb, mx = compute_logits()
    np.testing.assert_array_equal(rgb, data["rgb"])
    np.testing.assert_array_equal(mx, data["modal_x"])
    np.testing.assert_allclose(
        logits, data["logits"], rtol=6e-4, atol=2e-3,
        err_msg="full-model logits drifted from the golden fixture",
    )
    return logits


def test_golden_logits():
    check_against_fixture()


if __name__ == "__main__":
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    if "--regen" in sys.argv:
        logits, rgb, mx = compute_logits()
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        np.savez_compressed(
            FIXTURE, rgb=rgb, modal_x=mx, logits=logits
        )
        print(f"wrote {FIXTURE} ({os.path.getsize(FIXTURE)} bytes)")
    else:
        check_against_fixture()
        print("golden logits OK")
