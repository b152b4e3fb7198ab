"""Native C++ augmentation core: parity with the numpy reference path."""

import numpy as np
import pytest

from configs import get_config
from sigma_tpu.data import native
from sigma_tpu.data.transforms import TrainPre

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def _cfg(h=40, w=56, scales=(0.5, 0.75, 1, 1.25, 1.5, 1.75)):
    cfg = get_config("mfnet")
    object.__setattr__(cfg, "image_height", h)
    object.__setattr__(cfg, "image_width", w)
    object.__setattr__(cfg, "train_scale_array", scales)
    return cfg


@pytest.mark.parametrize("seed", range(8))
def test_native_matches_numpy(seed):
    rng_data = np.random.default_rng(seed)
    rgb = rng_data.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    gt = rng_data.integers(0, 9, (48, 64), dtype=np.uint8)
    mx = rng_data.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    cfg = _cfg()
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)

    nat = TrainPre(mean, std, cfg, use_native=True)
    ref = TrainPre(mean, std, cfg, use_native=False)
    a = nat(np.random.default_rng(seed * 7 + 1), rgb, gt, mx)
    b = ref(np.random.default_rng(seed * 7 + 1), rgb, gt, mx)
    for x, y, tol in zip(a, b, (1e-5, 0, 1e-5)):
        assert x.shape == y.shape and x.dtype == y.dtype
        if tol:
            np.testing.assert_allclose(x, y, atol=tol)
        else:
            np.testing.assert_array_equal(x, y)


def test_native_no_scale_path():
    cfg = _cfg(h=64, w=80, scales=None)
    object.__setattr__(cfg, "train_scale_array", None)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    rgb = np.full((32, 40, 3), 255, np.uint8)
    gt = np.ones((32, 40), np.uint8)
    mx = np.zeros((32, 40, 3), np.uint8)
    out = TrainPre(mean, std, cfg, use_native=True)(
        np.random.default_rng(0), rgb, gt, mx
    )
    p_rgb, p_gt, p_x = out
    # small image centered in a padded canvas
    assert p_rgb.shape == (64, 80, 3)
    assert p_gt[0, 0] == 255 and p_gt[32, 40] == 1
    assert p_rgb[0, 0, 0] == 0.0 and p_rgb[32, 40, 0] == 1.0


def test_device_norm_path_equivalence():
    """u8 canvases + device-side normalize/mask == host float pipeline."""
    cfg = _cfg()
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    rng_data = np.random.default_rng(5)
    rgb = rng_data.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    gt = rng_data.integers(0, 9, (48, 64), dtype=np.uint8)
    mx = rng_data.integers(0, 255, (48, 64, 3), dtype=np.uint8)

    host = TrainPre(mean, std, cfg, use_native=False)
    dev = TrainPre(mean, std, cfg, device_norm=True)
    for seed in range(4):
        a = host(np.random.default_rng(seed), rgb, gt, mx)
        d = dev(np.random.default_rng(seed), rgb, gt, mx)
        # emulate the device-side prep of engine.train._prep
        m = d["margins"]
        h, w = d["data"].shape[:2]
        mask = np.zeros((h, w, 1), np.float32)
        mask[m[0] : h - m[1], m[2] : w - m[3]] = 1.0
        rgb_dev = ((d["data"].astype(np.float32) / 255 - mean) / std) * mask
        mx_dev = ((d["modal_x"].astype(np.float32) / 255 - mean) / std) * mask
        np.testing.assert_allclose(rgb_dev, a[0], atol=1e-5)
        np.testing.assert_allclose(mx_dev, a[2], atol=1e-5)
        np.testing.assert_array_equal(d["label"].astype(np.int32), a[1])
