"""Device-evaluator parity vs a direct numpy/cv2 transcription of the
reference sliding-eval semantics (/root/reference/engine/evaluator.py:433-559).

The evaluator runs normalization, padding, window extraction, flip TTA,
exp-score accumulation, margin crops, and the bilinear resize on-device;
these tests pin every geometry branch against a host implementation that
follows the reference line by line (including the stride/extent index swap,
the per-window center pad, and the negative-start window collapse when the
crop extent exceeds the image)."""

import numpy as np
import pytest

import cv2
import jax.numpy as jnp

from sigma_tpu.engine.evaluator import SlidingEvaluator

MEAN = np.array([0.485, 0.456, 0.406], np.float32)
STD = np.array([0.229, 0.224, 0.225], np.float32)
C = 5


class FakeModel:
    """Deterministic stand-in network: smooth, content-dependent logits."""

    def apply(self, variables, rgb, mx):
        base = rgb.sum(-1, keepdims=True) * 0.3 + mx.sum(-1, keepdims=True) * 0.2
        ramp = jnp.arange(C, dtype=jnp.float32) * 0.4 - 1.0
        row = jnp.tanh(
            jnp.cumsum(rgb[..., :1], axis=1) * 0.01
        )  # breaks vertical translation invariance
        return jnp.tanh(base + row) * (1.0 + ramp)


def _pad_to(img, shape, value):
    pad_h = max(0, shape[0] - img.shape[0])
    pad_w = max(0, shape[1] - img.shape[1])
    margin = (pad_h // 2, pad_h - pad_h // 2, pad_w // 2, pad_w - pad_w // 2)
    if pad_h or pad_w:
        pad = [(margin[0], margin[1]), (margin[2], margin[3])]
        if img.ndim == 3:
            pad.append((0, 0))
        img = np.pad(img, pad, mode="constant", constant_values=value)
    return img, margin


def host_reference(model, img, modal_x, scales, flip, crop, stride_rate):
    """Line-by-line transcription of sliding_eval_rgbX/scale_process_rgbX/
    process_image_rgbX (reference evaluator.py:433-559)."""
    ori = img.shape[:2]
    processed = np.zeros(ori + (C,), np.float32)

    def norm_rgb(a):
        return (a.astype(np.float32) / 255.0 - MEAN) / STD

    def norm_x(a):
        if a.ndim == 2:
            return a.astype(np.float32) / 255.0
        return norm_rgb(a)

    def fwd_window(wimg, wx):
        p_img, margin = _pad_to(wimg, crop, 0)
        p_x, _ = _pad_to(wx, crop, 0)
        if p_x.ndim == 2:
            p_x = np.stack([p_x] * 3, axis=-1)
        l = np.asarray(
            model.apply({}, jnp.asarray(p_img[None]), jnp.asarray(p_x[None]))
        )[0]
        if flip:
            lf = np.asarray(
                model.apply(
                    {},
                    jnp.asarray(p_img[None, :, ::-1]),
                    jnp.asarray(p_x[None, :, ::-1]),
                )
            )[0]
            l = l + lf[:, ::-1]
        score = np.exp(l.astype(np.float32))
        return score, margin

    for s in scales:
        img_s = cv2.resize(img, None, fx=s, fy=s, interpolation=cv2.INTER_LINEAR)
        if modal_x.ndim == 2:
            x_s = cv2.resize(
                modal_x, None, fx=s, fy=s, interpolation=cv2.INTER_NEAREST
            )
        else:
            x_s = cv2.resize(
                modal_x, None, fx=s, fy=s, interpolation=cv2.INTER_LINEAR
            )
        rows, cols = img_s.shape[:2]
        p_img, p_x = norm_rgb(img_s), norm_x(x_s)
        ch, cw = crop
        if cols <= cw or rows <= ch:
            score, margin = fwd_window(p_img, p_x)
            score = score[
                margin[0] : score.shape[0] - margin[1],
                margin[2] : score.shape[1] - margin[3],
            ]
        else:
            stride = (int(np.ceil(ch * stride_rate)), int(np.ceil(cw * stride_rate)))
            r_grid = int(np.ceil((rows - ch) / stride[0])) + 1
            c_grid = int(np.ceil((cols - cw) / stride[1])) + 1
            acc = np.zeros((rows, cols, C), np.float32)
            for gy in range(r_grid):
                for gx in range(c_grid):
                    s_x = gx * stride[0]
                    s_y = gy * stride[1]
                    e_x = min(s_x + ch, cols)
                    e_y = min(s_y + cw, rows)
                    s_x = e_x - ch
                    s_y = e_y - cw
                    # raw numpy slicing, negative starts wrap (the
                    # reference relies on this)
                    wimg = p_img[s_y:e_y, s_x:e_x]
                    wx = p_x[s_y:e_y, s_x:e_x]
                    win, wm = fwd_window(wimg, wx)
                    win = win[
                        wm[0] : win.shape[0] - wm[1],
                        wm[2] : win.shape[1] - wm[3],
                    ]
                    acc[s_y:e_y, s_x:e_x] += win
            score = acc
        processed += cv2.resize(
            score, (ori[1], ori[0]), interpolation=cv2.INTER_LINEAR
        )
    return processed


def _device_scores(ev, img, modal_x):
    acc = None
    for si, s in enumerate(ev.multi_scales):
        img_s = cv2.resize(img, None, fx=s, fy=s, interpolation=cv2.INTER_LINEAR)
        if modal_x.ndim == 2:
            x_s = cv2.resize(
                modal_x, None, fx=s, fy=s, interpolation=cv2.INTER_NEAREST
            )
        else:
            x_s = cv2.resize(
                modal_x, None, fx=s, fy=s, interpolation=cv2.INTER_LINEAR
            )
        acc = ev.scale_process(None, img_s, x_s, img.shape[:2], acc, si == 0)
    return np.asarray(acc)


CASES = [
    # (img_hw, crop, scales, flip, modal_2d)  — one per geometry branch
    ((48, 64), (48, 64), (1.0, 0.75), True, False),      # whole-image
    ((100, 128), (40, 56), (1.0,), True, False),         # window grid
    ((100, 128), (40, 56), (0.75, 1.0, 1.25), False, True),  # grid + 2-D x
    ((50, 128), (40, 56), (1.0,), False, False),         # collapsed windows
    # scaled-down PST900 geometry (720x1280 crop 480x640 => 2x3 grid with
    # the same rows/cols-to-crop ratios)
    ((90, 160), (60, 80), (1.0,), True, False),
    # scaled-down NYU protocol: [0.75, 1, 1.25] + flip over a window grid
    ((80, 104), (40, 56), (0.75, 1.0, 1.25), True, False),
]


@pytest.mark.parametrize("img_hw,crop,scales,flip,modal2d", CASES)
def test_device_eval_matches_host_reference(img_hw, crop, scales, flip,
                                            modal2d):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, img_hw + (3,), dtype=np.uint8)
    if modal2d:
        mx = rng.integers(0, 255, img_hw, dtype=np.uint8)
    else:
        mx = rng.integers(0, 255, img_hw + (3,), dtype=np.uint8)
    model = FakeModel()
    ev = SlidingEvaluator(
        model, C, MEAN, STD, multi_scales=scales, is_flip=flip,
        eval_crop_size=crop, stride_rate=2 / 3, window_batch=3,
    )
    want = host_reference(model, img, mx, scales, flip, crop, 2 / 3)
    got = _device_scores(ev, img, mx)
    # scores match up to the cv2-vs-XLA bilinear rounding
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    pred = ev.sliding_eval(None, img, mx)
    assert pred.shape == img_hw
    ref_pred = want.argmax(2)
    # identical up to near-ties from resize rounding
    assert (pred == ref_pred).mean() > 0.999


def test_graph_cache_keys_on_shapes_not_spans():
    """Compile-time hardening: window extraction/accumulation graphs are
    keyed on (image shape, window shape, bucket) with RUNTIME offsets —
    every chunk of a grid, and every same-geometry scale, shares one
    graph. A big grid (many chunks) must not grow the jit cache per
    chunk."""
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (90, 160, 3), dtype=np.uint8)
    mx = rng.integers(0, 255, (90, 160, 3), dtype=np.uint8)
    ev = SlidingEvaluator(
        FakeModel(), C, MEAN, STD, multi_scales=(1.0,), is_flip=False,
        eval_crop_size=(40, 56), stride_rate=2 / 3, window_batch=2,
    )
    ev.sliding_eval(None, img, mx)
    # 3x4 grid = 12 windows = 6 chunks of bucket 2; the old span-keyed
    # scheme compiled 6+ accumulate graphs (one per chunk) — now: one
    # extract, one first-accumulate, one rest-accumulate
    n_extract = sum(1 for k in ev._jitted if k[0] == "extract")
    n_acc = sum(1 for k in ev._jitted if k[0] == "acc")
    assert n_extract == 1, sorted(ev._jitted)
    assert n_acc == 2, sorted(ev._jitted)
