"""Prediction visualization and IoU table printing.

Reference: `/root/reference/utils/visualize.py` (palette coloring,
side-by-side composites, `print_iou` formatter) and the eval-time PNG dumps
(`/root/reference/eval.py:31-48`).
"""

from __future__ import annotations

import os

import numpy as np

try:  # pragma: no cover
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def set_img_color(colors, background, img, pred):
    for i in range(len(colors)):
        img[pred == i] = colors[i]
    if background in np.unique(pred):
        img[pred == background] = 255
    return img


def get_colored_pred(colors, background, pred):
    im = np.zeros((*pred.shape, 3), np.uint8)
    return set_img_color(colors, background, im, pred)


def save_prediction(save_dir: str, fn: str, pred, colors, background=255):
    """Raw label PNG + palette-colored PNG (eval.py:31-48)."""
    os.makedirs(save_dir, exist_ok=True)
    os.makedirs(save_dir + "_color", exist_ok=True)
    cv2.imwrite(os.path.join(save_dir, fn + ".png"), pred.astype(np.uint8))
    colored = get_colored_pred(colors, background, pred)
    cv2.imwrite(
        os.path.join(save_dir + "_color", fn + ".png"),
        cv2.cvtColor(colored, cv2.COLOR_RGB2BGR),
    )


def print_iou(iou, mean_pixel_acc, pixel_acc, class_names=None,
              show_no_back=False):
    """Per-class IoU table (visualize.py:54-74). Returns the string."""
    n = iou.size
    lines = []
    for i in range(n):
        cls = f"Class {i + 1}" if class_names is None else f"{i + 1} {class_names[i]}"
        lines.append(f"{cls:<24} IoU {iou[i] * 100:.3f}%")
    mean_iou = np.nanmean(iou)
    mean_iou_nb = np.nanmean(iou[1:])
    tail = (
        f"mean IoU {mean_iou * 100:.3f}% "
        + (f"mean IoU (no back) {mean_iou_nb * 100:.3f}% " if show_no_back else "")
        + f"mean pixel acc {mean_pixel_acc * 100:.3f}% "
        + f"pixel acc {pixel_acc * 100:.3f}%"
    )
    lines.append("-" * 60)
    lines.append(tail)
    out = "\n".join(lines)
    print(out)
    return out
