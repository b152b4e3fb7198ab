"""ctypes loader for the native augmentation core.

Compiles `augment.cpp` on first use into a per-user cache directory (no
pip/apt involved; uses the baked-in g++) and exposes
`fused_image_aug` / `fused_label_aug`. Returns None-functions when a
compiler is unavailable — callers fall back to the bit-exact numpy path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "augment.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> str | None:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.environ.get(
        "SIGMA_TPU_NATIVE_CACHE",
        os.path.expanduser("~/.cache/sigma_tpu_native"),
    )
    os.makedirs(cache, exist_ok=True)
    out = os.path.join(cache, f"libsigmaaug-{digest}.so")
    if os.path.exists(out):
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        _SRC, "-o", out + ".tmp",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(out + ".tmp", out)
        return out
    except Exception:
        # no OpenMP? retry without
        try:
            cmd.remove("-fopenmp")
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(out + ".tmp", out)
            return out
        except Exception:
            return None


def _load():
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("SIGMA_TPU_DISABLE_NATIVE"):
            return None
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        i64 = ctypes.c_int64
        lib.fused_image_aug.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, i64, i64, i64, i64, i64,
            i64, i64, i64, i64, i64, i64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_float, ctypes.c_int,
        ]
        lib.fused_label_aug.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, i64, i64, i64, i64,
            i64, i64, i64, i64, i64, i64, ctypes.c_int32, ctypes.c_int,
        ]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def fused_image_aug(src_u8, out_hw, crop, pad, copy_hw, mean, std,
                    pad_value: float, mirror: bool):
    """src_u8 (H, W, C) uint8 -> (out_h, out_w, C) float32 normalized."""
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(src_u8, np.uint8)
    h, w, ch = src.shape
    out = np.empty((out_hw[0], out_hw[1], ch), np.float32)
    mean = np.ascontiguousarray(np.broadcast_to(mean, (ch,)), np.float32)
    std = np.ascontiguousarray(np.broadcast_to(std, (ch,)), np.float32)
    lib.fused_image_aug(
        src.ctypes.data, out.ctypes.data, h, w, ch, out_hw[0], out_hw[1],
        crop[0], crop[1], pad[0], pad[1], copy_hw[0], copy_hw[1],
        mean.ctypes.data, std.ctypes.data, ctypes.c_float(pad_value),
        int(mirror),
    )
    return out


def fused_label_aug(src_u8, out_hw, crop, pad, copy_hw, pad_value: int,
                    mirror: bool):
    lib = _load()
    assert lib is not None
    src = np.ascontiguousarray(src_u8, np.uint8)
    h, w = src.shape
    out = np.empty((out_hw[0], out_hw[1]), np.int32)
    lib.fused_label_aug(
        src.ctypes.data, out.ctypes.data, h, w, out_hw[0], out_hw[1],
        crop[0], crop[1], pad[0], pad[1], copy_hw[0], copy_hw[1],
        np.int32(pad_value), int(mirror),
    )
    return out
