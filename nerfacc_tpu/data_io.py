"""ctypes bridge to the native host data pipeline (csrc/raygen.cpp).

Builds the shared library on first use (g++ -O3 -fopenmp, cached under
/tmp), analogous to the reference's JIT cpp_extension fallback
(``nerfacc/cuda/_backend.py:48-84``) but with zero torch dependency.
Falls back cleanly (``lib() is None``) if no compiler is available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_SRC = Path(__file__).parent / "csrc" / "raygen.cpp"
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build() -> Optional[ctypes.CDLL]:
    src = _SRC.read_text()
    tag = hashlib.sha1(src.encode()).hexdigest()[:12]
    cache = Path(os.environ.get("NERFACC_TPU_CACHE", "/tmp/nerfacc_tpu_cache"))
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"raygen_{tag}.so"
    if not so.exists():
        cmd = [
            "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
            str(_SRC), "-o", str(so),
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (OSError, subprocess.CalledProcessError):
            try:  # retry without openmp/march (portability)
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", str(_SRC), "-o", str(so)],
                    check=True, capture_output=True,
                )
            except (OSError, subprocess.CalledProcessError):
                return None
    lib = ctypes.CDLL(str(so))
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.sample_ray_batch.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        f32p, f32p, ctypes.c_int, f32p, ctypes.c_uint64, ctypes.c_int64,
        f32p, f32p, f32p,
    ]
    lib.rays_for_pose.argtypes = [
        ctypes.c_int64, ctypes.c_int64, f32p, f32p, ctypes.c_int, f32p, f32p,
    ]
    return lib


def lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build()
    return _LIB


def sample_ray_batch(
    images: np.ndarray,  # (n, h, w, c) float32, c in {3, 4}
    poses: np.ndarray,  # (n, 3, 4) float32
    intrin: np.ndarray,  # (4,) fx, fy, cx, cy
    bkgd: np.ndarray,  # (3,)
    seed: int,
    num_rays: int,
    opengl: bool = True,
):
    """Native random-pixel batch; returns (origins, dirs, pixels) float32."""
    L = lib()
    assert L is not None, "native raygen unavailable (no g++)"
    n, h, w, c = images.shape
    origins = np.empty((num_rays, 3), np.float32)
    dirs = np.empty((num_rays, 3), np.float32)
    pixels = np.empty((num_rays, 3), np.float32)
    L.sample_ray_batch(
        np.ascontiguousarray(images, np.float32), n, h, w, c,
        np.ascontiguousarray(poses, np.float32),
        np.ascontiguousarray(intrin, np.float32), int(opengl),
        np.ascontiguousarray(bkgd, np.float32),
        ctypes.c_uint64(seed & 0xFFFFFFFFFFFFFFFF), num_rays,
        origins, dirs, pixels,
    )
    return origins, dirs, pixels


def rays_for_pose(
    h: int, w: int, pose: np.ndarray, intrin: np.ndarray, opengl: bool = True
):
    L = lib()
    assert L is not None, "native raygen unavailable (no g++)"
    origins = np.empty((h * w, 3), np.float32)
    dirs = np.empty((h * w, 3), np.float32)
    L.rays_for_pose(
        h, w, np.ascontiguousarray(pose, np.float32),
        np.ascontiguousarray(intrin, np.float32), int(opengl), origins, dirs,
    )
    return origins, dirs
