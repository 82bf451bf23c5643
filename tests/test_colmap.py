"""COLMAP parser round-trip on synthetic cameras.bin / images.bin
(written per https://colmap.github.io/format.html) and the txt fallback."""

import struct
import tempfile
from pathlib import Path

import numpy as np

from nerfacc_tpu.datasets.colmap import SceneManager


def _write_cameras_bin(path: Path, cams):
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", len(cams)))
        for cam_id, model_id, w, h, params in cams:
            fh.write(struct.pack("<iiQQ", cam_id, model_id, w, h))
            fh.write(struct.pack(f"<{len(params)}d", *params))


def _write_images_bin(path: Path, images):
    with open(path, "wb") as fh:
        fh.write(struct.pack("<Q", len(images)))
        for image_id, qvec, tvec, camera_id, name, n_pts in images:
            fh.write(struct.pack("<i", image_id))
            fh.write(struct.pack("<4d", *qvec))
            fh.write(struct.pack("<3d", *tvec))
            fh.write(struct.pack("<i", camera_id))
            fh.write(name.encode() + b"\x00")
            fh.write(struct.pack("<Q", n_pts))
            fh.write(b"\x00" * (24 * n_pts))


def test_colmap_bin_roundtrip():
    q = np.array([0.9238795, 0.0, 0.3826834, 0.0])  # 45 deg about y
    t = np.array([0.5, -1.0, 2.0])
    with tempfile.TemporaryDirectory() as d:
        d = Path(d)
        _write_cameras_bin(
            d / "cameras.bin",
            [(1, 1, 640, 480, [500.0, 510.0, 320.0, 240.0])],  # PINHOLE
        )
        _write_images_bin(
            d / "images.bin", [(7, q, t, 1, "frame_0001.png", 3)]
        )
        mgr = SceneManager(str(d))
        mgr.load_cameras()
        mgr.load_images()

    cam = mgr.cameras[1]
    assert cam.model == "PINHOLE" and (cam.width, cam.height) == (640, 480)
    K = cam.K
    assert K[0, 0] == 500.0 and K[1, 1] == 510.0 and K[0, 2] == 320.0

    img = mgr.images[7]
    assert img.name == "frame_0001.png" and img.camera_id == 1
    np.testing.assert_allclose(img.tvec, t)
    R = img.R()
    # proper rotation reproducing the quaternion
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-7)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-7)
    c, s = np.cos(np.pi / 4), np.sin(np.pi / 4)
    want = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    np.testing.assert_allclose(R, want, atol=1e-6)


def test_colmap_txt_fallback():
    with tempfile.TemporaryDirectory() as d:
        d = Path(d)
        (d / "cameras.txt").write_text(
            "# comment\n1 SIMPLE_PINHOLE 320 240 300.0 160.0 120.0\n"
        )
        (d / "images.txt").write_text(
            "# comment\n"
            "2 1 0 0 0 0.1 0.2 0.3 1 img.png\n"
            "1.0 2.0 -1\n"
        )
        mgr = SceneManager(str(d))
        mgr.load_cameras()
        mgr.load_images()
    cam = mgr.cameras[1]
    assert cam.K[0, 0] == 300.0 and cam.K[1, 1] == 300.0  # SIMPLE_PINHOLE
    img = mgr.images[2]
    np.testing.assert_allclose(img.qvec, [1, 0, 0, 0])
    np.testing.assert_allclose(img.R(), np.eye(3), atol=1e-12)
