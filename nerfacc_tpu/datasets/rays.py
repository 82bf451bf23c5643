"""Camera ray generation (shared by all dataset loaders).

OpenGL/Blender camera convention, matching the reference loaders
(``examples/datasets/nerf_synthetic.py:160-189``): pixel (x, y) maps to
camera-space direction ``[(x + 0.5 - cx)/fx, -(y + 0.5 - cy)/fy, -1]``,
rotated by the camera-to-world matrix.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Rays(NamedTuple):
    origins: jnp.ndarray  # (..., 3)
    viewdirs: jnp.ndarray  # (..., 3), normalized


def namedtuple_map(fn, tup):
    return type(tup)(*(fn(x) for x in tup))


def generate_rays(
    x: jnp.ndarray,
    y: jnp.ndarray,
    c2w: jnp.ndarray,
    K: jnp.ndarray,
) -> Rays:
    """Rays through pixel centers.

    Args:
        x, y: (...,) pixel column / row indices (int or float).
        c2w: (..., 3, 4) or (3, 4) camera-to-world matrices.
        K: (3, 3) intrinsics [[fx, 0, cx], [0, fy, cy], [0, 0, 1]].

    Returns:
        :class:`Rays` with normalized view directions.
    """
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    dirs = jnp.stack(
        [
            (x + 0.5 - cx) / fx,
            -(y + 0.5 - cy) / fy,
            -jnp.ones_like(jnp.asarray(x, jnp.float32)),
        ],
        axis=-1,
    )  # (..., 3)
    rot = c2w[..., :3, :3]
    trans = c2w[..., :3, 3]
    d = jnp.einsum("...ij,...j->...i", rot, dirs)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(trans, d.shape)
    return Rays(origins=o, viewdirs=d)


def look_at_poses(n_views: int, radius: float, elevation_deg: float = 30.0):
    """(n, 3, 4) camera-to-world poses on a circle looking at the origin
    (Blender-style -z forward, +y up in camera space)."""
    import numpy as np

    phis = np.linspace(0, 2 * np.pi, n_views, endpoint=False)
    theta = np.deg2rad(elevation_deg)
    poses = []
    for phi in phis:
        eye = radius * np.array(
            [np.cos(phi) * np.cos(theta), np.sin(phi) * np.cos(theta), np.sin(theta)]
        )
        forward = -eye / np.linalg.norm(eye)  # camera looks at origin
        up = np.array([0.0, 0.0, 1.0])
        right = np.cross(forward, up)
        right = right / np.linalg.norm(right)
        true_up = np.cross(right, forward)
        # columns: x=right, y=up, z=backward (OpenGL)
        R = np.stack([right, true_up, -forward], axis=-1)
        poses.append(np.concatenate([R, eye[:, None]], axis=-1))
    return jnp.asarray(np.stack(poses), jnp.float32)
