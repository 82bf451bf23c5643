"""High-level rendering helpers (re-creation of reference
``examples/utils.py::render_image`` for the JAX API).

``render_rays`` is the fully-jittable single-chunk path used by training
steps; ``render_image`` chunks a full image through it for evaluation
(reference ``utils.py:79-106``: 8192-ray eval chunks).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ray_marching import ray_marching
from .vol_rendering import rendering


def make_field_fns(field, params, rays_o, rays_d, timestamps=None):
    """Build the reference's ``sigma_fn`` / ``rgb_sigma_fn`` closures
    (``examples/utils.py:50-76``) over a batch of rays.

    ``field`` is a flax module exposing ``query_density`` and ``__call__``;
    for D-NeRF fields both take a time argument (per-ray ``timestamps``).
    """

    def positions(t_starts, t_ends, ray_indices):
        t_mid = (t_starts + t_ends) / 2.0
        return (
            rays_o[ray_indices] + t_mid * rays_d[ray_indices],
            rays_d[ray_indices],
        )

    if timestamps is None:

        def sigma_fn(t_starts, t_ends, ray_indices):
            x, _ = positions(t_starts, t_ends, ray_indices)
            return field.apply(params, x, method=field.query_density)

        def rgb_sigma_fn(t_starts, t_ends, ray_indices):
            x, d = positions(t_starts, t_ends, ray_indices)
            return field.apply(params, x, d)

    else:

        def sigma_fn(t_starts, t_ends, ray_indices):
            x, _ = positions(t_starts, t_ends, ray_indices)
            t = timestamps[ray_indices]
            return field.apply(params, x, t, method=field.query_density)

        def rgb_sigma_fn(t_starts, t_ends, ray_indices):
            x, d = positions(t_starts, t_ends, ray_indices)
            t = timestamps[ray_indices]
            return field.apply(params, x, t, d)

    return sigma_fn, rgb_sigma_fn


def render_rays(
    params,
    field,
    rays_o,
    rays_d,
    *,
    grid=None,
    scene_aabb=None,
    near_plane=None,
    far_plane=None,
    render_step_size=5e-3,
    render_bkgd=None,
    cone_angle=0.0,
    alpha_thre=0.0,
    early_stop_eps=1e-4,
    stratified=False,
    key=None,
    timestamps=None,
    max_samples_per_ray=512,
    samples_budget=None,
    visible_samples_budget=None,
):
    """Render one ray batch: march (no grad) + composite (with grad).

    Jittable end to end; returns (colors, opacities, depths, n_samples)
    where n_samples is the live sample count (for dynamic-batch metrics,
    reference ``train_ngp_nerf.py:236-241``).
    """
    n_rays = rays_o.shape[0]
    sigma_fn, rgb_sigma_fn = make_field_fns(
        field, jax.lax.stop_gradient(params), rays_o, rays_d, timestamps
    )
    samples = ray_marching(
        rays_o,
        rays_d,
        scene_aabb=scene_aabb,
        grid=grid,
        sigma_fn=sigma_fn,
        early_stop_eps=early_stop_eps,
        alpha_thre=alpha_thre,
        near_plane=near_plane,
        far_plane=far_plane,
        render_step_size=render_step_size,
        stratified=stratified,
        cone_angle=cone_angle,
        key=key,
        max_samples_per_ray=max_samples_per_ray,
        samples_budget=samples_budget,
        visible_samples_budget=visible_samples_budget,
    )
    # grad-tracked field queries for compositing
    _, rgb_sigma_fn = make_field_fns(field, params, rays_o, rays_d, timestamps)
    colors, opacities, depths = rendering(
        samples.t_starts,
        samples.t_ends,
        samples.ray_indices,
        n_rays=n_rays,
        rgb_sigma_fn=rgb_sigma_fn,
        render_bkgd=render_bkgd,
        masks=samples.masks,
    )
    return colors, opacities, depths, samples.masks.sum()


def render_image(
    params,
    field,
    rays_o,
    rays_d,
    *,
    test_chunk_size: int = 8192,
    eval_samples_per_ray: int = 128,
    **kwargs,
):
    """Chunked whole-image render (reference ``utils.py:79-106``).

    ``rays_o``/``rays_d`` are flat (h*w, 3); returns stacked numpy-backed
    arrays of the same leading shape.

    The packed-sample budget is sized *per eval chunk*
    (``test_chunk_size * eval_samples_per_ray``) rather than inheriting a
    training budget sized for a different ray count — with grid skipping +
    sigma culling, 128 live samples/ray of headroom is generous.
    """
    n = rays_o.shape[0]
    chunk = test_chunk_size
    kwargs = dict(kwargs)
    kwargs["samples_budget"] = chunk * eval_samples_per_ray
    if kwargs.get("visible_samples_budget") is not None:
        kwargs["visible_samples_budget"] = chunk * (eval_samples_per_ray // 2)
    pad = (-n) % chunk
    timestamps = kwargs.pop("timestamps", None)
    if pad:
        rays_o = jnp.concatenate([rays_o, jnp.zeros((pad, 3), rays_o.dtype)])
        rays_d = jnp.concatenate(
            [rays_d, jnp.ones((pad, 3), rays_d.dtype) / np.sqrt(3.0)]
        )
        if timestamps is not None:
            timestamps = jnp.concatenate(
                [timestamps, jnp.zeros((pad, 1), timestamps.dtype)]
            )
    outs = []
    for i in range(0, n + pad, chunk):
        colors, opacities, depths, _ = render_rays(
            params, field, rays_o[i : i + chunk], rays_d[i : i + chunk],
            timestamps=None if timestamps is None else timestamps[i : i + chunk],
            **kwargs,
        )
        outs.append((colors, opacities, depths))
    colors = jnp.concatenate([o[0] for o in outs])[:n]
    opacities = jnp.concatenate([o[1] for o in outs])[:n]
    depths = jnp.concatenate([o[2] for o in outs])[:n]
    return colors, opacities, depths
