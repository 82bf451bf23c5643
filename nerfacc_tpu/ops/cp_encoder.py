"""Pallas TPU kernel: fused CP hat-basis feature encoding.

The XLA formulation of the CP level (``models/tensorf.py``) materializes
the (B, G) hat basis in HBM three times per level — ~2 GB of traffic per
step at 2^19 samples — because XLA cannot fuse an elementwise producer
into a dot operand. This kernel builds each axis basis in VMEM, runs the
(BLK, G) @ (G, R) matmul on the MXU, multiplies the three axis features,
and only ever writes the (B, R) output. The backward kernel recomputes the
bases (cheap VPU iota math) and accumulates the three table gradients
``hat_a(x)^T @ (g * u_b * u_c)`` across batch blocks — matmuls again, no
scatter anywhere.

Replaces nothing in the reference (tcnn's hash encoder is the analogous
fused-CUDA component, ``examples/radiance_fields/ngp.py:108-126``); the
factorized formulation is the TPU-native substitute (see models/tensorf).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 1024  # batch rows per program


def _use_interpret() -> bool:
    # Pallas TPU lowering is available on real TPUs (incl. the axon
    # tunnel); everywhere else (CPU tests) run the interpreter.
    return jax.default_backend() not in ("tpu", "axon")


def _hat(u, grid_size, dtype=jnp.bfloat16):
    """(BLK,) coords (pre-scaled to node units) -> (BLK, G) hat basis."""
    # tpu.iota only produces integers; cast to f32 after
    nodes = jax.lax.broadcasted_iota(
        jnp.int32, (u.shape[0], grid_size), 1
    ).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(u[:, None] - nodes)).astype(dtype)


def _fwd_kernel(x_ref, t0_ref, t1_ref, t2_ref, out_ref, *, grid_size):
    x = x_ref[:]  # (BLK, 3) f32 in [0, 1]
    feats = None
    for axis, t_ref in enumerate((t0_ref, t1_ref, t2_ref)):
        u = x[:, axis] * (grid_size - 1)
        basis = _hat(u, grid_size)
        ua = jnp.dot(
            basis, t_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        feats = ua if feats is None else feats * ua
    out_ref[:] = feats


def _fwd_res_kernel(
    x_ref, t0_ref, t1_ref, t2_ref, out_ref, u0_ref, u1_ref, u2_ref,
    *, grid_size
):
    """Forward that also writes the per-axis features as bf16 residuals
    (lets the backward skip re-running the three forward matmuls)."""
    x = x_ref[:]
    feats = None
    for axis, (t_ref, u_ref) in enumerate(
        ((t0_ref, u0_ref), (t1_ref, u1_ref), (t2_ref, u2_ref))
    ):
        u = x[:, axis] * (grid_size - 1)
        basis = _hat(u, grid_size)
        ua = jnp.dot(
            basis, t_ref[:].astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        u_ref[:] = ua.astype(jnp.bfloat16)
        feats = ua if feats is None else feats * ua
    out_ref[:] = feats


def _bwd_kernel(
    x_ref, t0_ref, t1_ref, t2_ref, g_ref,
    d0_ref, d1_ref, d2_ref, *, grid_size
):
    x = x_ref[:]
    g = g_ref[:]  # (BLK, R) f32
    bases = []
    us = []
    for axis, t_ref in enumerate((t0_ref, t1_ref, t2_ref)):
        u_coord = x[:, axis] * (grid_size - 1)
        basis = _hat(u_coord, grid_size)
        bases.append(basis)
        us.append(
            jnp.dot(
                basis, t_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        )
    first = pl.program_id(0) == 0
    for axis, d_ref in enumerate((d0_ref, d1_ref, d2_ref)):
        others = us[(axis + 1) % 3] * us[(axis + 2) % 3]
        # dT_a = basis_a^T @ (g * u_b * u_c)
        contrib = jax.lax.dot_general(
            bases[axis], (g * others).astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(first)
        def _(d_ref=d_ref, contrib=contrib):
            d_ref[:] = contrib

        @pl.when(jnp.logical_not(first))
        def _(d_ref=d_ref, contrib=contrib):
            d_ref[:] = d_ref[:] + contrib


def _bwd_res_kernel(
    x_ref, g_ref, u0_ref, u1_ref, u2_ref,
    d0_ref, d1_ref, d2_ref, *, grid_size
):
    """Table-gradient backward from saved residuals: per axis
    ``dT_a += hat_a(x)^T @ (g * u_b * u_c)``. No forward recompute, no
    (B, R) materialization — the ``d`` operand lives only in VMEM (the
    XLA path writes/reads 3x (B, R) bf16 through HBM, ~2 ms/step at
    2^19 samples)."""
    x = x_ref[:]
    g = g_ref[:]  # (BLK, R) bf16
    us = (u0_ref[:], u1_ref[:], u2_ref[:])
    first = pl.program_id(0) == 0
    for axis, d_ref in enumerate((d0_ref, d1_ref, d2_ref)):
        others = us[(axis + 1) % 3] * us[(axis + 2) % 3]
        u_coord = x[:, axis] * (grid_size - 1)
        basis = _hat(u_coord, grid_size)
        contrib = jax.lax.dot_general(
            basis, (g * others).astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(first)
        def _(d_ref=d_ref, contrib=contrib):
            d_ref[:] = contrib

        @pl.when(jnp.logical_not(first))
        def _(d_ref=d_ref, contrib=contrib):
            d_ref[:] = d_ref[:] + contrib


def _pad_rows(x, blk):
    n = x.shape[0]
    pad = (-n) % blk
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x, n


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def cp_level_features(xu, t0, t1, t2):
    """CP level features ``prod_axes hat(xu[:, a]) @ T_a`` — fused kernel.

    Args:
        xu: (B, 3) f32 coordinates in [0, 1]^3.
        t0, t1, t2: (G, R) f32 per-axis factor tables.

    Returns:
        (B, R) f32 features.
    """
    return _cp_fwd_impl(xu, t0, t1, t2)


def _cp_fwd_impl(xu, t0, t1, t2):
    G, R = t0.shape
    xp, n = _pad_rows(xu.astype(jnp.float32), BLK)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, grid_size=G),
        grid=(xp.shape[0] // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BLK, R), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], R), jnp.float32),
        interpret=_use_interpret(),
    )(xp, t0, t1, t2)
    return out[:n]


def _cp_fwd(xu, t0, t1, t2):
    return _cp_fwd_impl(xu, t0, t1, t2), (xu, t0, t1, t2)


def _cp_bwd(res, g):
    xu, t0, t1, t2 = res
    G, R = t0.shape
    xp, n = _pad_rows(xu.astype(jnp.float32), BLK)
    gp, _ = _pad_rows(g.astype(jnp.float32), BLK)
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, grid_size=G),
        grid=(xp.shape[0] // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, R), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, R), jnp.float32) for _ in range(3)
        ],
        interpret=_use_interpret(),
    )(xp, t0, t1, t2, gp)
    # no gradient w.r.t. positions (sampling is stop-gradient everywhere)
    return (jnp.zeros_like(xu), *grads)


cp_level_features.defvjp(_cp_fwd, _cp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def cp_level_features_res(xu, t0, t1, t2):
    """Like :func:`cp_level_features` but the backward consumes per-axis
    feature residuals saved by the forward instead of re-running the three
    forward matmuls — the right trade when the backward runs once per
    forward (training): bwd cost drops from 6 to 3 matmuls and the XLA
    path's 3x (B, R) ``d_u`` HBM round-trip disappears."""
    return _cp_fwd_res_impl(xu, t0, t1, t2)[0]


def _cp_fwd_res_impl(xu, t0, t1, t2):
    G, R = t0.shape
    xp, n = _pad_rows(xu.astype(jnp.float32), BLK)
    B = xp.shape[0]
    feats, u0, u1, u2 = pl.pallas_call(
        functools.partial(_fwd_res_kernel, grid_size=G),
        grid=(B // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, R), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BLK, R), lambda i: (i, 0), memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, R), jnp.float32),
            jax.ShapeDtypeStruct((B, R), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, R), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, R), jnp.bfloat16),
        ],
        interpret=_use_interpret(),
    )(xp, t0, t1, t2)
    return feats[:n], (u0, u1, u2)


def _cp_fwd_res(xu, t0, t1, t2):
    feats, us = _cp_fwd_res_impl(xu, t0, t1, t2)
    G = t0.shape[0]
    return feats, (xu, us, G, t0.shape[1])


def _cp_bwd_res(res, g):
    xu, (u0, u1, u2), G, R = res
    xp, n = _pad_rows(xu.astype(jnp.float32), BLK)
    gp, _ = _pad_rows(g.astype(jnp.bfloat16), BLK)
    B = xp.shape[0]
    grads = pl.pallas_call(
        functools.partial(_bwd_res_kernel, grid_size=G),
        grid=(B // BLK,),
        in_specs=[
            pl.BlockSpec((BLK, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, R), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, R), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, R), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, R), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G, R), lambda i: (0, 0), memory_space=pltpu.VMEM)
            for _ in range(3)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, R), jnp.float32) for _ in range(3)
        ],
        interpret=_use_interpret(),
    )(xp, gp, u0, u1, u2)
    return (jnp.zeros_like(xu), *grads)


cp_level_features_res.defvjp(_cp_fwd_res, _cp_bwd_res)
