"""Pose-graph optimization (essential graph) as dense batched Gauss-Newton.

Replaces OptimizeEssentialGraph (reference: src/orboptimizer.cpp:799-1061):
g2o Sim3 vertices with loop / spanning-tree / strong-covisibility edges,
20 LM iterations, then SE3 recovery.  For the stereo/RGB-D path the
reference fixes scale (``_fix_scale``), making vertices effectively SE3 —
this implementation optimizes SE3 vertices (7-DoF Sim3 for the monocular
path rides on the same machinery via a scale column; planned with the mono
pipeline).

TPU-native shape: all K vertex poses live in one ``[K, 6]`` tangent update;
per-edge 6x12 Jacobians come from forward-mode autodiff of the relative-pose
residual (no hand-derived adjoints to get wrong), the normal system
assembles by scatter-add of 4 blocks per edge into a dense ``[6K, 6K]``
matrix — small for any realistic keyframe count — and solves on the MXU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import lie


class PoseGraphProblem(NamedTuple):
    T: jnp.ndarray          # [K, 4, 4] initial vertex poses (T_cw)
    v_valid: jnp.ndarray    # [K] bool
    v_fixed: jnp.ndarray    # [K] bool (loop KF is fixed, reference :858)
    e_i: jnp.ndarray        # [E] int32 source vertex
    e_j: jnp.ndarray        # [E] int32 target vertex
    e_T_ij: jnp.ndarray     # [E, 4, 4] measured relative pose T_i * T_j^-1
    e_weight: jnp.ndarray   # [E] float32 information scale
    e_valid: jnp.ndarray    # [E] bool


def edge_residual(dx_i, dx_j, T_i, T_j, T_ij_meas):
    """r = log_se3( T_ij_meas * (exp(dx_j) T_j) * (exp(dx_i) T_i)^-1 )."""
    Ti = lie.exp_se3(dx_i) @ T_i
    Tj = lie.exp_se3(dx_j) @ T_j
    return lie.log_se3(T_ij_meas @ Tj @ lie.inv_T(Ti))


@functools.partial(jax.jit, static_argnames=("n_iters",))
def optimize_pose_graph(prob: PoseGraphProblem, n_iters: int = 20):
    """Returns optimized poses ``[K, 4, 4]``."""
    K = prob.T.shape[0]

    def iteration(T_all, _):
        T_i = jnp.take(T_all, prob.e_i, axis=0)
        T_j = jnp.take(T_all, prob.e_j, axis=0)
        zeros = jnp.zeros((prob.e_i.shape[0], 6), T_all.dtype)

        r = jax.vmap(edge_residual)(zeros, zeros, T_i, T_j, prob.e_T_ij)
        J_i = jax.vmap(
            jax.jacfwd(edge_residual, argnums=0)
        )(zeros, zeros, T_i, T_j, prob.e_T_ij)              # [E, 6, 6]
        J_j = jax.vmap(
            jax.jacfwd(edge_residual, argnums=1)
        )(zeros, zeros, T_i, T_j, prob.e_T_ij)

        free_i = jnp.take(prob.v_valid & ~prob.v_fixed, prob.e_i)
        free_j = jnp.take(prob.v_valid & ~prob.v_fixed, prob.e_j)
        w = jnp.where(prob.e_valid, prob.e_weight, 0.0)
        J_i = J_i * (w * free_i)[:, None, None]
        J_j = J_j * (w * free_j)[:, None, None]
        rw = r * w[:, None]

        H = jnp.zeros((K, 6, K, 6), T_all.dtype)
        H = H.at[prob.e_i, :, prob.e_i, :].add(
            jnp.einsum("eri,erj->eij", J_i, J_i)
        )
        H = H.at[prob.e_j, :, prob.e_j, :].add(
            jnp.einsum("eri,erj->eij", J_j, J_j)
        )
        H = H.at[prob.e_i, :, prob.e_j, :].add(
            jnp.einsum("eri,erj->eij", J_i, J_j)
        )
        H = H.at[prob.e_j, :, prob.e_i, :].add(
            jnp.einsum("eri,erj->eij", J_j, J_i)
        )
        b = jnp.zeros((K, 6), T_all.dtype)
        b = b.at[prob.e_i].add(-jnp.einsum("eri,er->ei", J_i, rw))
        b = b.at[prob.e_j].add(-jnp.einsum("eri,er->ei", J_j, rw))

        # pin fixed/invalid vertices with identity blocks
        free = prob.v_valid & ~prob.v_fixed
        eye6 = jnp.eye(6, dtype=T_all.dtype)
        diag_fix = jnp.where(free[:, None, None], 0.0, eye6[None])
        idx = jnp.arange(K)
        H = H.at[idx, :, idx, :].add(diag_fix + 1e-6 * eye6[None])
        b = jnp.where(free[:, None], b, 0.0)

        dx = jnp.linalg.solve(H.reshape(K * 6, K * 6), b.reshape(K * 6))
        dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, 0.0).reshape(K, 6)
        dx = jnp.where(free[:, None], dx, 0.0)
        T_new = jax.vmap(lambda d, T: lie.exp_se3(d) @ T)(dx, T_all)
        return T_new, None

    T_out, _ = jax.lax.scan(iteration, prob.T, None, length=n_iters)
    return T_out


def relative_pose(T_i, T_j):
    """Measured edge transform ``T_ij = T_i * T_j^-1``."""
    return T_i @ lie.inv_T(T_j)
