"""Observation-sharded pose optimization over a device mesh.

The reference has no distributed compute at all (single-process pthreads,
SURVEY.md section 2.3 P8); this module is the new parallelism the TPU target
requires: reprojection residual/Jacobian evaluation shards over the
observation axis, each device reduces its local 6x6 normal-equation block,
and an ``psum`` over the mesh assembles the global system — the exact
pattern the sharded bundle adjuster scales up (camera systems via psum,
landmark blocks local to their shard).

Uses ``shard_map`` so the collective schedule is explicit and rides ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import lie
from ..optim.pose_opt import PoseObs, _residuals_jacobian, _chi2, CHI2_MONO, CHI2_STEREO


def pad_obs_to_multiple(obs: PoseObs, n_shards: int) -> PoseObs:
    """Pad observation slots so the leading axis divides the mesh size."""
    k = obs.p_w.shape[0]
    rem = (-k) % n_shards
    if rem == 0:
        return obs
    pad = lambda a, fill=0: jnp.concatenate(
        [a, jnp.full((rem,) + a.shape[1:], fill, a.dtype)], axis=0
    )
    return PoseObs(
        p_w=pad(obs.p_w),
        uv=pad(obs.uv),
        u_right=pad(obs.u_right, -1),
        sigma2=pad(obs.sigma2, 1),
        valid=pad(obs.valid, False),
    )


def make_sharded_pose_optimizer(mesh: Mesh, axis: str, *, fx, fy, cx, cy, bf,
                                n_iters: int = 10):
    """Build a jitted pose optimizer whose observations shard over ``axis``.

    Returns ``fn(T_cw_init, obs) -> (T_cw, n_inliers)`` where every leaf of
    ``obs`` is sharded on its leading axis.
    """

    def local_normal_system(T, obs: PoseObs):
        r, J, is_stereo, behind = _residuals_jacobian(T, obs, fx, fy, cx, cy, bf)
        active = obs.valid & (~behind)
        chi = jnp.sqrt(jnp.maximum(_chi2(r, obs.sigma2, is_stereo), 1e-12))
        delta = jnp.where(is_stereo, jnp.sqrt(CHI2_STEREO), jnp.sqrt(CHI2_MONO))
        huber_w = jnp.where(chi <= delta, 1.0, delta / chi)
        w = jnp.where(active, huber_w / obs.sigma2, 0.0)
        row_w = jnp.stack(
            [jnp.ones_like(w), jnp.ones_like(w),
             jnp.where(is_stereo, 1.0, 0.0)], axis=-1
        ) * w[:, None]
        H = jnp.einsum("kri,kr,krj->ij", J, row_w, J)
        b = -jnp.einsum("kri,kr->i", J, row_w * r)
        th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
        n_inl = jnp.sum(active & (_chi2(r, obs.sigma2, is_stereo) <= th))
        return H, b, n_inl

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), PoseObs(P(axis), P(axis), P(axis), P(axis), P(axis))),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _sharded(T0, obs):
        def body(_, T):
            H_local, b_local, _ = local_normal_system(T, obs)
            # The one collective: 6x6 + 6 reduction over ICI.
            H = jax.lax.psum(H_local, axis)
            b = jax.lax.psum(b_local, axis)
            dx = jnp.linalg.solve(H + 1e-5 * jnp.eye(6, dtype=H.dtype), b)
            dx = jnp.where(jnp.all(jnp.isfinite(dx)), dx, jnp.zeros_like(dx))
            return lie.exp_se3(dx) @ T

        T = jax.lax.fori_loop(0, n_iters, body, T0)
        _, _, n_local = local_normal_system(T, obs)
        return T, jax.lax.psum(n_local, axis)

    return jax.jit(_sharded)
