"""Full-map global bundle adjustment extraction + write-back.

RunGlobalBundleAdjustment equivalent (reference: src/loopclosing.cpp:645-750):
after a loop correction, refine every keyframe pose and map point.  The
reference spawns a detached, abortable GBA thread and propagates results
through the spanning tree under the map lock; here the whole map converts to
one flat edge list (every [K, F] binding is an edge), the matrix-free
Schur-CG adjuster runs as a single device program, and write-back is a pure
array swap — abort = drop the result.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..optim.ba import BAProblem
from ..optim.gba import global_bundle_adjust
from ..utils.config import SystemConfig
from .map_state import MapState, recompute_covisibility


@jax.jit
def extract_global_ba(m: MapState, scale_factor: float = 1.2) -> BAProblem:
    """All keyframes optimizable (oldest pinned by the caller's
    fix_first_pose through slot reordering is unnecessary: slot order is
    insertion order, and the reference fixes keyframe 0 too,
    reference: src/orboptimizer.cpp:84-86)."""
    K, F, P = m.kf_capacity, m.feat_capacity, m.pt_capacity
    bound = m.kf_feat_valid & (m.kf_obs_point >= 0) & m.kf_valid[:, None]
    e_kf = jnp.broadcast_to(
        jnp.arange(K, dtype=jnp.int32)[:, None], (K, F)
    ).reshape(-1)
    e_pt = jnp.clip(m.kf_obs_point, 0, P - 1).reshape(-1)
    sigma2 = jnp.power(
        jnp.float32(scale_factor), 2.0 * m.kf_octave.astype(jnp.float32)
    ).reshape(-1)
    return BAProblem(
        T_opt=m.kf_T_cw,
        opt_valid=m.kf_valid,
        T_fix=jnp.eye(4, dtype=jnp.float32)[None],
        fix_valid=jnp.zeros((1,), bool),
        pts=m.pt_pos,
        pt_valid=m.pt_valid,
        e_kf=e_kf,
        e_pt=e_pt,
        e_uv=m.kf_xy.reshape(-1, 2),
        e_ur=m.kf_uright.reshape(-1),
        e_sigma2=sigma2,
        e_valid=bound.reshape(-1),
    )


def run_global_ba(m: MapState, config: SystemConfig, n_outer: int = 10,
                  cg_iters: int = 40) -> MapState:
    cam = config.camera
    prob = extract_global_ba(m, config.orb.scale_factor)
    T_opt, pts, _ = global_bundle_adjust(
        prob, fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf,
        n_outer=n_outer, cg_iters=cg_iters, fix_first_pose=True,
    )
    m = m._replace(
        kf_T_cw=jnp.where(m.kf_valid[:, None, None], T_opt, m.kf_T_cw),
        pt_pos=jnp.where(m.pt_valid[:, None], pts, m.pt_pos),
    )
    return m._replace(covis=recompute_covisibility(m))
