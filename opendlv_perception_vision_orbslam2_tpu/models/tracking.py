"""Tracking front-end: motion-model visual odometry (the per-frame hot path).

Re-designs the reference's per-frame tracking pipeline
(Tracking::Track / TrackWithMotionModel / UpdateLastFrame, reference:
src/tracking.cpp:262-339, 696-757, 631-694) as one jitted device step:

  frame features + last-frame depth points
    -> projection-gated Hamming matching        (ops/matching.py)
    -> pose-only LM with chi2 reclassification  (optim/pose_opt.py)
    -> velocity update

State is a pure pytree; the host drives the loop and makes the few scalar
decisions (retry with widened search radius, lost detection) off small device
scalars, mirroring the reference's fallback ladder
(reference: src/tracking.cpp:1538-1640 UpdatePoses dispatch).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import lie
from ..ops import matching
from ..optim.pose_opt import PoseObs, pose_optimize, robust_pose_estimate
from ..utils.config import SystemConfig
from .frame import FrameState, features_scale_sigma2
from .frontend import process_stereo

MIN_MATCHES_MOTION = 20   # reference: src/tracking.cpp:744
MIN_INLIERS_POSE = 10     # reference: src/tracking.cpp:756
MAX_VO_POINTS = 100       # close/far VO point budget (reference:
                          # src/tracking.cpp:668-686)
SRC_BUDGET = 1024         # static source-point cap for the matchers: the
                          # usable set (close + nearest-100) rarely exceeds
                          # a few hundred points, so compacting sources to
                          # the closest 1024 halves every [S, K] matrix in
                          # the tracking stage with no semantic change (the
                          # reference's own temporal budget is 100)


class TrackState(NamedTuple):
    """Tracker pytree state between frames."""

    T_cw: jnp.ndarray        # [4, 4] current camera pose
    velocity: jnp.ndarray    # [4, 4] T_cur <- T_prev motion model
    last_frame: FrameState
    n_inliers: jnp.ndarray   # [] int32 (diagnostics / lost detection)


def _compact_sources(state: TrackState, th_far: float):
    """The SRC_BUDGET closest last-frame depth points, world coords + masks.

    Mirrors UpdateLastFrame's temporal-point selection (reference:
    src/tracking.cpp:631-694): usable = close points (depth <
    thDepth*baseline) plus the nearest remaining ones up to MAX_VO_POINTS.
    One depth argsort yields the compaction order AND both selection rules
    (sorted-by-depth position < MAX_VO_POINTS == the reference's nearest-N
    rule; close points are a prefix of the same order).

    Returns ``(src_idx [S], p_w [S,3], usable [S], desc/octave/angle/depth)``.
    """
    feats = state.last_frame.features
    depth = feats.depth
    has_depth = (depth > 0) & feats.valid
    order = jnp.argsort(jnp.where(has_depth, depth, jnp.inf))
    src = order[:SRC_BUDGET]

    d_s = jnp.take(depth, src)
    hd_s = jnp.take(has_depth, src)
    pos = jnp.arange(src.shape[0])  # == min(SRC_BUDGET, capacity)
    usable = hd_s & ((d_s < th_far) | (pos < MAX_VO_POINTS))

    T_wc = lie.inv_T(state.last_frame.T_cw)
    p_cam = jnp.take(state.last_frame.point_cam, src, axis=0)
    p_w = lie.transform_points(T_wc[None], p_cam[None])[0]
    return (
        src, p_w, usable,
        jnp.take(feats.desc, src, axis=0),
        jnp.take(feats.octave, src),
        jnp.take(feats.angle, src),
        d_s,
    )


@functools.partial(jax.jit, static_argnums=(2, 3))
def motion_model_step(state: TrackState, cur_frame: FrameState,
                      config: SystemConfig, radius_mult: int = 1):
    """One tracking step: returns ``(T_cw, inlier_count, match_count)``.

    The reference retries with a doubled search radius when matches < 20
    (reference: src/tracking.cpp:744-748).  Here the retry ladder
    (x1 -> x2 -> x8, the last widening bootstraps tracking while the motion
    model is still empty, covering TrackReferenceKeyFrame's role until BoW
    matching lands) runs *inside* the jitted step: the Hamming matrix is
    shared, only the cheap gating masks differ, and the first rung with
    >= MIN_MATCHES_MOTION matches wins via masked select — branch-free.
    ``radius_mult`` additionally scales every rung (host-driven override).
    """
    cam = config.camera
    T_pred = state.velocity @ state.T_cw

    th_far = config.tracking.th_depth * cam.baseline_m
    _, p_w, usable, desc_s, oct_s, ang_s, d_s = _compact_sources(state, th_far)

    m, n_matches = matching.motion_ladder_match(
        p_w, usable, desc_s, oct_s, ang_s, d_s,
        cur_frame.features, T_pred,
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf,
        width=cam.width, height=cam.height,
        scale_factor=config.orb.scale_factor,
        z_motion=state.velocity[2, 3], baseline=cam.baseline_m,
        th_far=th_far, radius_mult=radius_mult,
        min_matches=MIN_MATCHES_MOTION,
    )

    dst = m.dst_idx
    sigma2 = features_scale_sigma2(cur_frame.features, config.orb.scale_factor)
    obs = PoseObs(
        p_w=p_w,
        uv=jnp.take(cur_frame.features.xy, dst, axis=0),
        u_right=jnp.take(cur_frame.features.u_right, dst, axis=0),
        sigma2=jnp.take(sigma2, dst, axis=0),
        valid=m.valid,
    )
    T_new, inliers, n_inliers = robust_pose_estimate(
        T_pred, obs, jax.random.PRNGKey(0),
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf,
    )
    return T_new, n_inliers, n_matches


@functools.partial(jax.jit, static_argnums=(3,))
def vo_step(state: TrackState, img_left, img_right, config: SystemConfig,
            timestamp=0.0):
    """Fused front-end + tracking step — the benchmarkable per-frame program.

    Returns ``(new_state, T_cw)``.  This is BASELINE config 1 ("tracking-only,
    const-velocity + motion-model matching").
    """
    cur = process_stereo(img_left, img_right, config, timestamp)
    T_new, n_inliers, _ = motion_model_step(state, cur, config, 1)
    cur = cur._replace(T_cw=T_new)
    velocity = T_new @ lie.inv_T(state.T_cw)
    new_state = TrackState(
        T_cw=T_new, velocity=velocity, last_frame=cur, n_inliers=n_inliers
    )
    return new_state, T_new


def init_state(first_frame: FrameState) -> TrackState:
    """Stereo initialization: world = first camera frame, identity pose
    (StereoInitialization, reference: src/tracking.cpp:342-395; the >500
    feature gate is the host's job)."""
    return TrackState(
        T_cw=jnp.eye(4, dtype=jnp.float32),
        velocity=jnp.eye(4, dtype=jnp.float32),
        last_frame=first_frame,
        n_inliers=jnp.asarray(0, jnp.int32),
    )


class StereoVisualOdometry:
    """Host-side driver: retry ladder + lost bookkeeping around the jitted
    steps.  The minimum end-to-end slice (SURVEY.md section 7 step 4)."""

    def __init__(self, config: SystemConfig):
        self.config = config
        self.state: TrackState | None = None
        self.trajectory: list = []
        self.lost = False

    def process(self, img_left, img_right, timestamp: float = 0.0):
        img_left = jnp.asarray(img_left, jnp.float32)
        img_right = jnp.asarray(img_right, jnp.float32)
        if self.state is None:
            frame = process_stereo(img_left, img_right, self.config, timestamp)
            n = int(jnp.sum(frame.features.depth > 0))
            if n < 100:  # stereo init needs enough depth points
                return None
            self.state = init_state(frame)
            self.trajectory.append(jnp.eye(4))
            return self.state.T_cw

        cur = process_stereo(img_left, img_right, self.config, timestamp)
        T_new, n_inl, n_match = motion_model_step(self.state, cur, self.config, 1)
        self.lost = int(n_inl) < MIN_INLIERS_POSE
        cur = cur._replace(T_cw=T_new)
        velocity = T_new @ lie.inv_T(self.state.T_cw)
        self.state = TrackState(
            T_cw=T_new, velocity=velocity, last_frame=cur, n_inliers=n_inl
        )
        self.trajectory.append(T_new)
        return T_new
