"""Full stereo SLAM pipeline: tracking against the map + local mapping.

This is the array re-design of the reference's tracking/mapping duet
(Tracking::Track with TrackWithMotionModel -> TrackLocalMap -> NeedNewKeyFrame
-> CreateNewKeyFrame, reference: src/tracking.cpp:262-339, 696-976, and the
Mapping thread consuming the keyframe queue, reference: src/mapping.cpp:48-116).

Thread structure -> staged pipeline (SURVEY.md section 7): the per-frame
device step is one jitted program; keyframe insertion + local BA run as a
second jitted stage invoked by the host scheduler when the keyframe decision
fires — same semantics, no locks.

Frame<->map binding: ``bindings [F] int32`` maps current-frame feature slots
to map point slots (-1 = none) — the array analogue of
``OrbFrame::m_mapPoints`` (reference: include/orbframe.hpp:157).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie, matching
from ..ops.hamming import MAX_DIST, TH_HIGH, hamming_matrix
from ..optim.pose_opt import PoseObs, pose_optimize, robust_pose_estimate
from ..utils.config import SystemConfig
from .frame import FrameState, features_scale_sigma2
from .frontend import process_stereo
from .fusion import run_fusion
from .local_mapping import local_mapping_step
from .map_state import MapState, empty_map, insert_keyframe, cull_points, cull_keyframes
from .tracking import MIN_MATCHES_MOTION

N_LOCAL_KFS = 10       # local-map keyframe window (reference caps at 80,
                       # src/tracking.cpp:1121; 10 covers the covisible core)
PL_TRACK = 8192        # local point capacity for frame tracking
MIN_INLIERS_MAP = 30   # TrackLocalMap acceptance (reference: src/tracking.cpp:800)


class TrackOutputs(NamedTuple):
    T_cw: jnp.ndarray
    bindings: jnp.ndarray       # [F] point slot per current feature (-1 none)
    n_inliers: jnp.ndarray      # after local-map pose optimization
    n_matches_mm: jnp.ndarray   # motion-model matches
    n_tracked_close: jnp.ndarray
    n_untracked_close: jnp.ndarray
    pt_visible_delta: jnp.ndarray  # [P] int32 (visible counter updates)
    pt_found_delta: jnp.ndarray    # [P] int32


def _motion_model_match(m: MapState, last_frame: FrameState, last_bindings,
                        T_pred, velocity, cur_frame: FrameState,
                        config: SystemConfig):
    """Projection match vs last frame with the multi-radius ladder; source
    world positions come from the map for bound features and from last-frame
    stereo unprojection for temporal VO points (UpdateLastFrame semantics,
    reference: src/tracking.cpp:631-694)."""
    cam = config.camera
    feats_last = last_frame.features
    P = m.pt_capacity

    bound = last_bindings >= 0
    safe_b = jnp.clip(last_bindings, 0, P - 1)
    p_w_map = m.pt_pos[safe_b]
    T_wc = lie.inv_T(last_frame.T_cw)
    p_w_vo = lie.transform_points(T_wc[None], last_frame.point_cam[None])[0]
    p_w = jnp.where(bound[:, None], p_w_map, p_w_vo)
    th_far = config.tracking.th_depth * cam.baseline_m
    has_depth = (feats_last.depth > 0) & feats_last.valid
    usable = (bound & m.pt_valid[safe_b] & feats_last.valid) | (
        has_depth & (feats_last.depth < th_far)
    )

    mm, n = matching.motion_ladder_match(
        p_w, usable, feats_last.desc, feats_last.octave, feats_last.angle,
        feats_last.depth, cur_frame.features, T_pred,
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf,
        width=cam.width, height=cam.height,
        scale_factor=config.orb.scale_factor,
        z_motion=velocity[2, 3], baseline=cam.baseline_m,
        th_far=th_far, min_matches=MIN_MATCHES_MOTION,
    )
    return mm, p_w, n


def _local_point_window(m: MapState, bindings):
    """Local map = points of the keyframes sharing points with the current
    frame (UpdateLocalKeyFrames/UpdateLocalPoints, reference:
    src/tracking.cpp:1031-1175).  Returns ``local_pts [PL]`` map slots."""
    K, F, P = m.kf_capacity, m.feat_capacity, m.pt_capacity
    cur_bound = jnp.zeros((P,), bool).at[
        jnp.where(bindings >= 0, bindings, P - 1)
    ].set(bindings >= 0)
    cur_bound = cur_bound.at[P - 1].set(False)

    # keyframes ranked by shared-point count (one [K,F] gather)
    sees = jnp.where(
        m.kf_feat_valid & (m.kf_obs_point >= 0),
        jnp.take(cur_bound, jnp.clip(m.kf_obs_point, 0, P - 1)),
        False,
    ) & m.kf_valid[:, None]
    share = jnp.sum(sees, axis=1)
    top_w, top_kfs = jax.lax.top_k(share, N_LOCAL_KFS)
    kf_ok = top_w > 0

    binds = m.kf_obs_point[top_kfs]                         # [NK, F]
    b_ok = m.kf_feat_valid[top_kfs] & (binds >= 0) & kf_ok[:, None]
    pt_in = jnp.zeros((P,), bool).at[
        jnp.where(b_ok, binds, P - 1)
    ].set(b_ok)
    pt_in = pt_in.at[P - 1].set(False) & m.pt_valid

    rank = jnp.cumsum(pt_in.astype(jnp.int32)) - 1
    g2l = jnp.where(pt_in & (rank < PL_TRACK), rank, -1)
    local_pts = jnp.full((PL_TRACK,), -1, jnp.int32).at[
        jnp.where(g2l >= 0, g2l, PL_TRACK - 1)
    ].set(jnp.where(g2l >= 0, jnp.arange(P, dtype=jnp.int32), -1))
    return local_pts


def _search_local_points(m: MapState, local_pts, bindings, T_cw,
                         cur_frame: FrameState, config: SystemConfig):
    """Project unbound local points into the frame and match by descriptor
    (SearchLocalPoints + matcher SearchByProjection(frame, local map),
    reference: src/tracking.cpp:978-1029, src/orbmatcher.cpp:42-128).

    Returns (new bindings, visible local mask -> [P] visible delta)."""
    cam = config.camera
    P = m.pt_capacity
    PL = local_pts.shape[0]
    ok = local_pts >= 0
    slots = jnp.clip(local_pts, 0, P - 1)
    # skip points already bound to this frame
    already = jnp.zeros((P,), bool).at[
        jnp.where(bindings >= 0, bindings, P - 1)
    ].set(bindings >= 0)
    ok = ok & ~jnp.take(already, slots)

    p_w = m.pt_pos[slots]
    p_c = lie.transform_points(T_cw[None], p_w[None])[0]
    z = p_c[:, 2]
    uv = lie.project(p_c, cam.fx, cam.fy, cam.cx, cam.cy)
    cam_center = lie.inv_T(T_cw)[:3, 3]
    view = p_w - cam_center
    dist_w = jnp.linalg.norm(view, axis=-1) + 1e-9
    # frustum + scale band + viewing angle (IsInFrustum, reference:
    # src/orbframe.cpp:239-305: viewCos > 0.5)
    view_cos = jnp.sum(view * m.pt_normal[slots], axis=-1) / dist_w
    in_frustum = (
        (z > 0.1)
        & (uv[:, 0] >= 0) & (uv[:, 0] < cam.width)
        & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
        & (dist_w >= 0.8 * m.pt_min_dist[slots])
        & (dist_w <= 1.2 * m.pt_max_dist[slots])
        & (view_cos > 0.5)
    )
    visible = ok & in_frustum

    # predicted octave from distance (PredictScale, reference:
    # src/orbmappoint.cpp:445-476)
    ratio = jnp.maximum(m.pt_max_dist[slots] / jnp.maximum(dist_w, 1e-6), 1.0)
    pred_oct = jnp.clip(
        jnp.ceil(jnp.log(ratio) / jnp.log(config.orb.scale_factor)).astype(jnp.int32),
        0, config.orb.n_levels - 1,
    )
    radius = jnp.where(view_cos > 0.998, 2.5, 4.0) * jnp.power(
        jnp.float32(config.orb.scale_factor), pred_oct.astype(jnp.float32)
    )

    feats = cur_frame.features
    d_uv = feats.xy[None, :, :] - uv[:, None, :]
    within = jnp.maximum(jnp.abs(d_uv[..., 0]), jnp.abs(d_uv[..., 1])) <= radius[:, None]
    oct_ok = (feats.octave[None, :] >= pred_oct[:, None] - 1) & (
        feats.octave[None, :] <= pred_oct[:, None] + 1
    )
    unbound_dst = bindings < 0
    gate = (
        within & oct_ok & visible[:, None]
        & feats.valid[None, :] & unbound_dst[None, :]
    )
    dmat = hamming_matrix(m.pt_desc[slots], feats.desc)
    big = MAX_DIST + 1
    d = jnp.where(gate, dmat, big)
    best = jnp.argmin(d, axis=1)
    best_d = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]
    d2 = d.at[jnp.arange(PL), best].set(big)
    second = jnp.min(d2, axis=1)
    # ratio test 0.8 + TH_HIGH (reference: src/orbmatcher.cpp:109-123)
    good = (best_d <= TH_HIGH) & (
        best_d.astype(jnp.float32) <= 0.8 * second.astype(jnp.float32)
    )
    pm = matching.resolve_duplicate_targets(
        matching.ProjectionMatches(dst_idx=best, dist=best_d, valid=good),
        feats.capacity,
    )
    # write new bindings
    new_bindings = bindings.at[
        jnp.where(pm.valid, pm.dst_idx, feats.capacity - 1)
    ].max(jnp.where(pm.valid, slots, -1))
    vis_delta = jnp.zeros((P,), jnp.int32).at[
        jnp.where(visible, slots, P - 1)
    ].add(visible.astype(jnp.int32))
    vis_delta = vis_delta.at[P - 1].set(0)
    return new_bindings, vis_delta


@functools.partial(jax.jit, static_argnums=(6,))
def track_frame_with_map(m: MapState, last_frame: FrameState, last_bindings,
                         T_cw, velocity, cur_frame: FrameState,
                         config: SystemConfig) -> TrackOutputs:
    """The per-frame device program for the full pipeline."""
    cam = config.camera
    P = m.pt_capacity
    F = cur_frame.features.capacity
    T_pred = velocity @ T_cw

    # --- stage 1: motion-model matching + first pose optimization --------
    mm, p_w_src, n_mm = _motion_model_match(
        m, last_frame, last_bindings, T_pred, velocity, cur_frame, config
    )
    sigma2 = features_scale_sigma2(cur_frame.features, config.orb.scale_factor)
    dst = mm.dst_idx
    obs1 = PoseObs(
        p_w=p_w_src,
        uv=jnp.take(cur_frame.features.xy, dst, axis=0),
        u_right=jnp.take(cur_frame.features.u_right, dst, axis=0),
        sigma2=jnp.take(sigma2, dst, axis=0),
        valid=mm.valid,
    )
    T1, _, _ = robust_pose_estimate(
        T_pred, obs1, jax.random.PRNGKey(0),
        fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf,
    )

    # inherit map bindings through the match (cur feature <- last feature)
    inherited = jnp.full((F,), -1, jnp.int32).at[
        jnp.where(mm.valid, mm.dst_idx, F - 1)
    ].max(jnp.where(mm.valid, last_bindings, -1))

    # --- stage 2: local-map search + second pose optimization ------------
    local_pts = _local_point_window(m, inherited)
    bindings, vis_delta = _search_local_points(
        m, local_pts, inherited, T1, cur_frame, config
    )

    bound = bindings >= 0
    safe_b = jnp.clip(bindings, 0, P - 1)
    obs2 = PoseObs(
        p_w=m.pt_pos[safe_b],
        uv=cur_frame.features.xy,
        u_right=cur_frame.features.u_right,
        sigma2=sigma2,
        valid=bound & m.pt_valid[safe_b] & cur_frame.features.valid,
    )
    T2, inliers, n_inl = pose_optimize(
        T1, obs2, fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf
    )
    # drop outlier bindings (reference removes them post-opt,
    # src/tracking.cpp:783-798)
    bindings = jnp.where(obs2.valid & inliers, bindings, -1)

    found_delta = jnp.zeros((P,), jnp.int32).at[
        jnp.where(bindings >= 0, bindings, P - 1)
    ].add((bindings >= 0).astype(jnp.int32))
    found_delta = found_delta.at[P - 1].set(0)

    # keyframe-decision stats (NeedNewKeyFrame, reference:
    # src/tracking.cpp:832-866): close tracked vs close untracked
    th_far = config.tracking.th_depth * cam.baseline_m
    depth = cur_frame.features.depth
    close = (depth > 0) & (depth < th_far) & cur_frame.features.valid
    n_tracked_close = jnp.sum(close & (bindings >= 0))
    n_untracked_close = jnp.sum(close & (bindings < 0))

    return TrackOutputs(
        T_cw=T2,
        bindings=bindings,
        n_inliers=n_inl,
        n_matches_mm=n_mm,
        n_tracked_close=n_tracked_close,
        n_untracked_close=n_untracked_close,
        pt_visible_delta=vis_delta,
        pt_found_delta=found_delta,
    )


@jax.jit
def apply_point_counters(m: MapState, vis_delta, found_delta) -> MapState:
    return m._replace(
        pt_visible=m.pt_visible + vis_delta,
        pt_found=m.pt_found + found_delta,
    )


@functools.partial(
    jax.jit,
    static_argnames=("config", "do_triangulate", "do_fuse", "do_lba",
                     "do_cull"),
)
def keyframe_stage(m: MapState, frame, bindings, config: SystemConfig,
                   do_triangulate: bool, do_fuse: bool, do_lba: bool,
                   do_cull: bool):
    """The ENTIRE mapping-thread work for one keyframe as ONE device
    program: evict -> insert -> point-cull -> triangulate -> fuse -> local
    BA -> keyframe-cull -> covisibility rebuild.

    This is the reference Mapping::Run loop body (src/mapping.cpp:48-116)
    fused for the device: a single dispatch (no per-pass host round-trips,
    which cost a full tunnel RTT each on remote TPU), ONE observation-count
    recount threaded incrementally through every pass (each pass used to
    recount: a [K*F]-slot scatter, ~35 ms at KITTI capacities), and ONE
    covisibility rebuild at the end (insert refreshes just its own row).

    Returns ``(m, slot)``; the do_* flags mirror the n_keyframes>=N
    bootstrap ramp and are static (4 early-map variants, then steady state).
    """
    from .map_state import (
        evict_oldest_if_full,
        point_observation_counts,
        recompute_covisibility,
    )
    from .triangulation import create_new_map_points

    th_far = config.tracking.th_depth * config.camera.baseline_m
    m = evict_oldest_if_full(m)
    m, slot = insert_keyframe(m, frame, bindings, th_far, covis_mode="row")
    counts = point_observation_counts(m)
    m, counts = cull_points(m, m.next_kf_id - 1, counts=counts)
    if do_triangulate:
        m, counts = create_new_map_points(
            m, slot, config, n_neighbors=10, update_covis=False,
            counts=counts,
        )
    if do_fuse:
        m, counts = run_fusion(m, slot, config, update_covis=False,
                               counts=counts)
    if do_lba:
        m, counts = local_mapping_step(m, slot, config, update_covis=False,
                                       counts=counts)
    if do_cull:
        m = cull_keyframes(m, slot, update_covis=False, counts=counts)
    m = m._replace(covis=recompute_covisibility(m))
    return m, slot


class StereoSlam:
    """Host scheduler for the full pipeline (BASELINE configs 2-3):
    per-frame tracking stage + keyframe/local-BA stage + loop closing +
    relocalization, mirroring the reference's Selflocalization orchestration
    (reference: src/selflocalization.cpp:330-377 wiring)."""

    def __init__(self, config: SystemConfig, vocab=None,
                 enable_loop_closing: bool = True,
                 enable_relocalization: bool = True):
        self.config = config
        self.map = empty_map(
            config.max_keyframes, config.max_map_points, config.orb.max_keypoints
        )
        self.T_cw = jnp.eye(4, dtype=jnp.float32)
        self.velocity = jnp.eye(4, dtype=jnp.float32)
        self.last_frame: FrameState | None = None
        self.last_bindings = None
        self.frames_since_kf = 0
        self.ref_kf_tracked = 0
        self.trajectory: list = []
        self.lost = False
        self.n_keyframes = 0
        # place recognition state (vocabulary may arrive lazily: the
        # reference loads ORBvoc.txt which does not ship; we train from the
        # first keyframe's descriptors when none is given)
        self.vocab = vocab
        self.enable_loop_closing = enable_loop_closing
        self.enable_relocalization = enable_relocalization
        self.db = None
        self.kf_nodes = None
        self.loop_closer = None
        self.pending_gba = None
        self.loops_closed = 0
        self.pending_gba = None   # in-flight incremental post-loop GBA
        self._reloc_key = jax.random.PRNGKey(11)

    def _ensure_vocab(self, frame: FrameState):
        if self.vocab is not None or not (
            self.enable_loop_closing or self.enable_relocalization
        ):
            return
        from . import vocabulary as voc

        descs = np.asarray(frame.features.desc)[np.asarray(frame.features.valid)]
        if len(descs) < 64:
            return
        self.vocab = voc.train_vocabulary(descs, branching=8, levels=3, seed=0)

    def _register_keyframe(self, slot: int):
        """BoW row + node table + loop detection for a new keyframe."""
        if self.vocab is None:
            return
        from . import vocabulary as voc
        from .kfdb import add_keyframe, empty_kfdb
        from .loop_closing import LoopCloser

        if self.db is None:
            self.db = empty_kfdb(self.config.max_keyframes, self.vocab.n_words)
            self.kf_nodes = -jnp.ones(
                (self.config.max_keyframes, self.config.orb.max_keypoints),
                jnp.int32,
            )
            self.loop_closer = LoopCloser(self.config)
            self.loop_closer.defer_gba = True

        words, nodes = voc.transform(
            self.vocab, self.map.kf_desc[slot], self.map.kf_feat_valid[slot]
        )
        self.db = add_keyframe(self.db, slot, voc.bow_vector(self.vocab, words))
        self.kf_nodes = self.kf_nodes.at[slot].set(nodes)
        # drop rows of culled keyframes
        self.db = self.db._replace(has_row=self.db.has_row & self.map.kf_valid)

        if self.enable_loop_closing and self.loop_closer is not None:
            self.map, closed, T_corr = self.loop_closer.on_keyframe(
                self.map, self.db, self.kf_nodes, slot
            )
            if closed:
                self.loops_closed += 1
                self.T_cw = self.map.kf_T_cw[slot]
                self.velocity = jnp.eye(4, dtype=jnp.float32)
                # schedule the full-map refinement incrementally; a newer
                # closure aborts (drops) any in-flight solve (reference:
                # src/loopclosing.cpp:409-420 mbStopGBA)
                from .global_ba import IncrementalGBA

                self.pending_gba = IncrementalGBA(self.map, self.config)

    def _service_gba(self):
        """One bounded GBA chunk per frame; merge on completion (the
        between-frames slice of the reference's detached GBA thread)."""
        if self.pending_gba is None:
            return
        if self.pending_gba.step():
            self.map = self.pending_gba.merge(self.map)
            self.pending_gba = None

    def _track_reference_keyframe(self, cur: FrameState):
        """BoW-match the frame against its reference keyframe and
        pose-optimize from the last pose (TrackReferenceKeyFrame, reference:
        src/tracking.cpp:587-629) — the fallback rung between motion-model
        tracking and full relocalization."""
        if self.vocab is None or self.kf_nodes is None:
            return False
        from . import vocabulary as voc
        from ..ops.matching import search_by_bow

        # reference KF = the keyframe sharing most points with the last frame
        P = self.map.pt_capacity
        binds = self.last_bindings
        cur_bound = jnp.zeros((P,), bool).at[
            jnp.where(binds >= 0, binds, P - 1)
        ].set(binds >= 0).at[P - 1].set(False)
        sees = jnp.where(
            self.map.kf_feat_valid & (self.map.kf_obs_point >= 0),
            jnp.take(cur_bound, jnp.clip(self.map.kf_obs_point, 0, P - 1)),
            False,
        ) & self.map.kf_valid[:, None]
        ref_slot = int(jnp.argmax(jnp.sum(sees, axis=1)))

        feats = cur.features
        words, nodes = voc.transform(self.vocab, feats.desc, feats.valid)
        idx_kf, ok = search_by_bow(
            feats.desc, nodes, feats.valid, feats.angle,
            self.map.kf_desc[ref_slot], self.kf_nodes[ref_slot],
            self.map.kf_feat_valid[ref_slot], self.map.kf_angle[ref_slot],
            max_dist=50, nn_ratio=0.7,
        )
        bind = self.map.kf_obs_point[ref_slot][idx_kf]
        pair_ok = ok & (bind >= 0) & self.map.pt_valid[jnp.clip(bind, 0, P - 1)]
        if int(jnp.sum(pair_ok)) < 15:  # reference: >=15 matches (:607)
            return False

        from ..optim.pose_opt import PoseObs, pose_optimize, robust_pose_estimate
        from .frame import features_scale_sigma2

        cam = self.config.camera
        sigma2 = features_scale_sigma2(feats, self.config.orb.scale_factor)
        obs = PoseObs(
            p_w=self.map.pt_pos[jnp.clip(bind, 0, P - 1)],
            uv=feats.xy, u_right=feats.u_right, sigma2=sigma2, valid=pair_ok,
        )
        T_est, inliers, n_inl = pose_optimize(
            self.T_cw, obs, fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
            bf=cam.bf,
        )
        if int(n_inl) < 10:  # reference: >=10 map inliers (:625)
            return False
        self.T_cw = T_est
        self.last_bindings = jnp.where(pair_ok & inliers, bind, -1)
        self.lost = False
        return True

    def _try_relocalize(self, cur: FrameState):
        if not self.enable_relocalization or self.db is None:
            return False
        from .relocalization import relocalize

        self._reloc_key, sub = jax.random.split(self._reloc_key)
        res = relocalize(
            self.map, self.db, self.kf_nodes, self.vocab, cur,
            self.config, sub,
        )
        if res.success:
            self.T_cw = res.T_cw
            self.velocity = jnp.eye(4, dtype=jnp.float32)
            self.last_bindings = res.bindings
            self.lost = False
            return True
        return False

    @property
    def _th_far(self):
        return self.config.tracking.th_depth * self.config.camera.baseline_m

    def _insert_keyframe(self, frame: FrameState, bindings):
        # the whole mapping-thread work as one device program (see
        # keyframe_stage); triangulation covers the stereo far-point
        # densification too (CreateNewMapPoints, reference:
        # src/mapping.cpp:280-525, 10 neighbours stereo vs 20 mono at :286)
        self.map, slot = keyframe_stage(
            self.map, frame, bindings, self.config,
            do_triangulate=self.n_keyframes >= 1,
            do_fuse=self.n_keyframes >= 1,
            do_lba=self.n_keyframes >= 2,
            do_cull=self.n_keyframes >= 4,
        )
        self.n_keyframes += 1
        self.frames_since_kf = 0
        self.last_kf_slot = int(slot)
        self._register_keyframe(int(slot))
        # re-read bindings after culling/BA (points may have died)
        return self.map.kf_obs_point[slot]

    def reset(self):
        """Full system reset (Selflocalization::Reset -> Tracking::Reset,
        reference: src/selflocalization.cpp:577-580, src/tracking.cpp:1340-1385):
        clear map, database and tracker state; the trajectory log survives."""
        cfg = self.config
        self.map = empty_map(
            cfg.max_keyframes, cfg.max_map_points, cfg.orb.max_keypoints
        )
        self.T_cw = jnp.eye(4, dtype=jnp.float32)
        self.velocity = jnp.eye(4, dtype=jnp.float32)
        self.last_frame = None
        self.last_bindings = None
        self.frames_since_kf = 0
        self.ref_kf_tracked = 0
        self.lost = False
        self.n_keyframes = 0
        self.db = None
        self.kf_nodes = None
        self.loop_closer = None
        self.pending_gba = None

    def process(self, img_left, img_right, timestamp: float = 0.0):
        cfg = self.config
        img_left = jnp.asarray(img_left, jnp.float32)
        img_right = jnp.asarray(img_right, jnp.float32)
        cur = process_stereo(img_left, img_right, cfg, timestamp)
        return self._step(cur)

    def process_rgbd(self, img, depth_map, timestamp: float = 0.0):
        """RGB-D ingestion (GrabImageRGBD, reference: src/tracking.cpp:202-230).

        After frame construction the RGB-D frame carries the same
        u_right/depth fields as a stereo frame, so tracking, mapping and
        loop closing are shared verbatim (reference treats the two sensors
        identically past OrbFrame construction).
        """
        from .frontend import process_rgbd as _process_rgbd
        cur = _process_rgbd(
            jnp.asarray(img, jnp.float32),
            jnp.asarray(depth_map, jnp.float32),
            self.config, timestamp,
        )
        return self._step(cur)

    def _step(self, cur: FrameState):
        cfg = self.config
        # auto-reset if lost right after bootstrap (reference:
        # src/tracking.cpp:305-313: lost with <=5 keyframes => full reset)
        if self.lost and self.last_frame is not None and self.n_keyframes <= 5:
            self.reset()

        if self.last_frame is None:
            # stereo initialization (reference: src/tracking.cpp:342-395)
            n_depth = int(jnp.sum(cur.features.depth > 0))
            if n_depth < 100:
                return None
            self._ensure_vocab(cur)
            bindings = self._insert_keyframe(
                cur, -jnp.ones((cur.features.capacity,), jnp.int32)
            )
            self.last_frame = cur
            self.last_bindings = bindings
            self.ref_kf_tracked = int(jnp.sum(bindings >= 0))
            self.trajectory.append(jnp.eye(4))
            return self.T_cw

        out = track_frame_with_map(
            self.map, self.last_frame, self.last_bindings,
            self.T_cw, self.velocity, cur, cfg,
        )
        self.map = apply_point_counters(
            self.map, out.pt_visible_delta, out.pt_found_delta
        )
        T_new = out.T_cw
        # ONE device->host transfer for all per-frame decision scalars: on a
        # remote/tunneled device each int() costs a full RTT; four separate
        # reads were the frame-loop's hidden latency floor
        stats = np.asarray(jnp.stack([
            out.n_inliers.astype(jnp.int32),
            jnp.sum(out.bindings >= 0).astype(jnp.int32),
            out.n_tracked_close.astype(jnp.int32),
            out.n_untracked_close.astype(jnp.int32),
        ]))
        n_inl, tracked = int(stats[0]), int(stats[1])
        n_tracked_close, n_untracked_close = int(stats[2]), int(stats[3])
        self.last_stats = stats  # observability: [n_inl, tracked, close+, close-]
        self.lost = n_inl < MIN_INLIERS_MAP
        if self.lost:
            # fallback ladder (UpdatePoses dispatch, reference:
            # src/tracking.cpp:1538-1640): reference-KF BoW tracking, then
            # full relocalization
            if self._track_reference_keyframe(cur) or self._try_relocalize(cur):
                T_new = self.T_cw
                out = out._replace(bindings=self.last_bindings)
            else:
                # recovery failed: the failed estimate must NOT be integrated
                # — the reference keeps the last good pose while LOST
                # (src/tracking.cpp:266-276 only updates on OK) and so must
                # we, or velocity composition compounds the garbage pose
                # exponentially until it overflows to NaN and relocalization
                # can never pull the tracker back. Bindings stay as tracked
                # (few but genuinely matched, keyed by cur's features).
                T_new = self.T_cw
        if self.lost:
            self.velocity = jnp.eye(4, dtype=jnp.float32)
        else:
            self.velocity = T_new @ lie.inv_T(self.T_cw)
        self.T_cw = T_new
        cur = cur._replace(T_cw=T_new)
        bindings = out.bindings
        self.frames_since_kf += 1

        # keyframe decision (NeedNewKeyFrame, reference:
        # src/tracking.cpp:812-896, simplified c1a/c1c/c2)
        need_kf = (
            (self.frames_since_kf >= cfg.tracking.max_frames)
            or (tracked < 0.25 * max(self.ref_kf_tracked, 1))
            or (
                n_tracked_close < 100
                and n_untracked_close > 70
            )
        ) and not self.lost
        if need_kf:
            bindings = self._insert_keyframe(cur, bindings)
            self.ref_kf_tracked = max(tracked, 1)
            # re-sync the tracker to the keyframe's POST-local-BA pose: BA
            # just moved the window (this frame included) into its own
            # refined gauge, and tracking from the stale pre-BA pose lets
            # map and tracker drift apart a little on every insertion until
            # tight-radius projection matching collapses (the reference's
            # tracker reads KF poses back from the map through the
            # covisibility refs, src/tracking.cpp:546-585 UpdateLastFrame)
            T_new = self.map.kf_T_cw[self.last_kf_slot]
            self.T_cw = T_new
            cur = cur._replace(T_cw=T_new)

        self.last_frame = cur
        self.last_bindings = bindings
        self.trajectory.append(T_new)
        self._service_gba()
        return T_new
