"""Relocalization: BoW candidates -> EPnP RANSAC -> pose optimization.

Re-designs Tracking::Relocalization (reference: src/tracking.cpp:1177-1338):
query the keyframe database, BoW-match each candidate (>=15 matches), run
EPnP RANSAC, then pose-optimize and accept at >=50 inliers.  Candidates are
few and relocalization is rare, so the per-candidate loop stays on the host
while each stage is a jitted batched program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..optim.pnp import pnp_ransac
from ..optim.pose_opt import PoseObs, pose_optimize
from ..ops import lie
from ..ops.matching import search_by_bow
from ..utils.config import SystemConfig
from .frame import FrameState, features_scale_sigma2
from .kfdb import KeyFrameDatabase, detect_candidates
from .map_state import MapState
from . import vocabulary as voc

MIN_BOW_MATCHES = 15   # reference: src/tracking.cpp:1232
MIN_FINAL_INLIERS = 50  # reference: src/tracking.cpp:1322


class RelocResult(NamedTuple):
    success: bool
    T_cw: Optional[jnp.ndarray]
    bindings: Optional[jnp.ndarray]


def relocalize(m: MapState, db: KeyFrameDatabase, kf_nodes,
               vocab: voc.Vocabulary, frame: FrameState,
               config: SystemConfig, key) -> RelocResult:
    cam = config.camera
    P = m.pt_capacity
    feats = frame.features

    words, nodes = voc.transform(vocab, feats.desc, feats.valid)
    qbow = voc.bow_vector(vocab, words)
    exclude = ~m.kf_valid
    cands, _ = detect_candidates(db, qbow, exclude, 0.0, m.covis)
    cands = [int(c) for c in np.asarray(cands) if int(c) >= 0]

    sigma2 = features_scale_sigma2(feats, config.orb.scale_factor)
    for cand in cands[:5]:
        idx_kf, ok = search_by_bow(
            feats.desc, nodes, feats.valid, feats.angle,
            m.kf_desc[cand], kf_nodes[cand], m.kf_feat_valid[cand],
            m.kf_angle[cand],
            max_dist=50, nn_ratio=0.75,
        )
        bind = m.kf_obs_point[cand][idx_kf]
        pair_ok = ok & (bind >= 0) & m.pt_valid[jnp.clip(bind, 0, P - 1)]
        if int(jnp.sum(pair_ok)) < MIN_BOW_MATCHES:
            continue

        p_w = m.pt_pos[jnp.clip(bind, 0, P - 1)]
        key, sub = jax.random.split(key)
        res = pnp_ransac(
            p_w, feats.xy, sigma2, pair_ok, sub,
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
        )
        if int(res.n_inliers) < 10:
            continue

        T0 = lie.make_T(res.R, res.t)
        obs = PoseObs(
            p_w=p_w, uv=feats.xy, u_right=feats.u_right,
            sigma2=sigma2, valid=pair_ok,
        )
        T_est, inliers, n_inl = pose_optimize(
            T0, obs, fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf
        )
        if int(n_inl) >= MIN_FINAL_INLIERS:
            bindings = jnp.where(pair_ok & inliers, bind, -1)
            return RelocResult(True, T_est, bindings)
    return RelocResult(False, None, None)
