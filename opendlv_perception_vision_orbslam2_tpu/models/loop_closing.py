"""Loop closing: detection, relative-pose solve, map correction.

Re-designs the LoopClosing thread (reference: src/loopclosing.cpp):

- DetectLoop (reference: :98-224): BoW candidates below the covisible
  min-score, with the 3-consecutive-detection covisibility-consistency check
  (``mnCovisibilityConsistencyTh = 3``) — detection is a jitted database
  query; the small consistency-group bookkeeping stays on the host exactly
  like the reference keeps it across invocations.
- ComputeSim3 (reference: :226-398): BoW feature matches whose both sides
  carry map points give 3D-3D pairs; a *hypothesis-batched* Horn RANSAC
  (reference iterates 5 at a time per candidate; here all hypotheses solve in
  one vmap) yields the relative transform, scale fixed for stereo
  (reference: src/sim3solver.cpp:45-47).
- CorrectLoop (reference: :400-585): pose-graph optimization over the
  essential graph (strong covisibility edges + temporal chain + loop edge,
  loop keyframe fixed) followed by point correction through each point's
  reference keyframe — the array form of the spanning-tree propagation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie
from ..ops.horn import horn_align
from ..ops.matching import search_by_bow
from ..optim.pose_graph import PoseGraphProblem, optimize_pose_graph
from ..utils.config import SystemConfig
from .kfdb import KeyFrameDatabase, detect_candidates, query_scores
from .map_state import MapState, recompute_covisibility

COVIS_CONSISTENCY_TH = 3    # reference: src/loopclosing.cpp:35
MIN_LOOP_INLIERS = 20       # reference: src/loopclosing.cpp:344
ESSENTIAL_COVIS_MIN = 100   # strong-edge weight (reference: src/orboptimizer.cpp:962)
N_SIM3_HYPOTHESES = 128


@jax.jit
def loop_min_score(m: MapState, db: KeyFrameDatabase, kf_slot):
    """Minimum BoW score of the current KF against its covisible neighbours
    (reference: src/loopclosing.cpp:112-131)."""
    scores = query_scores(db, db.bow[kf_slot])
    neighbor = (m.covis[kf_slot] > 0) & m.kf_valid
    masked = jnp.where(neighbor, scores, jnp.inf)
    ms = jnp.min(masked)
    return jnp.where(jnp.isfinite(ms), ms, 0.0)


@functools.partial(jax.jit, static_argnums=(3,))
def loop_candidates(m: MapState, db: KeyFrameDatabase, kf_slot,
                    n_candidates: int = 8):
    """Database query excluding the current KF + its covisible group."""
    exclude = (m.covis[kf_slot] > 0) | (
        jnp.arange(m.kf_capacity) == kf_slot
    ) | (~m.kf_valid)
    min_s = loop_min_score(m, db, kf_slot)
    return detect_candidates(
        db, db.bow[kf_slot], exclude, min_s, m.covis, n_candidates
    )


class LoopMatch(NamedTuple):
    ok: jnp.ndarray          # [] bool
    T_rel: jnp.ndarray       # [4, 4]: corrected T_cur_cw = T_rel @ T_cand_cw
    n_inliers: jnp.ndarray   # [] int32


@functools.partial(jax.jit, static_argnums=(5,))
def compute_loop_transform(m: MapState, kf_nodes, cur_slot, cand_slot, key,
                           config: SystemConfig) -> LoopMatch:
    """BoW match the two keyframes and solve the relative SE3 by batched
    Horn RANSAC over 3-point sets (Sim3Solver equivalent with fixed scale,
    reference: src/sim3solver.cpp:154-221, src/loopclosing.cpp:276-350)."""
    cam = config.camera
    P = m.pt_capacity
    F = m.feat_capacity

    idx_b, ok_ab = search_by_bow(
        m.kf_desc[cur_slot], kf_nodes[cur_slot], m.kf_feat_valid[cur_slot],
        m.kf_angle[cur_slot],
        m.kf_desc[cand_slot], kf_nodes[cand_slot], m.kf_feat_valid[cand_slot],
        m.kf_angle[cand_slot],
        max_dist=50, nn_ratio=0.75,
    )
    bind_a = m.kf_obs_point[cur_slot]
    bind_b = m.kf_obs_point[cand_slot][idx_b]
    pair_ok = (
        ok_ab & (bind_a >= 0) & (bind_b >= 0)
        & m.pt_valid[jnp.clip(bind_a, 0, P - 1)]
        & m.pt_valid[jnp.clip(bind_b, 0, P - 1)]
    )
    p_w_a = m.pt_pos[jnp.clip(bind_a, 0, P - 1)]
    p_w_b = m.pt_pos[jnp.clip(bind_b, 0, P - 1)]
    x_a = lie.transform_points(m.kf_T_cw[cur_slot][None], p_w_a[None])[0]
    x_b = lie.transform_points(m.kf_T_cw[cand_slot][None], p_w_b[None])[0]

    # RANSAC over 3-point sets
    B = N_SIM3_HYPOTHESES
    logits = jnp.log(pair_ok.astype(jnp.float32) + 1e-9)
    sets = jax.random.categorical(key, logits, shape=(B, 3))
    sets_ok = jnp.all(jnp.take(pair_ok, sets), axis=1)

    R_h, t_h, _ = jax.vmap(
        lambda s: horn_align(x_b[s], x_a[s], fix_scale=True)
    )(sets)

    # inlier check: mutual reprojection (reference: src/sim3solver.cpp:354-394)
    x_b_in_a = jnp.einsum("bij,nj->bni", R_h, x_b) + t_h[:, None, :]
    Rt = jnp.swapaxes(R_h, 1, 2)
    x_a_in_b = jnp.einsum("bij,bnj->bni", Rt, x_a[None] - t_h[:, None, :])

    def reproj_err(x_cam, uv_ref):
        z = jnp.maximum(x_cam[..., 2], 1e-3)
        u = cam.fx * x_cam[..., 0] / z + cam.cx
        v = cam.fy * x_cam[..., 1] / z + cam.cy
        return (u - uv_ref[..., 0]) ** 2 + (v - uv_ref[..., 1]) ** 2

    uv_a = m.kf_xy[cur_slot]
    uv_b = m.kf_xy[cand_slot][idx_b]
    err_a = reproj_err(x_b_in_a, uv_a[None])
    err_b = reproj_err(x_a_in_b, uv_b[None])
    inl = (
        (err_a <= 9.21) & (err_b <= 9.21)
        & pair_ok[None, :] & sets_ok[:, None]
    )
    counts = jnp.sum(inl, axis=1)
    best = jnp.argmax(counts)
    best_inl = inl[best]

    # refine on all inliers (2 Horn rounds)
    w = best_inl.astype(jnp.float32)
    R1, t1, _ = horn_align(x_b, x_a, w, fix_scale=True)
    x1 = jnp.einsum("ij,nj->ni", R1, x_b) + t1
    e1 = reproj_err(x1, uv_a)
    w2 = (e1 <= 9.21).astype(jnp.float32) * w
    R2, t2, _ = horn_align(x_b, x_a, w2, fix_scale=True)

    n_inl = counts[best]
    T_ab = lie.make_T(R2, t2)            # maps cand-camera -> cur-camera
    return LoopMatch(ok=n_inl >= MIN_LOOP_INLIERS, T_rel=T_ab,
                     n_inliers=n_inl)


class EssentialEdges(NamedTuple):
    e_i: jnp.ndarray
    e_j: jnp.ndarray
    e_T: jnp.ndarray
    e_w: jnp.ndarray
    e_valid: jnp.ndarray


@jax.jit
def build_essential_edges(m: MapState, cur_slot, cand_slot, T_loop):
    """Strong covisibility edges + temporal chain + the loop edge
    (reference: src/orboptimizer.cpp:875-1000)."""
    K = m.kf_capacity
    ids = jnp.where(m.kf_valid, m.kf_id, jnp.iinfo(jnp.int32).max)

    # temporal chain: each KF connects to the KF with the next-lower id
    order = jnp.argsort(ids)                         # valid KFs first by id
    nxt = jnp.roll(order, -1)
    chain_ok = (
        jnp.take(m.kf_valid, order) & jnp.take(m.kf_valid, nxt)
        & (jnp.arange(K) < jnp.sum(m.kf_valid) - 1)
    )

    # strong covisibility edges (upper triangle)
    covis_mask = (
        (m.covis >= ESSENTIAL_COVIS_MIN)
        & (jnp.arange(K)[:, None] < jnp.arange(K)[None, :])
    )
    ci, cj = jnp.nonzero(covis_mask, size=4 * K, fill_value=0)
    c_ok = covis_mask[ci, cj]

    e_i = jnp.concatenate([order, ci, cur_slot[None]])
    e_j = jnp.concatenate([nxt, cj, cand_slot[None]])
    e_valid = jnp.concatenate([chain_ok, c_ok, jnp.array([True])])
    T_i = m.kf_T_cw[e_i]
    T_j = m.kf_T_cw[e_j]
    e_T = jnp.einsum("eij,ejk->eik", T_i, jax.vmap(lie.inv_T)(T_j))
    # loop edge uses the measured corrected relative pose:
    # T_cur_corrected = T_loop @ T_cand  =>  T_ij = T_loop
    e_T = e_T.at[-1].set(T_loop)
    e_w = jnp.concatenate([
        jnp.ones((K,)), jnp.ones((4 * K,)), jnp.array([5.0])
    ])
    return EssentialEdges(e_i=e_i, e_j=e_j, e_T=e_T, e_w=e_w, e_valid=e_valid)


@functools.partial(jax.jit, static_argnums=(4,))
def correct_loop(m: MapState, cur_slot, cand_slot, T_loop,
                 n_iters: int = 15) -> MapState:
    """Essential-graph optimization + point correction via reference KFs
    (reference: src/loopclosing.cpp:400-585 + RunGlobalBundleAdjustment's
    spanning-tree propagation :645-750)."""
    K, P = m.kf_capacity, m.pt_capacity
    T_old = m.kf_T_cw
    edges = build_essential_edges(m, cur_slot, cand_slot, T_loop)
    fixed = jnp.zeros((K,), bool).at[cand_slot].set(True)
    prob = PoseGraphProblem(
        T=T_old,
        v_valid=m.kf_valid,
        v_fixed=fixed,
        e_i=edges.e_i, e_j=edges.e_j, e_T_ij=edges.e_T,
        e_weight=edges.e_w, e_valid=edges.e_valid,
    )
    T_new = optimize_pose_graph(prob, n_iters=n_iters)
    T_new = jnp.where(m.kf_valid[:, None, None], T_new, T_old)

    # correct points through their reference keyframe:
    # p' = T_wc_new[ref] @ T_cw_old[ref] @ p
    ref = jnp.clip(m.pt_ref_kf, 0, K - 1)
    corr = jnp.einsum(
        "kij,kjl->kil", jax.vmap(lie.inv_T)(T_new), T_old
    )                                                  # [K, 4, 4]
    pc = jnp.einsum("pij,pj->pi", corr[ref, :3, :3], m.pt_pos) + corr[ref, :3, 3]
    pt_pos = jnp.where(m.pt_valid[:, None], pc, m.pt_pos)

    m = m._replace(kf_T_cw=T_new, pt_pos=pt_pos)
    return m._replace(covis=recompute_covisibility(m))


class LoopCloser:
    """Host-side detection state machine (consistency groups across
    consecutive keyframes, reference: src/loopclosing.cpp:150-211)."""

    def __init__(self, config: SystemConfig):
        self.config = config
        self.prev_groups: list[set[int]] = []
        self.prev_counts: list[int] = []
        self.last_loop_kf_id = -10**9
        self.key = jax.random.PRNGKey(7)

    def on_keyframe(self, m: MapState, db: KeyFrameDatabase, kf_nodes,
                    kf_slot: int):
        """Returns (map, loop_closed: bool, T_corrected_cur or None)."""
        kf_id = int(m.kf_id[kf_slot])
        # skip if <10 KFs since last loop (reference: src/loopclosing.cpp:104)
        if kf_id - self.last_loop_kf_id < 10 or int(jnp.sum(m.kf_valid)) < 10:
            return m, False, None

        cands, scores = loop_candidates(m, db, kf_slot)
        cands = [int(c) for c in np.asarray(cands) if int(c) >= 0]
        if not cands:
            self.prev_groups, self.prev_counts = [], []
            return m, False, None

        covis = np.asarray(m.covis)
        accepted = None
        new_groups, new_counts = [], []
        for c in cands:
            group = {c} | {
                int(j) for j in np.nonzero(covis[c] > 0)[0]
            }
            count = 0
            for g_prev, c_prev in zip(self.prev_groups, self.prev_counts):
                if group & g_prev:
                    count = max(count, c_prev + 1)
            new_groups.append(group)
            new_counts.append(count)
            if count >= COVIS_CONSISTENCY_TH - 1 and accepted is None:
                accepted = c
        self.prev_groups, self.prev_counts = new_groups, new_counts
        if accepted is None:
            return m, False, None

        self.key, sub = jax.random.split(self.key)
        lm = compute_loop_transform(
            m, kf_nodes, kf_slot, accepted, sub, self.config
        )
        if not bool(lm.ok):
            return m, False, None

        m = correct_loop(m, kf_slot, accepted, lm.T_rel)
        # full-map refinement (RunGlobalBundleAdjustment, reference:
        # src/loopclosing.cpp:645-750: GBA with 10 iterations after a loop)
        from .global_ba import run_global_ba

        m = run_global_ba(m, self.config, n_outer=10)
        self.last_loop_kf_id = kf_id
        self.prev_groups, self.prev_counts = [], []
        return m, True, m.kf_T_cw[kf_slot]
