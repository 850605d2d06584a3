"""Map-point fusion across covisible keyframes (SearchInNeighbors).

Re-designs Mapping::SearchInNeighbors + ORBmatcher::Fuse (reference:
src/mapping.cpp:564-644, src/orbmatcher.cpp:833-983): after a keyframe
insert, its points are projected into the covisible keyframes (and the
neighbours' points into the new keyframe); features that match an incoming
point either gain a binding (new observation) or trigger a point *merge*
when already bound to a different point.

Merging (OrbMapPoint::Replace, reference: src/orbmappoint.cpp:241-282) is
where the array design shines: build an indirection table ``replace [P]``
(identity except loser -> winner) and apply it to the whole ``[K, F]``
binding table with one gather — no pointer walking, no locks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import lie
from ..ops.hamming import MAX_DIST, TH_LOW, hamming_matrix
from ..utils.config import SystemConfig
from .map_state import MapState, point_observation_counts, recompute_covisibility

N_FUSE_NEIGHBORS = 10   # reference: 10 covisible (stereo), src/mapping.cpp:569
# Candidate-list caps are sized relative to the feature capacity F at trace
# time (see run_fusion): the forward list holds the new KF's bound features
# (<= F by construction) and the reverse list distinct neighbour points
# (<= 2F covers the 10-neighbour union in practice), so nothing silently
# truncates at the default config (advisor r3 finding).
FUSE_REV_CAP = 2048     # legacy name kept for tests; see _rev_cap below


def _project_gate(m: MapState, pt_slots, T_cw, config: SystemConfig):
    """Frustum/scale/view gating of map points against one pose; returns
    (visible mask, uv, predicted octave, distances)."""
    cam = config.camera
    P = m.pt_capacity
    ok = pt_slots >= 0
    slots = jnp.clip(pt_slots, 0, P - 1)
    p_w = m.pt_pos[slots]
    p_c = lie.transform_points(T_cw[None], p_w[None])[0]
    z = p_c[:, 2]
    uv = lie.project(p_c, cam.fx, cam.fy, cam.cx, cam.cy)
    cam_center = lie.inv_T(T_cw)[:3, 3]
    view = p_w - cam_center
    dist_w = jnp.linalg.norm(view, axis=-1) + 1e-9
    view_cos = jnp.sum(view * m.pt_normal[slots], axis=-1) / dist_w
    visible = ok & m.pt_valid[slots] & (
        (z > 0.1)
        & (uv[:, 0] >= 0) & (uv[:, 0] < cam.width)
        & (uv[:, 1] >= 0) & (uv[:, 1] < cam.height)
        & (dist_w >= 0.8 * m.pt_min_dist[slots])
        & (dist_w <= 1.2 * m.pt_max_dist[slots])
        & (view_cos > 0.5)
    )
    ratio = jnp.maximum(m.pt_max_dist[slots] / jnp.maximum(dist_w, 1e-6), 1.0)
    pred_oct = jnp.clip(
        jnp.ceil(
            jnp.log(ratio) / jnp.log(config.orb.scale_factor)
        ).astype(jnp.int32),
        0, config.orb.n_levels - 1,
    )
    return visible, uv, pred_oct, z


def _fuse_core(kf_obs_point, pt_valid, counts, m: MapState, target_slot,
               cand_pt_slots, config: SystemConfig):
    """Fusion body over the MUTABLE state triple (bindings, point validity,
    observation counts).

    The neighbour loop in run_fusion used to carry the entire MapState
    through its fori_loop — every iteration re-selected (jnp.where) all
    ~40 MB of immutable keyframe tensors.  Fusion only ever writes the
    [K,F] binding table, the [P] validity mask and the [P] counts, so the
    loop carries exactly those; everything else reads from the closed-over
    ``m`` (positions/descriptors/geometry are not modified by fusion).
    """
    P, F = m.pt_capacity, m.feat_capacity
    m = m._replace(kf_obs_point=kf_obs_point, pt_valid=pt_valid)
    T_t = m.kf_T_cw[target_slot]
    visible, uv, pred_oct, z = _project_gate(m, cand_pt_slots, T_t, config)
    slots = jnp.clip(cand_pt_slots, 0, P - 1)

    # spatial + octave gate, radius 3*scale(pred octave) (reference:
    # src/orbmatcher.cpp:864-875 uses 3.0*scale, octave in [pred-1, pred])
    radius = 3.0 * jnp.power(
        jnp.float32(config.orb.scale_factor), pred_oct.astype(jnp.float32)
    )
    f_xy = m.kf_xy[target_slot]
    f_oct = m.kf_octave[target_slot]
    f_valid = m.kf_feat_valid[target_slot] & m.kf_valid[target_slot]
    d_uv = f_xy[None, :, :] - uv[:, None, :]
    within = jnp.maximum(jnp.abs(d_uv[..., 0]), jnp.abs(d_uv[..., 1])) <= radius[:, None]
    oct_ok = (f_oct[None, :] >= pred_oct[:, None] - 1) & (
        f_oct[None, :] <= pred_oct[:, None] + 1
    )
    # reprojection chi2 gate per feature octave (reference: :903-933);
    # stereo-observed features also check the right-image coordinate at the
    # 3-DoF threshold 7.8 — without it a far point can fuse onto a feature
    # whose own disparity contradicts the point's depth, seeding local BA
    # with inconsistent stereo edges.
    sigma2 = jnp.power(
        jnp.float32(config.orb.scale_factor), 2.0 * f_oct.astype(jnp.float32)
    )
    err2 = jnp.sum(d_uv * d_uv, axis=-1)
    cam = config.camera
    f_ur = m.kf_uright[target_slot]
    ur_hat = uv[:, 0] - cam.bf / jnp.maximum(z, 1e-6)
    d_ur = f_ur[None, :] - ur_hat[:, None]
    err2_st = err2 + d_ur * d_ur
    chi_ok = jnp.where(
        f_ur[None, :] >= 0,
        err2_st <= 7.8 * sigma2[None, :],
        err2 <= 5.99 * sigma2[None, :],
    )

    gate = within & oct_ok & chi_ok & visible[:, None] & f_valid[None, :]
    dmat = hamming_matrix(m.pt_desc[slots], m.kf_desc[target_slot])
    big = MAX_DIST + 1
    d = jnp.where(gate, dmat, big)
    best_f = jnp.argmin(d, axis=1)
    best_d = jnp.take_along_axis(d, best_f[:, None], axis=1)[:, 0]
    good = best_d <= TH_LOW

    # one candidate per feature (lowest distance)
    C = cand_pt_slots.shape[0]
    dd = jnp.where(good, best_d, big)
    best_per_f = jnp.full((F,), big, dd.dtype).at[best_f].min(dd)
    keep = good & (dd <= jnp.take(best_per_f, best_f))
    order = jnp.arange(C)
    first_at = jnp.full((F,), C).at[best_f].min(jnp.where(keep, order, C))
    keep = keep & (jnp.take(first_at, best_f) == order)

    # split: bind vs merge
    existing = m.kf_obs_point[target_slot][best_f]          # [C]
    is_new_bind = keep & (existing < 0)
    is_merge = keep & (existing >= 0) & (existing != slots)

    # --- new bindings -----------------------------------------------------
    tgt_feat = jnp.where(is_new_bind, best_f, F - 1)
    row = m.kf_obs_point[target_slot].at[tgt_feat].max(
        jnp.where(is_new_bind, slots, -1)
    )
    kf_obs_point = m.kf_obs_point.at[target_slot].set(row)

    # counts gain the new bindings (what a recount here would see)
    counts = counts.at[jnp.where(is_new_bind, slots, P - 1)].add(
        is_new_bind.astype(jnp.int32)
    ).at[P - 1].set(0)

    # --- merges: loser -> winner indirection ------------------------------
    cand_obs = counts[slots]
    exist_obs = counts[jnp.clip(existing, 0, P - 1)]
    cand_wins = cand_obs >= exist_obs
    loser = jnp.where(is_merge, jnp.where(cand_wins, existing, slots), -1)
    winner = jnp.where(is_merge, jnp.where(cand_wins, slots, existing), -1)

    replace = jnp.arange(P, dtype=jnp.int32).at[
        jnp.where(is_merge, jnp.clip(loser, 0, P - 1), P - 1)
    ].set(jnp.where(is_merge, winner, P - 1))
    replace = replace.at[P - 1].set(P - 1)
    # short chains (loser of one merge being winner of another) resolve by a
    # second application
    replace = replace[replace]

    new_obs = jnp.where(
        kf_obs_point >= 0,
        replace[jnp.clip(kf_obs_point, 0, P - 1)],
        kf_obs_point,
    )
    dead = jnp.zeros((P,), bool).at[
        jnp.where(loser >= 0, jnp.clip(loser, 0, P - 1), P - 1)
    ].set(loser >= 0)
    dead = dead.at[P - 1].set(False)
    # winner absorbs the loser's observations (Replace merges both counts).
    # Bounded divergence (documented): when the same existing point loses to
    # two candidates in one call, each winner absorbs the full loser count
    # and >2-long merge chains resolve only partially — the stage-end
    # recount in mapping_stage re-derives exact counts before any decision
    # that outlives the stage (verified max|threaded-recount| = 0 there).
    loser_n = jnp.where(loser >= 0, counts[jnp.clip(loser, 0, P - 1)], 0)
    counts = counts.at[
        jnp.where(winner >= 0, jnp.clip(winner, 0, P - 1), P - 1)
    ].add(loser_n).at[P - 1].set(0)
    counts = jnp.where(dead, 0, counts)
    return new_obs, pt_valid & (~dead), counts


@functools.partial(jax.jit, static_argnums=(3,))
def fuse_into_keyframe(m: MapState, target_slot, cand_pt_slots,
                       config: SystemConfig, counts=None):
    """Project candidate points into keyframe ``target_slot``; bind matches,
    merge duplicates.  ``cand_pt_slots [C]`` map point slots (-1 pad).

    ``counts``: optional precomputed per-point observation counts [P]; when
    given the recount is skipped.  Returns ``(m, counts)``."""
    if counts is None:
        counts = point_observation_counts(m)
    obs, pt_valid, counts = _fuse_core(
        m.kf_obs_point, m.pt_valid, counts, m, target_slot, cand_pt_slots,
        config,
    )
    return m._replace(kf_obs_point=obs, pt_valid=pt_valid), counts


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def run_fusion(m: MapState, new_kf_slot, config: SystemConfig,
               n_neighbors: int = N_FUSE_NEIGHBORS,
               update_covis: bool = True, counts=None):
    """SearchInNeighbors: fuse new-KF points into each covisible neighbour,
    then the neighbours' points into the new KF (reference:
    src/mapping.cpp:564-644).

    ``update_covis=False`` skips the tail covisibility rebuild — callers
    chaining several map passes per keyframe rebuild once at the end.
    ``counts``: optional observation counts threaded through (returns
    ``(m, counts)`` when given)."""
    F = m.feat_capacity
    w = m.covis[new_kf_slot]
    nb_w, nb_slots = jax.lax.top_k(w, n_neighbors)
    nb_ok = nb_w > 0

    new_pts = jnp.where(
        m.kf_feat_valid[new_kf_slot], m.kf_obs_point[new_kf_slot], -1
    )                                                       # [F]
    # compress the forward candidate list: only the bound features matter,
    # and every per-candidate op in _fuse_core — the [C, F] Hamming matrix
    # above all — scales with the list length.  Cap = F: a keyframe cannot
    # bind more than F points, so the compression never drops candidates.
    okm = new_pts >= 0
    rank = jnp.cumsum(okm.astype(jnp.int32)) - 1
    cap = F
    dst = jnp.where(okm & (rank < cap), rank, cap)
    new_pts = jnp.full((cap + 1,), -1, jnp.int32).at[dst].max(
        jnp.where(okm, new_pts, -1)
    )[:cap]

    with_counts = counts is not None
    counts0 = counts if with_counts else point_observation_counts(m)

    def body(i, carry):
        obs, pt_valid, counts = carry
        tgt = nb_slots[i]
        obs_n, ptv_n, cnt_n = _fuse_core(
            obs, pt_valid, counts, m, tgt, new_pts, config
        )
        keep = nb_ok[i]
        return (
            jnp.where(keep, obs_n, obs),
            jnp.where(keep, ptv_n, pt_valid),
            jnp.where(keep, cnt_n, counts),
        )

    obs, pt_valid, counts = jax.lax.fori_loop(
        0, n_neighbors, body, (m.kf_obs_point, m.pt_valid, counts0)
    )

    # reverse direction: neighbours' points into the new KF
    nb_binds = obs[nb_slots]                                # [N, F]
    nb_bok = (
        m.kf_feat_valid[nb_slots] & (nb_binds >= 0) & nb_ok[:, None]
    )
    cand = jnp.where(nb_bok, nb_binds, -1).reshape(-1)      # [N*F]
    # dedupe: keep first occurrence of each point slot
    P = m.pt_capacity
    safe = jnp.clip(cand, 0, P - 1)
    order = jnp.arange(cand.shape[0])
    first = jnp.full((P,), cand.shape[0]).at[safe].min(
        jnp.where(cand >= 0, order, cand.shape[0])
    )
    cand = jnp.where((cand >= 0) & (jnp.take(first, safe) == order), cand, -1)
    # compress to 2F slots (covers the distinct-point union of the
    # 10-neighbour window; overflow beyond 2F is dropped oldest-last)
    rev_cap = 2 * F
    rank = jnp.cumsum((cand >= 0).astype(jnp.int32)) - 1
    comp = jnp.full((rev_cap,), -1, jnp.int32).at[
        jnp.where((cand >= 0) & (rank < rev_cap), rank, rev_cap - 1)
    ].max(jnp.where(cand >= 0, cand, -1))
    obs, pt_valid, counts = _fuse_core(
        obs, pt_valid, counts, m, new_kf_slot, comp, config
    )
    m = m._replace(kf_obs_point=obs, pt_valid=pt_valid)
    if update_covis:
        m = m._replace(covis=recompute_covisibility(m))
    return (m, counts) if with_counts else m
