"""Local mapping: covisibility-window BA over the array map.

Re-designs the Mapping thread's per-keyframe work (reference:
src/mapping.cpp:48-116): after a keyframe insert, cull recent points, run
local bundle adjustment over the covisible window, erase outlier
observations, and cull redundant keyframes.  (Epipolar triangulation of new
mono points — CreateNewMapPoints, reference: src/mapping.cpp:280-525 — is
stereo-redundant for the depth-rich path and lands with the monocular
pipeline.)

The reference's "local + fixed observer" window (LocalBundleAdjustment,
reference: src/orboptimizer.cpp:463-557) maps to static caps:
``KO`` optimizable keyframes (center + best covisible), ``KF_FIX`` fixed
observers, ``PL`` local points — all selected by masked top-k, no pointers.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..optim.ba import BAProblem, bundle_adjust
from ..utils.config import SystemConfig
from .frame import Features
from .map_state import MapState, recompute_covisibility

KO_DEFAULT = 8       # optimizable window size
KFIX_DEFAULT = 8     # fixed observers
PL_DEFAULT = 4096    # local point capacity (unique points in an 8-KF window)
# Compressed edge capacity (see extract_local_ba).  Sized for the
# OPTIMIZABLE window worst case: 8 KFs x 2048 features could reach 16k
# bound slots in theory, but bound density tops out near 45% on dense
# scenes (~7.4k optimizable edges) and row-major compression keeps
# optimizable-KF edges first, so overflow only ever sheds fixed-observer
# edges (gauge context, not optimized state).  12k covers the observed
# worst case with ~60% headroom over the round-3 cap that could clip the
# post-BA outlier-erasure (advisor r3 finding).
EL_DEFAULT = 12288


class LocalBAExtract(NamedTuple):
    prob: BAProblem
    local_kf_slots: jnp.ndarray   # [KO] map keyframe slots (-1 pad)
    local_pt_slots: jnp.ndarray   # [PL] map point slots (-1 pad)
    e_src_kf: jnp.ndarray         # [E] keyframe slot of each edge
    e_src_feat: jnp.ndarray       # [E] feature index of each edge
    window_kf_slots: jnp.ndarray  # [KO+KFIX] optimizable + fixed (-1 pad)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6))
def extract_local_ba(m: MapState, center_slot, ko: int = KO_DEFAULT,
                     kfix: int = KFIX_DEFAULT, pl: int = PL_DEFAULT,
                     scale_factor: float = 1.2,
                     el: int = EL_DEFAULT) -> LocalBAExtract:
    """Build the fixed-shape local BA problem around ``center_slot``."""
    K, F, P = m.kf_capacity, m.feat_capacity, m.pt_capacity

    # --- optimizable window: center + best covisible ----------------------
    w = m.covis[center_slot].at[center_slot].set(-1)
    nb_w, nb_idx = jax.lax.top_k(w, ko - 1)
    local_slots = jnp.concatenate([jnp.array([center_slot]), nb_idx])
    local_ok = jnp.concatenate([jnp.array([True]), nb_w > 0])
    local_ok = local_ok & jnp.take(m.kf_valid, local_slots)

    # Gauge anchoring: move the OLDEST local keyframe to position 0 so the
    # caller can pin it (fix_first_pose).  Early windows have no fixed
    # observers, leaving the whole window's gauge free — without an anchor
    # the damped LM lets the map drift (the reference gets its gauge from
    # fixed observer KFs, and pins KF0 in global BA,
    # reference: src/orboptimizer.cpp:84-86).
    ids = jnp.where(local_ok, jnp.take(m.kf_id, local_slots), jnp.iinfo(jnp.int32).max)
    oldest_pos = jnp.argmin(ids)
    perm = jnp.arange(local_slots.shape[0])
    perm = perm.at[0].set(oldest_pos).at[oldest_pos].set(0)
    local_slots = local_slots[perm]
    local_ok = local_ok[perm]

    is_local = jnp.zeros((K,), bool).at[
        jnp.where(local_ok, local_slots, K - 1)
    ].set(local_ok)

    # --- local point set --------------------------------------------------
    binds = m.kf_obs_point[local_slots]                      # [KO, F]
    b_ok = (
        m.kf_feat_valid[local_slots]
        & (binds >= 0)
        & local_ok[:, None]
    )
    pt_in = jnp.zeros((P,), bool).at[jnp.where(b_ok, binds, P - 1)].set(b_ok)
    pt_in = pt_in.at[P - 1].set(False) & m.pt_valid

    # compress to PL slots (rank trick)
    rank = jnp.cumsum(pt_in.astype(jnp.int32)) - 1
    pt_g2l = jnp.where(pt_in & (rank < pl), rank, -1)        # [P] global->local
    local_pt_slots = jnp.full((pl,), -1, jnp.int32).at[
        jnp.where(pt_g2l >= 0, pt_g2l, pl - 1)
    ].set(jnp.where(pt_g2l >= 0, jnp.arange(P, dtype=jnp.int32), -1))
    pt_local_valid = local_pt_slots >= 0
    pts_local = jnp.where(
        pt_local_valid[:, None],
        m.pt_pos[jnp.clip(local_pt_slots, 0, P - 1)],
        0.0,
    )

    # --- fixed observers: non-local KFs seeing local points ---------------
    all_binds_local = jnp.where(
        m.kf_feat_valid & (m.kf_obs_point >= 0),
        jnp.take(pt_in, jnp.clip(m.kf_obs_point, 0, P - 1)),
        False,
    )                                                        # [K, F]
    see_count = jnp.sum(all_binds_local, axis=1)
    see_count = jnp.where(m.kf_valid & (~is_local), see_count, 0)
    fix_w, fix_slots = jax.lax.top_k(see_count, kfix)
    fix_ok = fix_w > 0

    # --- edges: (KO + KFIX) x F slots ------------------------------------
    all_slots = jnp.concatenate([local_slots, fix_slots])    # [KO+KFIX]
    all_ok = jnp.concatenate([local_ok, fix_ok])
    kf_xy = m.kf_xy[all_slots]
    kf_ur = m.kf_uright[all_slots]
    kf_oct = m.kf_octave[all_slots]
    kf_binds = m.kf_obs_point[all_slots]
    kf_bok = m.kf_feat_valid[all_slots] & (kf_binds >= 0) & all_ok[:, None]

    e_pt_local = jnp.where(
        kf_bok, jnp.take(pt_g2l, jnp.clip(kf_binds, 0, P - 1)), -1
    )
    e_valid = kf_bok & (e_pt_local >= 0)

    n_all = all_slots.shape[0]
    e_kf = jnp.broadcast_to(
        jnp.arange(n_all, dtype=jnp.int32)[:, None], (n_all, F)
    ).reshape(-1)
    e_pt = jnp.clip(e_pt_local, 0, pl - 1).reshape(-1)
    sigma2 = jnp.power(
        jnp.float32(scale_factor), 2.0 * kf_oct.astype(jnp.float32)
    ).reshape(-1)
    e_uv = kf_xy.reshape(-1, 2)
    e_ur = kf_ur.reshape(-1)
    e_ok = e_valid.reshape(-1)
    e_src_kf = jnp.broadcast_to(
        all_slots[:, None], (n_all, F)
    ).reshape(-1)
    e_src_feat = jnp.broadcast_to(
        jnp.arange(F, dtype=jnp.int32)[None, :], (n_all, F)
    ).reshape(-1)

    # --- compress the (KO+KFIX)*F edge slots to EL real edges ------------
    # Every per-iteration LM op (residuals, Jacobians, 4 scatter-adds) is
    # linear in the edge count; at KITTI feature budgets only ~15-30% of the
    # dense slots hold a real edge, so solving on the compressed set is a
    # 3-4x device-time cut.  Row-major order puts optimizable-KF edges
    # first: if the EL cap overflows, fixed-observer edges drop first.
    rank = jnp.cumsum(e_ok.astype(jnp.int32)) - 1
    dst = jnp.where(e_ok & (rank < el), rank, el)
    idx = jnp.arange(e_ok.shape[0], dtype=jnp.int32)
    el_src = jnp.zeros((el + 1,), jnp.int32).at[dst].max(idx)[:el]
    el_ok = jnp.zeros((el + 1,), bool).at[dst].set(e_ok)[:el]

    prob = BAProblem(
        T_opt=m.kf_T_cw[local_slots],
        opt_valid=local_ok,
        T_fix=m.kf_T_cw[fix_slots],
        fix_valid=fix_ok,
        pts=pts_local,
        pt_valid=pt_local_valid,
        e_kf=jnp.where(el_ok, e_kf[el_src], 0),
        e_pt=jnp.where(el_ok, e_pt[el_src], pl - 1),
        e_uv=jnp.where(el_ok[:, None], e_uv[el_src], 0.0),
        e_ur=jnp.where(el_ok, e_ur[el_src], -1.0),
        e_sigma2=jnp.where(el_ok, sigma2[el_src], 1.0),
        e_valid=el_ok,
    )
    return LocalBAExtract(
        prob=prob,
        local_kf_slots=jnp.where(local_ok, local_slots, -1),
        local_pt_slots=local_pt_slots,
        e_src_kf=jnp.where(el_ok, e_src_kf[el_src], 0),
        e_src_feat=jnp.where(el_ok, e_src_feat[el_src], F - 1),
        window_kf_slots=jnp.where(all_ok, all_slots, -1),
    )


@jax.jit
def write_back_local_ba(m: MapState, ext: LocalBAExtract, T_opt, pts,
                        edge_inlier) -> MapState:
    """Scatter optimized poses/points into the map and erase outlier
    observations (the under-map-lock update, reference:
    src/orboptimizer.cpp:735-798)."""
    K, P = m.kf_capacity, m.pt_capacity
    kf_ok = ext.local_kf_slots >= 0
    kf_tgt = jnp.where(kf_ok, ext.local_kf_slots, K - 1)
    kf_T = jnp.where(kf_ok[:, None, None], T_opt, m.kf_T_cw[kf_tgt])
    m = m._replace(kf_T_cw=m.kf_T_cw.at[kf_tgt].set(kf_T))

    pt_ok = ext.local_pt_slots >= 0
    pt_tgt = jnp.where(pt_ok, ext.local_pt_slots, P - 1)
    pt_new = jnp.where(pt_ok[:, None], pts, m.pt_pos[pt_tgt])
    m = m._replace(pt_pos=m.pt_pos.at[pt_tgt].set(pt_new))

    # erase outlier observations: edges that were active going in but failed
    # the final chi2 gate.  min-scatter: bad edges write -1, others write
    # INT_MAX (identity under min) — order-independent.
    bad = ext.prob.e_valid & (~edge_inlier)
    obs = m.kf_obs_point.at[ext.e_src_kf, ext.e_src_feat].min(
        jnp.where(bad, -1, jnp.iinfo(jnp.int32).max)
    )
    return m._replace(kf_obs_point=obs)


class GridExtract(NamedTuple):
    prob: "object"                 # GridBAProblem
    local_kf_slots: jnp.ndarray    # [KO] map keyframe slots (-1 pad)
    local_pt_slots: jnp.ndarray    # [PL] map point slots (-1 pad)
    window_kf_slots: jnp.ndarray   # [KO+KFIX] all window slots (-1 pad)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def extract_local_ba_grid(m: MapState, center_slot, ko: int = KO_DEFAULT,
                          kfix: int = KFIX_DEFAULT, pl: int = PL_DEFAULT,
                          scale_factor: float = 1.2) -> GridExtract:
    """Dense-grid local BA extraction (see optim/ba_grid.py): the window's
    [KW, F] binding tables ARE the edge set; the per-point observation
    table makes every landmark reduction a gather.  No edge compression,
    no per-iteration scatters."""
    from ..optim.ba_grid import GridBAProblem

    K, F, P = m.kf_capacity, m.feat_capacity, m.pt_capacity

    # --- optimizable window: center + best covisible (oldest first for the
    # gauge anchor, as in extract_local_ba) --------------------------------
    w = m.covis[center_slot].at[center_slot].set(-1)
    nb_w, nb_idx = jax.lax.top_k(w, ko - 1)
    local_slots = jnp.concatenate([jnp.array([center_slot]), nb_idx])
    local_ok = jnp.concatenate([jnp.array([True]), nb_w > 0])
    local_ok = local_ok & jnp.take(m.kf_valid, local_slots)
    ids = jnp.where(local_ok, jnp.take(m.kf_id, local_slots),
                    jnp.iinfo(jnp.int32).max)
    oldest_pos = jnp.argmin(ids)
    perm = jnp.arange(local_slots.shape[0])
    perm = perm.at[0].set(oldest_pos).at[oldest_pos].set(0)
    local_slots = local_slots[perm]
    local_ok = local_ok[perm]
    is_local = jnp.zeros((K,), bool).at[
        jnp.where(local_ok, local_slots, K - 1)
    ].set(local_ok)

    # --- local point set (rank-compressed to PL) --------------------------
    binds = m.kf_obs_point[local_slots]
    b_ok = m.kf_feat_valid[local_slots] & (binds >= 0) & local_ok[:, None]
    pt_in = jnp.zeros((P,), bool).at[jnp.where(b_ok, binds, P - 1)].set(b_ok)
    pt_in = pt_in.at[P - 1].set(False) & m.pt_valid
    rank = jnp.cumsum(pt_in.astype(jnp.int32)) - 1
    pt_g2l = jnp.where(pt_in & (rank < pl), rank, -1)
    local_pt_slots = jnp.full((pl,), -1, jnp.int32).at[
        jnp.where(pt_g2l >= 0, pt_g2l, pl - 1)
    ].set(jnp.where(pt_g2l >= 0, jnp.arange(P, dtype=jnp.int32), -1))
    pt_local_valid = local_pt_slots >= 0
    pts_local = jnp.where(
        pt_local_valid[:, None],
        m.pt_pos[jnp.clip(local_pt_slots, 0, P - 1)], 0.0,
    )

    # --- fixed observers --------------------------------------------------
    all_binds_local = jnp.where(
        m.kf_feat_valid & (m.kf_obs_point >= 0),
        jnp.take(pt_in, jnp.clip(m.kf_obs_point, 0, P - 1)), False,
    )
    see_count = jnp.sum(all_binds_local, axis=1)
    see_count = jnp.where(m.kf_valid & (~is_local), see_count, 0)
    fix_w, fix_slots = jax.lax.top_k(see_count, kfix)
    fix_ok = fix_w > 0

    # --- the grid ---------------------------------------------------------
    all_slots = jnp.concatenate([local_slots, fix_slots])      # [KW]
    all_ok = jnp.concatenate([local_ok, fix_ok])
    g_binds = m.kf_obs_point[all_slots]                        # [KW, F]
    g_bok = m.kf_feat_valid[all_slots] & (g_binds >= 0) & all_ok[:, None]
    g_pt = jnp.where(
        g_bok, jnp.take(pt_g2l, jnp.clip(g_binds, 0, P - 1)), -1
    )
    g_valid = g_bok & (g_pt >= 0)
    sigma2 = jnp.power(
        jnp.float32(scale_factor),
        2.0 * m.kf_octave[all_slots].astype(jnp.float32),
    )

    # observation table: feature index of local point p in window KF w.
    # One scatter per EXTRACT (not per LM iteration); scatter-min keeps the
    # lowest feature index when fusion bound a point twice in one KF.
    KW = all_slots.shape[0]
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (KW, F), 0)
    f_iota = jax.lax.broadcasted_iota(jnp.int32, (KW, F), 1)
    tgt_p = jnp.where(g_valid, jnp.clip(g_pt, 0, pl - 1), pl)
    obs_table = jnp.full((pl + 1, KW), F, jnp.int32).at[
        tgt_p, w_iota
    ].min(jnp.where(g_valid, f_iota, F))[:pl]
    obs_table = jnp.where(obs_table >= F, -1, obs_table)
    # dedup the GRID against the table: a point fused onto two features of
    # one keyframe keeps only the table's observation, so pose blocks,
    # landmark blocks and the Schur coupling all see the SAME edge set
    # (one observation per KF per point, reference semantics) — an
    # inconsistent system converges to a visibly different optimum
    sel = jnp.take_along_axis(
        obs_table[jnp.clip(g_pt, 0, pl - 1)],        # [KW, F, KW]
        w_iota[..., None], axis=2,
    )[..., 0]
    g_valid = g_valid & (sel == f_iota)

    # measurements gathered ONCE into the observation layout: the solver's
    # LM loop then touches no gathers at all (optim/ba_grid.py)
    g_uv = m.kf_xy[all_slots]
    g_ur = m.kf_uright[all_slots]
    obs_f = jnp.clip(obs_table, 0, F - 1)
    o_valid = obs_table >= 0
    w_rows = jnp.arange(KW)[None, :]
    o_uv = g_uv[w_rows, obs_f]
    o_ur = jnp.where(o_valid, g_ur[w_rows, obs_f], -1.0)
    o_sigma2 = jnp.where(o_valid, sigma2[w_rows, obs_f], 1.0)

    prob = GridBAProblem(
        T_all=m.kf_T_cw[all_slots],
        kf_valid=all_ok,
        pose_free=local_ok.at[0].set(False),   # oldest anchors the gauge
        pts=pts_local,
        pt_valid=pt_local_valid,
        g_pt=jnp.clip(g_pt, -1, pl - 1),
        g_uv=g_uv,
        g_ur=g_ur,
        g_sigma2=sigma2,
        g_valid=g_valid,
        obs_table=obs_table,
        o_uv=o_uv,
        o_ur=o_ur,
        o_sigma2=o_sigma2,
        o_valid=o_valid,
    )
    return GridExtract(
        prob=prob,
        local_kf_slots=jnp.where(local_ok, local_slots, -1),
        local_pt_slots=local_pt_slots,
        window_kf_slots=jnp.where(all_ok, all_slots, -1),
    )


@jax.jit
def write_back_local_ba_grid(m: MapState, ext: GridExtract, T_opt, pts,
                             grid_inlier) -> MapState:
    """Scatter optimized poses/points into the map and erase outlier
    observations (reference: src/orboptimizer.cpp:735-798)."""
    K, P = m.kf_capacity, m.pt_capacity
    kf_ok = ext.local_kf_slots >= 0
    kf_tgt = jnp.where(kf_ok, ext.local_kf_slots, K - 1)
    kf_T = jnp.where(kf_ok[:, None, None], T_opt, m.kf_T_cw[kf_tgt])
    m = m._replace(kf_T_cw=m.kf_T_cw.at[kf_tgt].set(kf_T))

    pt_ok = ext.local_pt_slots >= 0
    pt_tgt = jnp.where(pt_ok, ext.local_pt_slots, P - 1)
    pt_new = jnp.where(pt_ok[:, None], pts, m.pt_pos[pt_tgt])
    m = m._replace(pt_pos=m.pt_pos.at[pt_tgt].set(pt_new))

    # outlier erasure: active-going-in grid slots that failed the final gate
    prob = ext.prob
    bad = prob.g_valid & (~grid_inlier) & (ext.window_kf_slots >= 0)[:, None]
    KW, F = bad.shape
    rows = jnp.where(
        (ext.window_kf_slots >= 0)[:, None],
        jnp.broadcast_to(ext.window_kf_slots[:, None], (KW, F)), K - 1,
    )
    cols = jax.lax.broadcasted_iota(jnp.int32, (KW, F), 1)
    obs = m.kf_obs_point.at[rows, cols].min(
        jnp.where(bad, -1, jnp.iinfo(jnp.int32).max)
    )
    return m._replace(kf_obs_point=obs)


def local_mapping_step(m: MapState, center_slot, config: SystemConfig,
                       ko: int = KO_DEFAULT, kfix: int = KFIX_DEFAULT,
                       pl: int = PL_DEFAULT,
                       update_covis: bool = True, counts=None,
                       el: int = EL_DEFAULT):
    """Full local-BA pass around a newly inserted keyframe (dense-grid
    scatter-free solver, optim/ba_grid.py).

    ``counts``: optional observation counts threaded through — the outlier
    observations erased by the post-BA chi2 gate decrement their points'
    counts and ``(m, counts)`` is returned."""
    from ..optim.ba_grid import bundle_adjust_grid

    cam = config.camera
    ext = extract_local_ba_grid(
        m, center_slot, ko, kfix, pl, config.orb.scale_factor
    )
    res = bundle_adjust_grid(
        ext.prob, fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy, bf=cam.bf,
    )
    m = write_back_local_ba_grid(m, ext, res.T_opt, res.pts, res.grid_inlier)
    # refresh point statistics after the window settles (reference refreshes
    # descriptors/normals in SearchInNeighbors, src/mapping.cpp:627-640).
    from .map_state import refresh_windowed

    m = refresh_windowed(m, ext.local_pt_slots, ext.window_kf_slots)
    if update_covis:
        m = m._replace(covis=recompute_covisibility(m))
    if counts is None:
        return m
    P = m.pt_capacity
    bad = ext.prob.g_valid & (~res.grid_inlier)
    gpt = ext.local_pt_slots[jnp.clip(ext.prob.g_pt, 0, pl - 1)]  # [KW, F]
    counts = counts.at[
        jnp.where(bad & (gpt >= 0), jnp.clip(gpt, 0, P - 1), P - 1)
    ].add(-bad.astype(jnp.int32)).at[P - 1].set(0)
    counts = jnp.maximum(counts, 0)
    return m, counts
