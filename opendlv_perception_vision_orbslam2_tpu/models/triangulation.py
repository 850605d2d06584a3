"""New map-point triangulation against covisible keyframes.

Re-designs Mapping::CreateNewMapPoints (reference: src/mapping.cpp:280-525)
+ ORBmatcher::SearchForTriangulation (reference: src/orbmatcher.cpp:665-832):
for the freshly inserted keyframe and each of its best covisible neighbours,
match unbound features along the epipolar constraint, DLT-triangulate, and
keep candidates passing the parallax / cheirality / reprojection-chi2 /
scale-consistency gates.  Monocular depends on this entirely; stereo uses it
to densify beyond the close stereo band (the reference's far-point source).

Array form: each (new KF, neighbour) pair is one dense masked program —
``[F, F]`` BoW-node-gated Hamming with an epipolar-distance gate, batched
DLT via the shared SVD triangulator, and rank-allocated point slots.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops import lie
from ..ops.hamming import MAX_DIST, TH_LOW, hamming_matrix
from ..utils.config import SystemConfig
from .map_state import MapState, _alloc_point_slots, recompute_covisibility

N_TRI_NEIGHBORS = 10   # stereo (mono uses 20, reference: src/mapping.cpp:286)
TRI_CAND_CAP = 512     # matched candidates triangulated per pair (see below)


def _fundamental_from_poses(T1_cw, T2_cw, K):
    """F12 such that x2^T F12 x1 = 0 (ComputeF12, reference:
    src/mapping.cpp:712-724)."""
    T12 = T1_cw @ lie.inv_T(T2_cw)
    R12 = T12[:3, :3]
    t12 = T12[:3, 3]
    E = lie.hat(t12) @ R12
    K_inv = jnp.linalg.inv(K)
    return K_inv.T @ E @ K_inv


def _triangulate_pair(m: MapState, kf1, kf2, config: SystemConfig,
                      enabled, counts=None):
    """Scan body: create new points from unmatched features of kf1/kf2;
    ``enabled=False`` makes the whole pass a masked no-op (invalid
    neighbour slots in the fixed-size top-k list).  With ``counts`` given,
    returns ``(m, counts)`` with the new points' observation counts set."""
    cam = config.camera
    P, F = m.pt_capacity, m.feat_capacity
    K = jnp.array([[cam.fx, 0, cam.cx], [0, cam.fy, cam.cy], [0, 0, 1.0]])

    T1 = m.kf_T_cw[kf1]
    T2 = m.kf_T_cw[kf2]
    c1 = lie.inv_T(T1)[:3, 3]
    c2 = lie.inv_T(T2)[:3, 3]
    baseline = jnp.linalg.norm(c2 - c1)

    unb1 = m.kf_feat_valid[kf1] & (m.kf_obs_point[kf1] < 0)
    unb2 = m.kf_feat_valid[kf2] & (m.kf_obs_point[kf2] < 0)
    xy1 = m.kf_xy[kf1]
    xy2 = m.kf_xy[kf2]
    oct1 = m.kf_octave[kf1]
    oct2 = m.kf_octave[kf2]

    # epipolar gate: distance of kp2 to the epipolar line of kp1
    F12 = _fundamental_from_poses(T1, T2, K)
    ones = jnp.ones((F, 1))
    x1h = jnp.concatenate([xy1, ones], axis=1)
    lines2 = x1h @ F12.T                                     # [F, 3]
    num = (
        lines2[:, None, 0] * xy2[None, :, 0]
        + lines2[:, None, 1] * xy2[None, :, 1]
        + lines2[:, None, 2]
    ) ** 2
    den = lines2[:, None, 0] ** 2 + lines2[:, None, 1] ** 2
    sigma2_2 = jnp.power(
        jnp.float32(config.orb.scale_factor), 2.0 * oct2.astype(jnp.float32)
    )
    epi_ok = num / jnp.maximum(den, 1e-9) < 3.84 * sigma2_2[None, :]
    # not-too-close-to-epipole (mono guard, reference: src/orbmatcher.cpp:740-756)
    ep2 = lie.project(
        lie.transform_points(T2[None], c1[None, None, :])[0],
        cam.fx, cam.fy, cam.cx, cam.cy,
    )[0]
    d_ep = jnp.sum((xy2 - ep2[None, :]) ** 2, axis=1)
    scale2 = jnp.power(jnp.float32(config.orb.scale_factor), oct2.astype(jnp.float32))
    epipole_ok = d_ep >= 100.0 * scale2

    oct_ok = jnp.abs(oct1[:, None] - oct2[None, :]) <= 1
    gate = (
        epi_ok & oct_ok
        & unb1[:, None] & (unb2 & epipole_ok)[None, :]
    )
    dist = hamming_matrix(m.kf_desc[kf1], m.kf_desc[kf2])
    big = MAX_DIST + 1
    d = jnp.where(gate, dist, big)
    best2 = jnp.argmin(d, axis=1)
    best_d = jnp.take_along_axis(d, best2[:, None], axis=1)[:, 0]
    matched = best_d <= TH_LOW

    # one kf1 feature per kf2 feature
    dd = jnp.where(matched, best_d, big)
    best_per_2 = jnp.full((F,), big, dd.dtype).at[best2].min(dd)
    keep = matched & (dd <= jnp.take(best_per_2, best2))
    order = jnp.arange(F)
    first = jnp.full((F,), F).at[best2].min(jnp.where(keep, order, F))
    keep = keep & (jnp.take(first, best2) == order)

    # --- compress matched candidates to TRI_CAND_CAP rows ----------------
    # DLT (a batched 4x4 SVD, the stage's hottest op) and every gate below
    # are per-candidate; at most a few hundred of the F feature rows survive
    # ``keep``, so running them dense wastes ~4x device time per pair.
    # Semantics unchanged: same candidates, same math, overflow beyond the
    # cap is dropped (cap is ~2x the densest observed pair).
    C = TRI_CAND_CAP
    crank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    cdst = jnp.where(keep & (crank < C), crank, C)
    c_src = jnp.zeros((C + 1,), jnp.int32).at[cdst].max(order)[:C]
    c_ok = jnp.zeros((C + 1,), bool).at[cdst].set(keep)[:C]

    xy1_c = xy1[c_src]
    oct1_c = oct1[c_src]
    ur1_c = m.kf_uright[kf1][c_src]
    b2_c = best2[c_src]
    uv2_c = xy2[b2_c]
    oct2_c = oct2[b2_c]
    ur2_c = m.kf_uright[kf2][b2_c]

    # triangulate
    P1 = K @ T1[:3, :]
    P2 = K @ T2[:3, :]
    X = lie.triangulate_linear(P1, P2, xy1_c, uv2_c)         # [C, 3]

    # gates: cheirality, reprojection, parallax, scale consistency
    pc1 = lie.transform_points(T1[None], X[None])[0]
    pc2 = lie.transform_points(T2[None], X[None])[0]
    z_ok = (pc1[:, 2] > 0.05) & (pc2[:, 2] > 0.05)

    uv1_hat = lie.project(pc1, cam.fx, cam.fy, cam.cx, cam.cy)
    uv2_hat = lie.project(pc2, cam.fx, cam.fy, cam.cx, cam.cy)
    sigma2_1 = jnp.power(
        jnp.float32(config.orb.scale_factor), 2.0 * oct1_c.astype(jnp.float32)
    )
    sigma2_2c = jnp.power(
        jnp.float32(config.orb.scale_factor), 2.0 * oct2_c.astype(jnp.float32)
    )
    e1 = jnp.sum((uv1_hat - xy1_c) ** 2, axis=1)
    e2 = jnp.sum((uv2_hat - uv2_c) ** 2, axis=1)
    # stereo-observed features additionally check the right-image coordinate
    # (3-DoF chi2 at 7.815, reference: src/mapping.cpp:434-470).  Without
    # this a DLT candidate can contradict the feature's OWN disparity; the
    # resulting pair of inconsistent stereo edges later makes local BA drag
    # the point to a bogus compromise depth and erase the good observation.
    z1s = jnp.maximum(pc1[:, 2], 1e-6)
    z2s = jnp.maximum(pc2[:, 2], 1e-6)
    ur1_hat = uv1_hat[:, 0] - cam.bf / z1s
    ur2_hat = uv2_hat[:, 0] - cam.bf / z2s
    e1_tot = jnp.where(ur1_c >= 0, e1 + (ur1_c - ur1_hat) ** 2, e1)
    e2_tot = jnp.where(ur2_c >= 0, e2 + (ur2_c - ur2_hat) ** 2, e2)
    th1 = jnp.where(ur1_c >= 0, 7.815, 5.991)
    th2 = jnp.where(ur2_c >= 0, 7.815, 5.991)
    reproj_ok = (e1_tot <= th1 * sigma2_1) & (e2_tot <= th2 * sigma2_2c)

    r1 = X - c1
    r2 = X - c2
    d1 = jnp.linalg.norm(r1, axis=1) + 1e-9
    d2 = jnp.linalg.norm(r2, axis=1) + 1e-9
    cos_par = jnp.sum(r1 * r2, axis=1) / (d1 * d2)
    parallax_ok = cos_par < 0.9998

    ratio_dist = d2 / d1
    ratio_octave = jnp.power(
        jnp.float32(config.orb.scale_factor),
        (oct2_c - oct1_c).astype(jnp.float32),
    )
    rf = 1.5 * config.orb.scale_factor
    scale_ok = (ratio_dist < ratio_octave * rf) & (
        ratio_dist > ratio_octave / rf
    )

    want = (
        c_ok & z_ok & reproj_ok & parallax_ok & scale_ok
        & (baseline > 0.01) & enabled
    )

    # allocate + write new points
    slots = _alloc_point_slots(m.pt_valid, want)
    created = slots >= 0
    safe = jnp.where(created, slots, P - 1)

    view = X - c1
    normal = view / (jnp.linalg.norm(view, axis=1, keepdims=True) + 1e-9)
    scale1 = jnp.power(
        jnp.float32(config.orb.scale_factor), oct1_c.astype(jnp.float32)
    )
    max_dist = d1 * scale1
    min_dist = max_dist / jnp.power(
        jnp.float32(config.orb.scale_factor), float(config.orb.n_levels - 1)
    )

    def upd(arr, vals):
        mask = created.reshape((-1,) + (1,) * (vals.ndim - 1))
        return arr.at[safe].set(jnp.where(mask, vals, arr[safe]))

    m = m._replace(
        pt_valid=m.pt_valid.at[safe].set(created | m.pt_valid[safe]),
        pt_pos=upd(m.pt_pos, X),
        pt_desc=upd(m.pt_desc, m.kf_desc[kf1][c_src]),
        pt_normal=upd(m.pt_normal, normal),
        pt_min_dist=upd(m.pt_min_dist, min_dist),
        pt_max_dist=upd(m.pt_max_dist, max_dist),
        pt_ref_kf=upd(m.pt_ref_kf, jnp.full((C,), 0, jnp.int32) + kf1),
        pt_first_kf_id=upd(
            m.pt_first_kf_id, jnp.full((C,), 0, jnp.int32) + m.kf_id[kf1]
        ),
        pt_visible=upd(m.pt_visible, jnp.ones((C,), jnp.int32)),
        pt_found=upd(m.pt_found, jnp.ones((C,), jnp.int32)),
    )
    # bind in both keyframes
    row1 = m.kf_obs_point[kf1].at[jnp.where(created, c_src, 0)].max(
        jnp.where(created, slots, -1)
    )
    f2_tgt = jnp.where(created, b2_c, 0)
    row2 = m.kf_obs_point[kf2].at[f2_tgt].max(jnp.where(created, slots, -1))
    m = m._replace(
        kf_obs_point=m.kf_obs_point.at[kf1].set(row1).at[kf2].set(row2)
    )
    if counts is None:
        return m
    # each created point starts with its two triangulating observations
    counts = counts.at[safe].set(
        jnp.where(created, 2, counts[safe])
    )
    return m, counts


@functools.partial(jax.jit, static_argnums=(3,))
def triangulate_with_neighbor(m: MapState, kf1, kf2, config: SystemConfig):
    """Single-pair entry point (tests / mono bootstrap)."""
    m = _triangulate_pair(m, kf1, kf2, config, jnp.asarray(True))
    return m._replace(covis=recompute_covisibility(m))


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def create_new_map_points(m: MapState, new_kf_slot, config: SystemConfig,
                          n_neighbors: int = N_TRI_NEIGHBORS,
                          update_covis: bool = True, counts=None):
    """Triangulate against the best covisible neighbours — ONE jitted
    program: device top-k neighbour selection + lax.scan over the pair
    body (no host covis read, no per-neighbour dispatch; the keyframe
    stage stays fully asynchronous on a remote device).

    ``update_covis=False`` skips the tail covisibility rebuild — callers
    chaining several map passes per keyframe rebuild once at the end.
    ``counts``: optional observation counts threaded through (returns
    ``(m, counts)`` when given)."""
    w = m.covis[new_kf_slot]
    _, nbrs = jax.lax.top_k(w, n_neighbors)
    wv = jnp.take(w, nbrs)
    with_counts = counts is not None

    def body(carry, i):
        if with_counts:
            mm, cnt = carry
            mm, cnt = _triangulate_pair(
                mm, new_kf_slot, nbrs[i], config, wv[i] > 0, cnt
            )
            return (mm, cnt), None
        mm = _triangulate_pair(
            carry, new_kf_slot, nbrs[i], config, wv[i] > 0
        )
        return mm, None

    init = (m, counts) if with_counts else m
    out, _ = jax.lax.scan(body, init, jnp.arange(n_neighbors))
    m = out[0] if with_counts else out
    if update_covis:
        m = m._replace(covis=recompute_covisibility(m))
    return (m, out[1]) if with_counts else m
