"""Local bundle adjustment on the dense (window-KF x feature) grid.

Replaces g2o's LocalBundleAdjustment solve (reference:
src/orboptimizer.cpp:463-798) for the production mapping stage.  The
edge-list formulation in optim/ba.py assembles its normal equations with
``.at[].add`` scatters — 6 scatter passes per LM iteration, and XLA:TPU
lowers arbitrary-index scatter-add to a serialized loop (measured: the 15
LM iterations cost ~87 ms of the 146 ms keyframe stage on v5e).

TPU-first restructure: keep the edges in their NATURAL dense layout — the
``[KW, F]`` binding grid of the window keyframes — plus a per-point
OBSERVATION TABLE ``obs_table [PL, KW]`` (feature index of point p in
window keyframe w, -1 if unobserved; each point has at most one observation
per keyframe, exactly the reference's per-KF observation map).  Then every
reduction in the LM iteration is either

- a row reduction over F (pose blocks Hpp, b_p), or
- a gather along obs_table followed by a reduction over KW (landmark
  blocks Hll, b_l, the coupling Hpl, and the landmark back-substitution),

i.e. pure einsums and gathers — zero scatters anywhere in the loop.  The
Schur-reduced camera system is dense [6*KO, 6*KO] like before.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import lie
from .ba import CHI2_MONO, CHI2_STEREO, _inv3x3


class GridBAProblem(NamedTuple):
    """Dense-grid local BA problem.

    ``KW = KO + KFIX`` window keyframes (first ``KO`` optimizable), ``F``
    feature slots each, ``PL`` local points.

    The SOLVE runs natively on the observation-table layout ``[PL, KW]``
    (one slot per point x window-keyframe, measurements gathered once at
    extract) — per-LM-iteration work is then pure elementwise math +
    reductions, no gathers and no scatters.  The ``g_*`` grid views exist
    for the final per-feature inlier gate (observation erasure).
    """

    T_all: jnp.ndarray      # [KW, 4, 4] window poses (first KO optimized)
    kf_valid: jnp.ndarray   # [KW] bool
    pose_free: jnp.ndarray  # [KO] bool (valid AND not gauge-pinned)
    pts: jnp.ndarray        # [PL, 3]
    pt_valid: jnp.ndarray   # [PL] bool
    g_pt: jnp.ndarray       # [KW, F] int32 local point idx (PL-1 dump ok, <0 none)
    g_uv: jnp.ndarray       # [KW, F, 2]
    g_ur: jnp.ndarray       # [KW, F] (<0 mono)
    g_sigma2: jnp.ndarray   # [KW, F]
    g_valid: jnp.ndarray    # [KW, F] bool
    obs_table: jnp.ndarray  # [PL, KW] int32 feature idx (-1 none)
    o_uv: jnp.ndarray       # [PL, KW, 2] measured pixels per observation
    o_ur: jnp.ndarray       # [PL, KW] right-u (<0 mono)
    o_sigma2: jnp.ndarray   # [PL, KW]
    o_valid: jnp.ndarray    # [PL, KW] bool

    @property
    def n_opt(self) -> int:
        return self.pose_free.shape[0]


class GridBAResult(NamedTuple):
    T_opt: jnp.ndarray        # [KO, 4, 4]
    pts: jnp.ndarray          # [PL, 3]
    grid_inlier: jnp.ndarray  # [KW, F] bool (post-optimization chi2 gate)
    cost: jnp.ndarray


def _grid_terms(T_all, pts, prob: GridBAProblem, fx, fy, cx, cy, bf):
    """Residuals + Jacobians over the whole [KW, F] grid."""
    KW, F = prob.g_pt.shape
    PL = prob.pts.shape[0]
    p_idx = jnp.clip(prob.g_pt, 0, PL - 1)
    p_w = pts[p_idx]                                     # [KW, F, 3]
    R = T_all[:, :3, :3]
    t = T_all[:, :3, 3]
    p_c = jnp.einsum("wij,wfj->wfi", R, p_w) + t[:, None, :]
    x, y, z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z

    u_hat = fx * x * inv_z + cx
    v_hat = fy * y * inv_z + cy
    ur_hat = u_hat - bf * inv_z
    is_stereo = prob.g_ur >= 0
    r = jnp.stack(
        [
            prob.g_uv[..., 0] - u_hat,
            prob.g_uv[..., 1] - v_hat,
            jnp.where(is_stereo, prob.g_ur - ur_hat, 0.0),
        ],
        axis=-1,
    )                                                    # [KW, F, 3]
    zeros = jnp.zeros_like(z)
    du = jnp.stack([fx * inv_z, zeros, -fx * x * inv_z2], axis=-1)
    dv = jnp.stack([zeros, fy * inv_z, -fy * y * inv_z2], axis=-1)
    dur = du + jnp.stack([zeros, zeros, bf * inv_z2], axis=-1)
    d_pix = jnp.stack([du, dv, dur], axis=-2)            # [KW, F, 3, 3]

    I3 = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), p_c.shape + (3,))
    d_pc = jnp.concatenate([I3, -lie.hat(p_c)], axis=-1)  # [KW, F, 3, 6]
    J_pose = -jnp.einsum("wfij,wfjl->wfil", d_pix, d_pc)  # [KW, F, 3, 6]
    J_pt = -jnp.einsum("wfij,wjl->wfil", d_pix, R)        # [KW, F, 3, 3]
    behind = z <= 1e-6
    return r, J_pose, J_pt, is_stereo, behind


def _grid_chi2(r, sigma2, is_stereo):
    w = 1.0 / sigma2
    return jnp.where(
        is_stereo,
        jnp.sum(r * r, axis=-1) * w,
        (r[..., 0] ** 2 + r[..., 1] ** 2) * w,
    )


def _obs_terms(T_all, pts, prob: GridBAProblem, fx, fy, cx, cy, bf):
    """Residuals + Jacobians on the [PL, KW] observation layout — the
    per-iteration workhorse, gather-free."""
    R = T_all[:, :3, :3]                                  # [KW, 3, 3]
    t = T_all[:, :3, 3]
    p_c = jnp.einsum("wij,pj->pwi", R, pts) + t[None, :, :]  # [PL, KW, 3]
    x, y, z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z

    u_hat = fx * x * inv_z + cx
    v_hat = fy * y * inv_z + cy
    ur_hat = u_hat - bf * inv_z
    is_stereo = prob.o_ur >= 0
    r = jnp.stack(
        [
            prob.o_uv[..., 0] - u_hat,
            prob.o_uv[..., 1] - v_hat,
            jnp.where(is_stereo, prob.o_ur - ur_hat, 0.0),
        ],
        axis=-1,
    )                                                     # [PL, KW, 3]
    zeros = jnp.zeros_like(z)
    du = jnp.stack([fx * inv_z, zeros, -fx * x * inv_z2], axis=-1)
    dv = jnp.stack([zeros, fy * inv_z, -fy * y * inv_z2], axis=-1)
    dur = du + jnp.stack([zeros, zeros, bf * inv_z2], axis=-1)
    d_pix = jnp.stack([du, dv, dur], axis=-2)             # [PL, KW, 3, 3]

    I3 = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), p_c.shape + (3,))
    d_pc = jnp.concatenate([I3, -lie.hat(p_c)], axis=-1)  # [PL, KW, 3, 6]
    J_pose = -jnp.einsum("pwij,pwjl->pwil", d_pix, d_pc)
    J_pt = -jnp.einsum("pwij,wjl->pwil", d_pix, R)
    behind = z <= 1e-6
    return r, J_pose, J_pt, is_stereo, behind


@functools.partial(
    jax.jit,
    static_argnames=("fx", "fy", "cx", "cy", "bf", "iters_first",
                     "iters_second"),
)
def bundle_adjust_grid(prob: GridBAProblem, *, fx: float, fy: float,
                       cx: float, cy: float, bf: float,
                       iters_first: int = 5, iters_second: int = 10):
    """Two-phase LM (5 its -> chi2 cut -> 10 its) like the reference
    schedule (src/orboptimizer.cpp:681-730), scatter- and gather-free in
    the iteration loop.  (A 4+8 trim was A/B'd on v5e but the tunnel's
    round-trip variance confounded the comparison; the reference-faithful
    schedule is kept.)"""
    KW, F = prob.g_pt.shape
    KO = prob.n_opt
    PL = prob.pts.shape[0]
    T_fix = prob.T_all[KO:]
    delta_mono = jnp.sqrt(CHI2_MONO)
    delta_stereo = jnp.sqrt(CHI2_STEREO)

    obs_ok = prob.obs_table >= 0
    free_row = jnp.concatenate(
        [prob.pose_free, jnp.zeros((KW - KO,), bool)]
    )                                                    # [KW]

    def robust_cost(T_opt, pts, active):
        T_all = jnp.concatenate([T_opt, T_fix], axis=0)
        r, _, _, is_stereo, behind = _obs_terms(
            T_all, pts, prob, fx, fy, cx, cy, bf
        )
        chi2 = _grid_chi2(r, prob.o_sigma2, is_stereo)
        d2 = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
        c = jnp.where(chi2 <= d2, chi2, 2.0 * jnp.sqrt(d2 * chi2) - d2)
        c = jnp.where(behind, 2.0 * jnp.sqrt(d2 * 1e8), c)
        return jnp.sum(jnp.where(active, c, 0.0))

    def lm_phase(T_opt, pts, active, n_iters):
        def body(carry, _):
            T_opt, pts, lam, prev_cost = carry
            T_all = jnp.concatenate([T_opt, T_fix], axis=0)
            r, Jp_t, Jl_t, is_stereo, behind = _obs_terms(
                T_all, pts, prob, fx, fy, cx, cy, bf
            )
            ok = active & (~behind)
            chi = jnp.sqrt(jnp.maximum(
                _grid_chi2(r, prob.o_sigma2, is_stereo), 1e-12
            ))
            delta = jnp.where(is_stereo, delta_stereo, delta_mono)
            huber_w = jnp.where(chi <= delta, 1.0, delta / chi)
            w = jnp.where(ok, huber_w / prob.o_sigma2, 0.0)
            w_t = jnp.stack(
                [jnp.ones_like(w), jnp.ones_like(w),
                 jnp.where(is_stereo, 1.0, 0.0)], axis=-1
            ) * w[..., None]                             # [PL, KW, 3]

            r_t = r
            # pose blocks: reduce over the point axis per window KF
            w_free = w_t * free_row[None, :, None]
            wJp_t = Jp_t * w_free[..., None]
            Hpp = jnp.einsum("pwri,pwrj->wij", wJp_t, Jp_t)[:KO]
            b_p = -jnp.einsum("pwri,pwr->wi", wJp_t, r_t)[:KO]

            # landmark blocks: reduce over the window axis per point
            wJl = Jl_t * w_t[..., None]
            Hll = jnp.einsum("pwri,pwrj->pij", wJl, Jl_t)
            b_l = -jnp.einsum("pwri,pwr->pi", wJl, r_t)
            # coupling W[k, p] only over optimizable poses
            Hpl = jnp.einsum("pwri,pwrj->pwij", wJp_t, Jl_t)[:, :KO]

            # damping + freezing
            Hpp_d = Hpp + lam * jnp.eye(6, dtype=r.dtype)[None]
            Hpp_d = jnp.where(
                prob.pose_free[:, None, None], Hpp_d,
                jnp.eye(6, dtype=r.dtype)[None],
            )
            Hll_d = Hll + lam * jnp.eye(3, dtype=r.dtype)[None]
            Hll_d = jnp.where(
                prob.pt_valid[:, None, None], Hll_d,
                jnp.eye(3, dtype=r.dtype)[None],
            )
            b_p_m = jnp.where(prob.pose_free[:, None], b_p, 0.0)
            b_l_m = jnp.where(prob.pt_valid[:, None], b_l, 0.0)
            Hll_inv = _inv3x3(Hll_d)

            # Schur: S = blkdiag(Hpp) - W Hll^-1 W^T
            A = jnp.einsum("pkij,pjl->pkil", Hpl, Hll_inv)   # [PL,KO,6,3]
            S_off = jnp.einsum("pkil,pqml->kiqm", A, Hpl)    # [KO,6,KO,6]
            S = -S_off
            diag_idx = jnp.arange(KO)
            S = S.at[diag_idx, :, diag_idx, :].add(Hpp_d)
            S = S.reshape(KO * 6, KO * 6)
            rhs = (
                b_p_m - jnp.einsum("pkil,pl->ki", A, b_l_m)
            ).reshape(KO * 6)

            dx_c = jnp.linalg.solve(
                S + 1e-8 * jnp.eye(KO * 6, dtype=r.dtype), rhs
            )
            dx_c = jnp.where(jnp.all(jnp.isfinite(dx_c)), dx_c, 0.0)
            dx_c6 = dx_c.reshape(KO, 6)
            # back-substitute landmarks (gathered, no scatter)
            Wt_dx = jnp.einsum("pkij,ki->pj", Hpl, dx_c6)
            dx_l = jnp.einsum("pij,pj->pi", Hll_inv, b_l_m - Wt_dx)
            dx_l = jnp.where(prob.pt_valid[:, None], dx_l, 0.0)

            T_new = jax.vmap(lambda d, T: lie.exp_se3(d) @ T)(dx_c6, T_opt)
            T_new = jnp.where(prob.pose_free[:, None, None], T_new, T_opt)
            pts_new = pts + dx_l

            new_cost = robust_cost(T_new, pts_new, active)
            accept = new_cost < prev_cost
            T_keep = jnp.where(accept, T_new, T_opt)
            pts_keep = jnp.where(accept, pts_new, pts)
            lam_next = jnp.clip(
                jnp.where(accept, lam * 0.5, lam * 4.0), 1e-8, 1e4
            )
            cost_keep = jnp.where(accept, new_cost, prev_cost)
            return (T_keep, pts_keep, lam_next, cost_keep), None

        init_cost = robust_cost(T_opt, pts, active)
        (T_opt, pts, _, cost), _ = jax.lax.scan(
            body, (T_opt, pts, jnp.asarray(1e-4, T_opt.dtype), init_cost),
            None, length=n_iters,
        )
        return T_opt, pts, cost

    base_active = (
        obs_ok & prob.o_valid
        & prob.pt_valid[:, None]
        & prob.kf_valid[None, :]
    )
    T_opt0 = prob.T_all[:KO]
    T_opt, pts, _ = lm_phase(T_opt0, prob.pts, base_active, iters_first)

    # chi2 outlier cut between phases
    T_all = jnp.concatenate([T_opt, T_fix], axis=0)
    r, _, _, is_stereo, behind = _obs_terms(
        T_all, pts, prob, fx, fy, cx, cy, bf
    )
    chi2 = _grid_chi2(r, prob.o_sigma2, is_stereo)
    th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    active = base_active & (chi2 <= th) & (~behind)

    T_opt, pts, cost = lm_phase(T_opt, pts, active, iters_second)

    # final PER-FEATURE inlier gate on the [KW, F] grid (drives observation
    # erasure in the caller) — one grid evaluation after the solve
    T_all = jnp.concatenate([T_opt, T_fix], axis=0)
    rg, _, _, st_g, behind_g = _grid_terms(
        T_all, pts, prob, fx, fy, cx, cy, bf
    )
    chi2_g = _grid_chi2(rg, prob.g_sigma2, st_g)
    th_g = jnp.where(st_g, CHI2_STEREO, CHI2_MONO)
    g_active = (
        prob.g_valid
        & jnp.take(prob.pt_valid, jnp.clip(prob.g_pt, 0, PL - 1))
        & prob.kf_valid[:, None]
    )
    inlier = g_active & (chi2_g <= th_g) & (~behind_g)
    cost = robust_cost(T_opt, pts, active)
    return GridBAResult(T_opt=T_opt, pts=pts, grid_inlier=inlier, cost=cost)
