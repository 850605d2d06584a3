"""Matrix-free Schur-CG global BA must match the dense local BA solver."""

import numpy as np
import jax.numpy as jnp

from opendlv_perception_vision_orbslam2_tpu.optim.ba import bundle_adjust
from opendlv_perception_vision_orbslam2_tpu.optim.gba import global_bundle_adjust
from opendlv_perception_vision_orbslam2_tpu.ops import lie

from test_ba import CAM, _make_ba_problem, _pose_errors


def test_gba_converges_like_dense_ba():
    T_gt, pts_gt, prob = _make_ba_problem(0)
    T_opt, pts, cost = global_bundle_adjust(prob, **CAM, n_outer=12,
                                            cg_iters=30)
    errs_t, errs_r = _pose_errors(T_gt, np.asarray(T_opt))
    assert errs_t.max() < 0.02, errs_t
    assert errs_r.max() < 0.005, errs_r
    pt_err = np.linalg.norm(np.asarray(pts) - pts_gt, axis=1)
    assert np.median(pt_err / pts_gt[:, 2]) < 0.02


def test_gba_handles_outliers():
    T_gt, pts_gt, prob = _make_ba_problem(2, outlier_frac=0.15)
    T_opt, pts, cost = global_bundle_adjust(prob, **CAM, n_outer=12,
                                            cg_iters=30)
    errs_t, _ = _pose_errors(T_gt, np.asarray(T_opt))
    assert errs_t.max() < 0.06


def test_gba_large_problem_smoke():
    """Scale check: 40 poses x 3000 points x ~30k edges — a size where the
    dense-W local solver would need a 40x3000 block matrix."""
    rng = np.random.default_rng(11)
    n_poses, n_pts = 40, 3000
    pts = np.stack(
        [rng.uniform(-30, 30, n_pts), rng.uniform(-5, 5, n_pts),
         rng.uniform(5, 60, n_pts)], axis=-1,
    ).astype(np.float32)
    from opendlv_perception_vision_orbslam2_tpu.optim.ba import BAProblem

    T_gt, e_kf, e_pt, e_uv, e_ur = [], [], [], [], []
    for k in range(n_poses):
        xi = np.zeros(6, np.float32)
        xi[2] = -0.8 * k
        T = np.asarray(lie.exp_se3(jnp.asarray(xi)))
        T_gt.append(T)
        p_c = pts @ T[:3, :3].T + T[:3, 3]
        vis = (p_c[:, 2] > 2.0) & (p_c[:, 2] < 40.0)
        cand = np.nonzero(vis)[0]
        sel = cand[rng.permutation(len(cand))[:800]]
        u = CAM["fx"] * p_c[sel, 0] / p_c[sel, 2] + CAM["cx"]
        v = CAM["fy"] * p_c[sel, 1] / p_c[sel, 2] + CAM["cy"]
        ur = u - CAM["bf"] / p_c[sel, 2]
        for j, uu, vv, rr in zip(sel, u, v, ur):
            e_kf.append(k)
            e_pt.append(j)
            e_uv.append([uu + rng.normal(0, 0.4), vv + rng.normal(0, 0.4)])
            e_ur.append(rr)
    T_gt = np.stack(T_gt)
    E = len(e_kf)

    T0 = T_gt.copy()
    for k in range(1, n_poses):
        d = (rng.standard_normal(6) * 0.01).astype(np.float32)
        T0[k] = np.asarray(lie.exp_se3(jnp.asarray(d))) @ T_gt[k]
    pts0 = pts + rng.standard_normal(pts.shape).astype(np.float32) * 0.1

    prob = BAProblem(
        T_opt=jnp.asarray(T0),
        opt_valid=jnp.ones((n_poses,), bool),
        T_fix=jnp.eye(4, dtype=jnp.float32)[None],
        fix_valid=jnp.zeros((1,), bool),
        pts=jnp.asarray(pts0),
        pt_valid=jnp.ones((n_pts,), bool),
        e_kf=jnp.asarray(e_kf, jnp.int32),
        e_pt=jnp.asarray(e_pt, jnp.int32),
        e_uv=jnp.asarray(np.asarray(e_uv, np.float32)),
        e_ur=jnp.asarray(np.asarray(e_ur, np.float32)),
        e_sigma2=jnp.ones((E,), jnp.float32),
        e_valid=jnp.ones((E,), bool),
    )
    T_opt, pts_o, cost = global_bundle_adjust(prob, **CAM, n_outer=12,
                                              cg_iters=40)
    errs_t, _ = _pose_errors(T_gt, np.asarray(T_opt))
    # With most landmarks at 30-60 m, stereo depth sigma is metres, so the
    # chain-end forward translation is genuinely uncertain: assert a
    # noise-consistent bound plus a real cost reduction, not mm recovery.
    assert errs_t.max() < 0.15, errs_t.max()
    assert np.median(errs_t) < 0.03, np.median(errs_t)
    # cost must reach the vicinity of the measurement-noise floor
    n_edges = int(np.sum(np.asarray(prob.e_valid)))
    assert float(cost) < 1.0 * n_edges, (float(cost), n_edges)
