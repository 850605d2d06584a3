"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from opendlv_perception_vision_orbslam2_tpu.ops import lie
from opendlv_perception_vision_orbslam2_tpu.parallel.sharded_pose import (
    make_sharded_pose_optimizer,
    pad_obs_to_multiple,
)
from opendlv_perception_vision_orbslam2_tpu.optim.pose_opt import PoseObs

CAM = dict(fx=320.0, fy=320.0, cx=256.0, cy=128.0, bf=160.0)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_pose_gn_matches_truth():
    rng = np.random.default_rng(0)
    n = 512
    p_w = np.stack(
        [rng.uniform(-10, 10, n), rng.uniform(-4, 4, n), rng.uniform(4, 40, n)],
        axis=-1,
    ).astype(np.float32)
    xi = np.array([0.3, -0.2, 0.4, 0.03, -0.02, 0.05], np.float32)
    T_true = np.asarray(lie.exp_se3(jnp.asarray(xi)))
    p_c = p_w @ T_true[:3, :3].T + T_true[:3, 3]
    uv = np.stack(
        [
            CAM["fx"] * p_c[:, 0] / p_c[:, 2] + CAM["cx"],
            CAM["fy"] * p_c[:, 1] / p_c[:, 2] + CAM["cy"],
        ],
        axis=-1,
    ).astype(np.float32)
    ur = (uv[:, 0] - CAM["bf"] / p_c[:, 2]).astype(np.float32)
    obs = PoseObs(
        p_w=jnp.asarray(p_w),
        uv=jnp.asarray(uv),
        u_right=jnp.asarray(ur),
        sigma2=jnp.ones((n,), jnp.float32),
        valid=jnp.ones((n,), bool),
    )

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("obs",))
    obs = pad_obs_to_multiple(obs, 8)
    sharding = NamedSharding(mesh, P("obs"))
    obs = jax.tree.map(lambda a: jax.device_put(a, sharding), obs)

    solve = make_sharded_pose_optimizer(mesh, "obs", **CAM, n_iters=10)
    d = jnp.asarray(np.array([0.1, -0.05, 0.1, 0.01, 0.01, -0.02], np.float32))
    T0 = lie.exp_se3(d) @ jnp.asarray(T_true)
    T_est, inliers, n_inl = solve(T0, obs)
    assert int(n_inl) > 0.9 * n

    err = np.asarray(lie.log_se3(jnp.asarray(T_true) @ lie.inv_T(T_est)))
    assert np.linalg.norm(err[:3]) < 1e-3
    assert np.linalg.norm(err[3:]) < 1e-4
    assert int(n_inl) == 512


def test_sharded_gba_matches_single_device():
    """Edge-sharded Schur-CG BA over the 8-device mesh must agree with the
    single-device solver."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_ba import CAM as BACAM, _make_ba_problem, _pose_errors
    from opendlv_perception_vision_orbslam2_tpu.optim.gba import (
        global_bundle_adjust,
    )
    from opendlv_perception_vision_orbslam2_tpu.parallel.sharded_ba import (
        make_sharded_gba,
        pad_edges_to_multiple,
        shard_problem,
    )

    T_gt, pts_gt, prob = _make_ba_problem(0)
    T_ref, pts_ref, _ = global_bundle_adjust(
        prob, **BACAM, n_outer=8, cg_iters=30
    )

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("edges",))
    prob_p = pad_edges_to_multiple(prob, 8)
    prob_s = shard_problem(prob_p, mesh, "edges")
    run = make_sharded_gba(mesh, "edges", **BACAM, n_outer=8, cg_iters=30)
    T_sh, pts_sh, cost = run(prob_s)

    errs_t, errs_r = _pose_errors(T_gt, np.asarray(T_sh))
    assert errs_t.max() < 0.02
    # sharded and single-device solutions agree tightly
    np.testing.assert_allclose(
        np.asarray(T_sh), np.asarray(T_ref), atol=5e-3
    )


def test_sharded_incremental_gba_production_path():
    """The PRODUCTION post-loop optimizer (models.global_ba.IncrementalGBA)
    must take the edge-sharded path when >1 device is present and agree
    with the single-device chunked solve on a REAL pipeline-built map
    (VERDICT r3 task 2)."""
    import dataclasses

    from opendlv_perception_vision_orbslam2_tpu.models.global_ba import (
        IncrementalGBA,
        extract_global_ba,
    )
    from opendlv_perception_vision_orbslam2_tpu.models.slam import StereoSlam
    from opendlv_perception_vision_orbslam2_tpu.optim.gba import (
        gba_init_carry,
        global_bundle_adjust_chunk,
    )
    from opendlv_perception_vision_orbslam2_tpu.utils import synthetic
    from opendlv_perception_vision_orbslam2_tpu.utils.config import (
        CameraConfig,
        OrbConfig,
        SystemConfig,
    )

    cfg = SystemConfig(
        camera=CameraConfig(fx=320.0, fy=320.0, cx=256.0, cy=128.0,
                            bf=160.0, width=512, height=256, fps=10.0),
        orb=OrbConfig(n_features=600, max_keypoints=1024, n_levels=4),
        max_keyframes=32, max_map_points=4096,
        initial_keyframes=32, initial_map_points=4096,
    )
    lefts, rights, _, _ = synthetic.render_stereo_sequence(
        cfg, n_frames=6, n_points=500, seed=3, step=0.5
    )
    slam = StereoSlam(cfg, enable_loop_closing=False,
                      enable_relocalization=False)
    for i in range(6):
        slam.process(lefts[i], rights[i], timestamp=i / 10.0)
    slam._try_adopt_mapping(force=True)
    m = slam.map
    cam = cfg.camera

    gba = IncrementalGBA(m, cfg, n_outer_total=3, cg_iters=8)
    assert gba._sharded is not None  # 8 virtual devices -> sharded path
    while not gba.step():
        pass
    T_sh, pts_sh = gba.carry[0], gba.carry[1]

    prob1 = extract_global_ba(m, cfg.orb.scale_factor)
    carry = gba_init_carry(prob1)
    for _ in range(3):
        carry = global_bundle_adjust_chunk(
            prob1, carry, fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
            bf=cam.bf, n_outer=1, cg_iters=8,
        )
    valid = np.asarray(m.pt_valid)
    np.testing.assert_allclose(
        np.asarray(T_sh), np.asarray(carry[0]), atol=5e-2
    )
    np.testing.assert_allclose(
        np.asarray(pts_sh)[valid], np.asarray(carry[1])[valid], atol=5e-1
    )
    # and the merge applies cleanly to the live map
    m2 = gba.merge(m)
    assert np.isfinite(np.asarray(m2.kf_T_cw)).all()
