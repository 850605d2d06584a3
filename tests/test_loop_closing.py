"""Loop closing end-to-end at the geometry level: a drifted circular
trajectory re-observes its start region; detection + Horn RANSAC + essential
graph must snap the loop shut."""

import numpy as np
import jax
import jax.numpy as jnp

from opendlv_perception_vision_orbslam2_tpu.models import map_state as ms
from opendlv_perception_vision_orbslam2_tpu.models import vocabulary as voc
from opendlv_perception_vision_orbslam2_tpu.models.frame import FrameState, empty_features
from opendlv_perception_vision_orbslam2_tpu.models.kfdb import add_keyframe, empty_kfdb
from opendlv_perception_vision_orbslam2_tpu.models.loop_closing import LoopCloser
from opendlv_perception_vision_orbslam2_tpu.ops import lie
from opendlv_perception_vision_orbslam2_tpu.utils.config import (
    CameraConfig,
    OrbConfig,
    SystemConfig,
)

CAM = CameraConfig(fx=320.0, fy=320.0, cx=256.0, cy=128.0, bf=160.0,
                   width=512, height=256)
CFG = SystemConfig(camera=CAM, orb=OrbConfig(max_keypoints=512))
F = 512
LAP = 20        # keyframes per full circle
N_KF = 26       # 1.3 laps: the revisit spans several keyframes so the
                # 3-consecutive-detection consistency gate can accumulate
RADIUS = 20.0   # big enough that views never cross the circle interior


def _ring_world(n_per_kf=30, seed=0):
    """Scatter points in front of every ground-truth pose, so consecutive
    poses (and the closing first/last pair) share visible points."""
    rng = np.random.default_rng(seed)
    pts = []
    for i in range(LAP):
        T_wc = np.linalg.inv(_gt_pose(i))
        local = np.stack(
            [
                rng.uniform(-5, 5, n_per_kf),
                rng.uniform(-2, 2, n_per_kf),
                rng.uniform(3.0, 12.0, n_per_kf),
            ],
            axis=-1,
        )
        pts.append(local @ T_wc[:3, :3].T + T_wc[:3, 3])
    pts = np.concatenate(pts).astype(np.float32)
    descs = rng.integers(0, 2**32, (len(pts), 8), dtype=np.uint32)
    return pts, descs


def _gt_pose(i):
    th = 2 * np.pi * i / LAP
    c = np.array([RADIUS * np.sin(th), 0.0, RADIUS * (1 - np.cos(th))])
    R_wc = np.array(
        [[np.cos(th), 0, np.sin(th)], [0, 1, 0], [-np.sin(th), 0, np.cos(th)]]
    )
    T_wc = np.eye(4)
    T_wc[:3, :3] = R_wc
    T_wc[:3, 3] = c
    return np.linalg.inv(T_wc).astype(np.float32)


def _frame_for(T_cw_obs, T_cw_store, pts, descs):
    """Observations from the TRUE pose, stored pose drifted."""
    p_c = pts @ T_cw_obs[:3, :3].T + T_cw_obs[:3, 3]
    z = p_c[:, 2]
    vis = (z > 1.0) & (z < 14.0) & (np.abs(p_c[:, 0] / np.maximum(z, 1e-3)) < 0.7)
    idx = np.nonzero(vis)[0][:F]
    n = len(idx)
    u = CAM.fx * p_c[idx, 0] / p_c[idx, 2] + CAM.cx
    v = CAM.fy * p_c[idx, 1] / p_c[idx, 2] + CAM.cy
    ur = u - CAM.bf / p_c[idx, 2]
    feats = empty_features(F)._replace(
        xy=jnp.zeros((F, 2)).at[:n].set(
            jnp.asarray(np.stack([u, v], -1).astype(np.float32))),
        desc=jnp.zeros((F, 8), jnp.uint32).at[:n].set(jnp.asarray(descs[idx])),
        u_right=jnp.full((F,), -1.0).at[:n].set(jnp.asarray(ur.astype(np.float32))),
        depth=jnp.full((F,), -1.0).at[:n].set(
            jnp.asarray(p_c[idx, 2].astype(np.float32))),
        valid=jnp.zeros((F,), bool).at[:n].set(True),
    )
    point_cam = jnp.zeros((F, 3)).at[:n].set(jnp.asarray(p_c[idx]))
    return FrameState(
        features=feats, T_cw=jnp.asarray(T_cw_store),
        point_cam=point_cam, timestamp=jnp.asarray(0.0),
    ), idx


def test_loop_closing_corrects_drift():
    pts, descs = _ring_world()
    vocab = voc.train_vocabulary(descs, branching=8, levels=3, seed=1)

    gt = [_gt_pose(i) for i in range(N_KF)]
    # drifted odometry: constant small yaw bias accumulates
    rng = np.random.default_rng(2)
    drifted = [gt[0]]
    bias = lie.exp_se3(jnp.asarray(
        np.array([0.01, 0, 0.01, 0, 0.004, 0], np.float32)))
    for i in range(1, N_KF):
        rel = gt[i] @ np.linalg.inv(gt[i - 1])
        drifted.append((np.asarray(bias) @ rel @ drifted[-1]).astype(np.float32))

    m = ms.empty_map(32, 32768, F)
    db = empty_kfdb(32, vocab.n_words)
    kf_nodes = -jnp.ones((32, F), jnp.int32)
    closer = LoopCloser(CFG)
    closer.last_loop_kf_id = -100
    closed_any = False

    closed_at = None
    # consecutive KFs share bindings (covisibility), but associations lapse
    # after a few KFs out of view — the revisit creates DUPLICATE points,
    # exactly the situation loop closure exists to repair
    slot_of_world = -np.ones(len(pts), np.int64)
    last_seen = np.full(len(pts), -100)
    for i in range(N_KF):
        frame, idx = _frame_for(gt[i], drifted[i], pts, descs)
        tracked = -np.ones(F, np.int32)
        fresh = (i - last_seen[idx]) <= 3
        tracked[: len(idx)] = np.where(fresh, slot_of_world[idx], -1)
        m, slot = ms.insert_keyframe(
            m, frame, jnp.asarray(tracked), 20.0
        )
        binds = np.asarray(m.kf_obs_point[slot])
        slot_of_world[idx] = binds[: len(idx)]
        last_seen[idx] = i
        words, nodes = voc.transform(
            vocab, m.kf_desc[slot], m.kf_feat_valid[slot]
        )
        db = add_keyframe(db, slot, voc.bow_vector(vocab, words))
        kf_nodes = kf_nodes.at[slot].set(nodes)
        m, closed, _ = closer.on_keyframe(m, db, kf_nodes, int(slot))
        if closed and closed_at is None:
            closed_at = i
            break  # evaluate at the closure keyframe (a live system would
                   # continue tracking from the corrected pose)

    assert closed_at is not None, "no loop closure fired"

    def err(T_est, T_gt):
        d = np.asarray(lie.log_se3(jnp.asarray(
            T_gt @ np.linalg.inv(np.asarray(T_est)).astype(np.float32))))
        return np.linalg.norm(d[:3])

    before = err(drifted[closed_at], gt[closed_at])
    after = err(np.asarray(m.kf_T_cw[closed_at]), gt[closed_at])
    assert before > 0.2, before
    assert after < 0.5 * before, (closed_at, before, after)
