"""Prototype: full-SLAM bench on a KITTI-scale CLOSED-CIRCUIT drive.

Measures per-frame times across a real loop closure + incremental GBA so the
headline bench (bench.py) can adopt the geometry with known numbers.
Run on the TPU: python tools/bench_loop_proto.py [n_frames] [radius] [laps]
"""
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.orbslam2_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from opendlv_perception_vision_orbslam2_tpu.models.slam import StereoSlam
from opendlv_perception_vision_orbslam2_tpu.utils import synthetic, trajectory
from opendlv_perception_vision_orbslam2_tpu.utils.config import SystemConfig


def main():
    import os
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 150
    radius = float(sys.argv[2]) if len(sys.argv) > 2 else 35.0
    laps = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    n_warm = 24

    cfg = SystemConfig(initial_keyframes=int(os.environ.get('IK','128')), initial_map_points=int(os.environ.get('IP','16384')))
    print(f"rendering {n_frames} KITTI-sized loop frames "
          f"(r={radius}, laps={laps})...", file=sys.stderr)
    t0 = time.time()
    lefts, rights, gt, _ = synthetic.render_loop_sequence(
        cfg, n_frames=n_frames, n_points=3200, seed=1,
        radius=radius, laps=laps,
        r_off_range=(6.0, 30.0), y_range=(-2.5, 2.0),
        lateral_range=(-14.0, 14.0),
        sprite_r=int(os.environ.get("SR", "3")),
        coarse=int(os.environ.get("CO", "4")),
    )
    lefts = jax.device_put(np.asarray(lefts))
    rights = jax.device_put(np.asarray(rights))
    print(f"render: {time.time()-t0:.1f}s", file=sys.stderr)

    slam = StereoSlam(
        cfg,
        enable_loop_closing=os.environ.get("NOLOOP") != "1",
        enable_relocalization=os.environ.get("NORELOC") != "1",
    )
    est_poses, gt_used = [], []
    t0 = time.time()
    for i in range(n_warm):
        T = slam.process(lefts[i], rights[i], timestamp=i / 15.0)
        if T is not None:
            est_poses.append(np.asarray(T))
            gt_used.append(np.asarray(gt[i]))
    print(f"warmup: {time.time()-t0:.1f}s kfs={slam.n_keyframes}",
          file=sys.stderr)

    times = []
    pose_handles = []
    loop_at = []
    lost = 0
    lost_frames = []
    inliers = []
    slow = []
    kfs_prev = slam.n_keyframes
    for i in range(n_warm, n_frames):
        healthy_pre = getattr(slam, "_pipeline_healthy", None)
        t1 = time.time()
        T = slam.process(lefts[i], rights[i], timestamp=i / 15.0)
        dt = time.time() - t1
        times.append(dt)
        if dt > 0.08:
            slow.append((i, round(dt*1e3), slam.n_keyframes - kfs_prev,
                         healthy_pre, slam._verify_pending is not None))
        kfs_prev = slam.n_keyframes
        if slam.lost:
            lost += 1
            lost_frames.append(i)
        if T is not None:
            pose_handles.append(T)
            gt_used.append(np.asarray(gt[i]))
        if len(loop_at) < slam.loops_closed:
            loop_at.append((i, dt * 1e3))
    est_poses.extend(np.asarray(jax.device_get(pose_handles)))
    total = sum(times)
    fps = len(times) / total
    ate = trajectory.ate_rmse(est_poses, gt_used, align=True)
    ts = np.asarray(times) * 1e3
    order = np.argsort(ts)[::-1][:8]
    print(f"fps={fps:.2f} median={np.median(ts):.1f} ms "
          f"worst={ts.max():.1f} ms lost={lost} loops={slam.loops_closed} "
          f"kfs={slam.n_keyframes} ate={ate:.3f} m", file=sys.stderr)
    h=len(ts)//2
    print(f"median first-half={np.median(ts[:h]):.1f} ms last-half={np.median(ts[h:]):.1f} ms",
          file=sys.stderr)
    print("top frames (idx_in_timed, ms):",
          [(int(i), round(float(ts[i]), 1)) for i in order], file=sys.stderr)
    print("loops closed at:", loop_at, file=sys.stderr)
    print("slow frames (i, ms, kf_delta, healthy_pre, verify_inflight):",
          slow, file=sys.stderr)
    print("lost frames:", lost_frames, file=sys.stderr)
    print("inliers:", inliers, file=sys.stderr)


if __name__ == "__main__":
    main()
