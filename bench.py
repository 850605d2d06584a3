"""Benchmark: tracked frames/s per chip on a KITTI-sized synthetic stereo run.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference operates KITTI seq 00 at its --Camera.fps=15
real-time pacing target (reference: docker-compose.yml:43;
src/kittirunner.cpp:163-170 sleeps to hold that rate), which is also the
reference's keyframe-window operating point.  No KITTI data ships in this
environment (reference dataset dirs are empty stubs), so the bench renders a
KITTI-geometry synthetic sequence (1241x376, fx=718.856, bf=386.1448,
2000 ORB features, 8 levels) and measures the fused per-frame SLAM step.
"""

import json
import sys
import time

import numpy as np


def _probe_device() -> bool:
    """True if the default JAX backend executes a trivial program in time.
    The tunneled TPU backend can wedge hard (observed: init hangs forever),
    and a hung in-process init would poison this process too — probe in a
    subprocess so the bench can still fall back to CPU and report.  Wedges
    are transient (tunnel hiccups), so retry with growing timeouts before
    giving up on the chip: a CPU-fallback number is a last resort, not an
    answer."""
    import subprocess

    code = (
        "import numpy, jax, jax.numpy as jnp;"
        "numpy.asarray(jnp.ones((8,8)).sum());print('ok')"
    )
    for attempt, timeout_s in enumerate((90.0, 120.0, 240.0, 360.0)):
        try:
            res = subprocess.run(
                [sys.executable, "-c", code], timeout=timeout_s,
                capture_output=True, text=True,
            )
            if "ok" in res.stdout:
                return True
            print(f"device probe attempt {attempt + 1} failed "
                  f"(rc={res.returncode}): {res.stderr.strip()[-200:]}",
                  file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"device probe attempt {attempt + 1} timed out "
                  f"after {timeout_s:.0f}s", file=sys.stderr)
        # Observed wedge durations are 10-20 min; spacing the retries out
        # lets a wedged tunnel drain before the next (longer) attempt.
        time.sleep(30.0 * (attempt + 1))
    return False


def main():
    import os

    cpu_fallback = os.environ.get("ORBSLAM2_TPU_BENCH_CPU") == "1"
    if not cpu_fallback and not _probe_device():
        # The TPU plugin can wedge so hard that even `import jax` blocks
        # (observed with the tunneled backend).  Re-exec with the plugin's
        # site dir stripped from PYTHONPATH and CPU forced.
        print("device probe failed; re-exec on CPU", file=sys.stderr)
        env = dict(os.environ)
        env["PYTHONPATH"] = ":".join(
            p for p in env.get("PYTHONPATH", "").split(":")
            if p and "axon" not in p
        )
        env["JAX_PLATFORMS"] = "cpu"
        env["ORBSLAM2_TPU_BENCH_CPU"] = "1"
        os.execve(sys.executable, [sys.executable] + sys.argv, env)

    import jax
    import jax.numpy as jnp

    # Persistent compilation cache: a bench run earlier in the session (or a
    # previous round on the same machine) populates it, so the end-of-round
    # bench doesn't depend on the remote compile helper being healthy — the
    # tunnel wedge that forced round 1's CPU fallback hit exactly that path.
    # TPU only: XLA:CPU AOT cache entries are not portable across machine
    # types (the loader warns of feature mismatches up to SIGILL)
    if not cpu_fallback:
        try:
            cache_dir = os.environ.get(
                "ORBSLAM2_TPU_COMPILE_CACHE", "/root/.orbslam2_tpu_jax_cache"
            )
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.5
            )
        except Exception as e:  # cache support is best-effort
            print(f"compilation cache unavailable: {e}", file=sys.stderr)

    from opendlv_perception_vision_orbslam2_tpu.models.frontend import process_stereo
    from opendlv_perception_vision_orbslam2_tpu.models.tracking import (
        init_state,
        vo_step,
    )
    from opendlv_perception_vision_orbslam2_tpu.utils import synthetic, trajectory
    from opendlv_perception_vision_orbslam2_tpu.utils.config import SystemConfig

    cfg = SystemConfig()  # KITTI 00 geometry + ORB budget defaults
    n_frames = 24
    n_timed = 16

    print(f"rendering {n_frames} synthetic KITTI-sized frames...", file=sys.stderr)
    lefts, rights, gt_poses, _ = synthetic.render_stereo_sequence(
        cfg, n_frames=n_frames, n_points=900, seed=0, step=0.6
    )
    lefts = jax.device_put(lefts)
    rights = jax.device_put(rights)

    state = init_state(process_stereo(lefts[0], rights[0], cfg))

    def hard_sync(x):
        # np.asarray forces a real device round-trip; on the tunneled TPU
        # platform block_until_ready alone does not drain the queue.
        return np.asarray(jax.tree.leaves(x)[0])

    # Warm-up (compile) on the first frames.
    t_compile = time.time()
    inlier_log = []
    for i in range(1, n_frames - n_timed):
        state, T = vo_step(state, lefts[i], rights[i], cfg)
        inlier_log.append(state.n_inliers)
    hard_sync(state.n_inliers)
    print(f"compile+warmup: {time.time()-t_compile:.1f}s", file=sys.stderr)

    # Throughput: enqueue the timed frames back-to-back, fetch poses at the
    # end (pose readout overlaps compute in a real deployment; per-frame
    # latency is reported separately below).
    t0 = time.time()
    pose_handles = []
    for i in range(n_frames - n_timed, n_frames):
        state, T = vo_step(state, lefts[i], rights[i], cfg)
        pose_handles.append(T)
        inlier_log.append(state.n_inliers)
    hard_sync(state.n_inliers)
    dt = time.time() - t0
    fps = n_timed / dt

    # Per-frame latency with a forced sync each frame (includes tunnel RTT).
    t0 = time.time()
    n_lat = 4
    for i in range(n_frames - n_lat, n_frames):
        state, T = vo_step(state, lefts[i], rights[i], cfg)
        hard_sync(T)
    lat_ms = (time.time() - t0) / n_lat * 1e3

    inliers = [int(x) for x in np.asarray(jax.device_get(inlier_log))]
    print(f"frames/s={fps:.2f}  latency/frame={lat_ms:.1f} ms  "
          f"inliers per frame={inliers}", file=sys.stderr)
    if min(inliers[1:]) < 10:
        print("WARNING: tracking lost during bench", file=sys.stderr)

    # ---- FULL SLAM pipeline (keyframes + local BA + fusion + culling +
    # loop detection): the reference's benchmarkable path is the whole
    # system (src/kittirunner.cpp:99-173), not the VO slice --------------
    # bench capacities: sized so the 1.25-lap circuit never triggers a
    # capacity-bucket regrow (a regrow recompiles the whole per-frame
    # program inventory mid-timing)
    import dataclasses
    bench_cfg = dataclasses.replace(
        cfg, initial_keyframes=128, initial_map_points=16384
    )
    full_fps, worst_ms, kf_frames, ate_m, warm_s, loops = bench_full_slam(
        bench_cfg
    )

    baseline_fps = 15.0  # reference real-time operating point (see docstring)
    metric = "tracked_frames_per_s_full_slam_kitti_loop_circuit_stereo"
    if cpu_fallback:
        metric += "_CPU_FALLBACK_tpu_backend_unreachable"
    out = {
        "metric": metric,
        "value": round(full_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(full_fps / baseline_fps, 3),
        "vo_frames_per_s": round(fps, 2),
        "vo_latency_ms": round(lat_ms, 1),
        "worst_frame_ms": round(worst_ms, 1),
        "keyframe_frames": kf_frames,
        "loops_closed": loops,
        "ate_m": round(ate_m, 3),
        "warmup_s": round(warm_s, 1),
    }
    if loops < 1:
        out["warning_loops"] = "no loop closure fired in the timed window"
    # accuracy guard: speed must not be bought with accuracy (north-star
    # metric couples ATE RMSE with frames/s, BASELINE.md)
    if ate_m > 0.5:
        out["warning"] = f"ATE {ate_m:.3f} m exceeds the 0.5 m bound"
    print(json.dumps(out))


def _prewarm_variants(slam, cfg):
    """Touch every device-program variant the steady state (and the loop
    closure) reaches, so first-call tracing + compile-cache loads happen in
    warmup instead of inside the timed window (a variant first touched
    mid-timing once cost a 9.5 s worst-frame):

    - the queued/no-LBA mapping stage (InterruptBA drain path),
    - the Sim3 verification + masked-apply program (verify_and_apply),
    - the incremental post-loop GBA chunk programs.

    Everything here is DISCARDED — the map is functional, so running a
    stage on it and dropping the output has no effect on SLAM state."""
    import jax

    from opendlv_perception_vision_orbslam2_tpu.models import slam as slam_mod
    from opendlv_perception_vision_orbslam2_tpu.models.global_ba import (
        IncrementalGBA,
    )
    from opendlv_perception_vision_orbslam2_tpu.models.loop_closing import (
        verify_and_apply,
    )

    slam._try_adopt_mapping(force=True)
    slot = getattr(slam, "last_kf_slot", 0)
    m_d, aux_d = slam_mod.mapping_stage(
        slam.map, slot, cfg,
        do_triangulate=True, do_fuse=True, do_lba=False, do_cull=True,
    )
    jax.block_until_ready(aux_d)
    if slam.loop_closer is not None and slam.kf_nodes is not None:
        m_v, valid, _, _ = verify_and_apply(
            slam.map, slam.kf_nodes, slot, 0, -1, -1,
            jax.random.PRNGKey(0), cfg, True,
        )
        jax.block_until_ready(valid)  # expect-ids never match: map unchanged
    gba = IncrementalGBA(slam.map, cfg)
    gba.step()
    del m_d, gba


def bench_full_slam(cfg, n_frames: int = 260, n_warm: int = 36):
    """Steady-state throughput + worst-frame latency of StereoSlam.process
    (tracking + keyframe insertion + triangulation + fusion + local BA +
    culling + loop detection/closure + incremental GBA) on a KITTI-sized
    CLOSED-CIRCUIT drive: 1.25 laps of a radius-35 m circle, so the timed
    window contains a REAL loop closure (detection -> Sim3 verification ->
    essential-graph correction -> incremental GBA) — the reference's whole
    benchmarkable path including its LoopClosing thread
    (src/kittirunner.cpp:99-173, src/loopclosing.cpp:49-83)."""
    import jax

    from opendlv_perception_vision_orbslam2_tpu.models.slam import StereoSlam
    from opendlv_perception_vision_orbslam2_tpu.utils import synthetic

    print(f"rendering {n_frames} loop-circuit frames for the full-SLAM "
          f"bench...", file=sys.stderr)
    lefts, rights, gt_poses, _ = synthetic.render_loop_sequence(
        cfg, n_frames=n_frames, n_points=3200, seed=1,
        radius=35.0, laps=1.25,
        r_off_range=(6.0, 30.0), y_range=(-2.5, 2.0),
        lateral_range=(-14.0, 14.0),
    )
    lefts = jax.device_put(np.asarray(lefts))
    rights = jax.device_put(np.asarray(rights))

    slam = StereoSlam(cfg)
    gt_used = []
    # warmup: compiles the tracking step AND the keyframe stage programs
    t0 = time.time()
    for i in range(n_warm):
        T = slam.process(lefts[i], rights[i], timestamp=i / 15.0)
        if T is not None:
            gt_used.append(np.asarray(gt_poses[i]))
    _prewarm_variants(slam, cfg)
    warm_s = time.time() - t0
    print(f"full-SLAM compile+warmup: {warm_s:.1f}s "
          f"(kfs={slam.n_keyframes})", file=sys.stderr)

    times = []
    kf_before = slam.n_keyframes
    pose_handles = []
    for i in range(n_warm, n_frames):
        t1 = time.time()
        T = slam.process(lefts[i], rights[i], timestamp=i / 15.0)
        times.append(time.time() - t1)
        if T is not None:
            # keep DEVICE handles: a per-frame np.asarray costs a full
            # tunnel RTT (~25 ms) inside the timed loop; deployment
            # consumers read poses asynchronously (the OD4 publisher)
            pose_handles.append(T)
            gt_used.append(np.asarray(gt_poses[i]))
    del pose_handles
    total = sum(times)
    fps = len(times) / total
    worst_ms = max(times) * 1e3
    kf_frames = slam.n_keyframes - kf_before
    slam.finish()   # settle in-flight verify/GBA so loops_closed is final

    # accuracy alongside throughput (north-star: ATE RMSE + frames/s) on
    # the RETRO-CORRECTED trajectory: each frame re-expressed through its
    # reference keyframe's final pose, the reference's trajectory-dump
    # semantics (SaveTrajectoryKITTI, src/tracking.cpp:1449-1536) — raw
    # online poses straddle the pre-/post-loop-closure frames and misstate
    # the accuracy the system actually delivers at dump time.
    from opendlv_perception_vision_orbslam2_tpu.utils.trajectory import ate_rmse
    est_corr = slam.corrected_trajectory()
    assert len(est_corr) == len(gt_used), (len(est_corr), len(gt_used))
    ate_m = ate_rmse(est_corr, gt_used, align=True)
    print(
        f"full-SLAM frames/s={fps:.2f} worst-frame={worst_ms:.1f} ms "
        f"median={np.median(times)*1e3:.1f} ms keyframes={kf_frames} "
        f"map_pts={int(np.asarray(slam.map.pt_valid).sum())} "
        f"lost={slam.lost} ate={ate_m:.3f} m loops={slam.loops_closed}",
        file=sys.stderr,
    )
    return fps, worst_ms, kf_frames, ate_m, warm_s, slam.loops_closed


if __name__ == "__main__":
    main()
