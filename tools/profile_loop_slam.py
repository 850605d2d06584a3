"""Per-phase wall timing of StereoSlam._step on the LOOP drive (bench geometry).

Wraps the stage entry points with timers (no logic duplication): frontend,
tracking program, decision sync, insert dispatch, mapping-stage adoption,
keyframe registration (vocab/db/loop detection), GBA servicing.

Usage:  python tools/profile_full_slam.py [n_frames]
Env:    JAX_PLATFORMS=cpu for structural (not absolute) numbers.
"""
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

try:
    cache_dir = os.environ.get(
        "ORBSLAM2_TPU_COMPILE_CACHE", "/root/.orbslam2_tpu_jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception as e:
    print(f"compile cache unavailable: {e}", file=sys.stderr)

from opendlv_perception_vision_orbslam2_tpu.models import slam as slam_mod
from opendlv_perception_vision_orbslam2_tpu.utils import synthetic
from opendlv_perception_vision_orbslam2_tpu.utils.config import SystemConfig

cfg = SystemConfig(initial_keyframes=128, initial_map_points=16384)
n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
print("backend:", jax.default_backend(), flush=True)

lefts, rights, gt, _ = synthetic.render_loop_sequence(
    cfg, n_frames=n, n_points=3200, seed=1, radius=35.0, laps=1.25 * n / 260,
    r_off_range=(6.0, 30.0), y_range=(-2.5, 2.0), lateral_range=(-14.0, 14.0),
)
lefts = jax.device_put(np.asarray(lefts))
rights = jax.device_put(np.asarray(rights))

TIMES: dict = {}


def sync(x):
    leaves = jax.tree.leaves(x)
    if leaves:
        jax.block_until_ready(leaves[0])
        np.asarray(leaves[0]) if hasattr(leaves[0], "shape") else None
    return x


def wrap(name, fn, do_sync=True):
    def inner(*a, **k):
        t0 = time.time()
        out = fn(*a, **k)
        if do_sync:
            sync(out)
        TIMES.setdefault(name, []).append(time.time() - t0)
        return out
    return inner


slam_mod.track_frame_with_map = wrap(
    "track_program", slam_mod.track_frame_with_map)
orig_mapping_stage = slam_mod.mapping_stage
slam_mod.insert_stage = wrap("insert_stage", slam_mod.insert_stage)
slam_mod.mapping_stage = wrap("mapping_stage", slam_mod.mapping_stage)

from opendlv_perception_vision_orbslam2_tpu.models import frontend as fe_mod
slam_mod.process_stereo = wrap("frontend", slam_mod.process_stereo)

SS = slam_mod.StereoSlam
SS._register_keyframe = wrap("kf_register", SS._register_keyframe,
                             do_sync=False)
SS._service_gba = wrap("service_gba", SS._service_gba, do_sync=False)

slam = SS(cfg)
t0 = time.time()
frame_times = []
for i in range(n):
    t1 = time.time()
    slam.process(lefts[i], rights[i], timestamp=i / 15.0)
    frame_times.append(time.time() - t1)
    if i == n // 2:
        print(f"  half way: {time.time()-t0:.0f}s kfs={slam.n_keyframes}",
              flush=True)
print(f"total: {time.time()-t0:.1f}s  kfs={slam.n_keyframes} "
      f"pts={int(np.asarray(slam.map.pt_valid).sum())} lost={slam.lost}")

print(f"\n{'stage':<16}{'n':>4}{'first(ms)':>11}{'median(ms)':>12}"
      f"{'total(s)':>10}{'last3(ms)':>22}")
for k, v in TIMES.items():
    ms = [x * 1e3 for x in v]
    tail = ", ".join(f"{x:.0f}" for x in ms[-3:])
    print(f"{k:<16}{len(ms):>4}{ms[0]:>11.0f}"
          f"{np.median(ms[1:] or ms):>12.1f}{sum(v):>10.2f}  [{tail}]")
steady = frame_times[n // 2:]
print(f"\nsteady-state fps={len(steady)/sum(steady):.2f} "
      f"median={np.median(steady)*1e3:.0f} ms worst={max(steady)*1e3:.0f} ms")
