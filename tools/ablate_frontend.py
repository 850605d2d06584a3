"""Queued ablation timings of the stereo front-end at the bench operating
point.  Each variant is ONE jitted program, timed with back-to-back enqueues
(dispatch overlaps compute, like the bench throughput mode) so per-call
tunnel overhead cancels.  Used to direct optimization work.

Env: ORBSLAM2_TPU_PATCH_GATHER / ORBSLAM2_TPU_SAD_GATHER select gather impls.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from opendlv_perception_vision_orbslam2_tpu.models import extractor
from opendlv_perception_vision_orbslam2_tpu.models.frontend import process_stereo
from opendlv_perception_vision_orbslam2_tpu.models.tracking import init_state, vo_step
from opendlv_perception_vision_orbslam2_tpu.ops import image as image_ops
from opendlv_perception_vision_orbslam2_tpu.ops import orb as orb_ops
from opendlv_perception_vision_orbslam2_tpu.ops import stereo as stereo_ops
from opendlv_perception_vision_orbslam2_tpu.utils import synthetic
from opendlv_perception_vision_orbslam2_tpu.utils.config import SystemConfig


def hard_sync(x):
    return np.asarray(jax.tree.leaves(x)[0])


def timeit(name, fn, *args, reps=40):
    out = fn(*args)
    hard_sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    hard_sync(out)
    dt = (time.time() - t0) / reps * 1e3
    print(f"{name:46s} {dt:8.3f} ms", flush=True)
    return out


def main():
    cfg = SystemConfig()
    ocfg = cfg.orb
    print("backend:", jax.default_backend(), file=sys.stderr)
    lefts, rights, gt, _ = synthetic.render_stereo_sequence(
        cfg, n_frames=3, n_points=900, seed=0, step=0.6
    )
    L, R = jax.device_put(lefts[1]), jax.device_put(rights[1])
    both = jnp.stack([L, R])

    def pyramids(both):
        lv = jax.vmap(
            lambda im: image_ops.build_pyramid(im, ocfg.n_levels, ocfg.scale_factor)
        )(both)
        return tuple(l[0] for l in lv), tuple(l[1] for l in lv)

    def levels_lr(both):
        return jax.vmap(
            lambda im: image_ops.build_pyramid(im, ocfg.n_levels, ocfg.scale_factor)
        )(both)

    def select(both):
        lv = levels_lr(both)
        return extractor._select_pyramid_keypoints(lv, ocfg), lv

    def gather(both):
        sel, lv = select(both)
        p = extractor._gather_all_patches(lv, sel[4], sel[5], ocfg)
        return jnp.sum(p), sel, lv

    def describe(both):
        sel, lv = select(both)
        p = extractor._gather_all_patches(lv, sel[4], sel[5], ocfg)
        ang = orb_ops.ic_angles_from_patches(p)
        return orb_ops.brief_from_patches(p, ang), ang, sel, lv

    def extract(both):
        lv = levels_lr(both)
        return extractor.extract_from_pyramid_pair(lv, ocfg), lv

    def stereo(both):
        (fl, fr), lv = extract(both)
        al, offs = stereo_ops.build_atlas([l[0] for l in lv])
        ar, _ = stereo_ops.build_atlas([l[1] for l in lv])
        return stereo_ops.stereo_match(
            fl, fr, al, ar, offs, ocfg.scale_factor, cfg.camera.fx, cfg.camera.bf)

    timeit("A pyramid (both eyes)", jax.jit(pyramids), both)
    timeit("B A+fast+nms+select", jax.jit(select), both)
    timeit("C B+atlas+patch gather", jax.jit(gather), both)
    timeit("D C+angles+brief", jax.jit(describe), both)
    timeit("E D->Features (pair extract)", jax.jit(extract), both)
    timeit("F E+stereo match", jax.jit(stereo), both)
    timeit("G process_stereo (full FE)",
           jax.jit(lambda l, r: process_stereo(l, r, cfg)), L, R)

    state = init_state(process_stereo(lefts[0], rights[0], cfg))
    timeit("H vo_step (full frame)",
           jax.jit(lambda s, l, r: vo_step(s, l, r, cfg)), state, L, R)


if __name__ == "__main__":
    main()
