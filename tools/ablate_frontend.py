"""Queued ablation timings of the stereo front-end at the bench operating
point.  Each variant is ONE jitted program, timed with back-to-back enqueues
(dispatch overlaps compute, like the bench throughput mode) so per-call
tunnel overhead cancels.  Used to direct optimization work."""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from opendlv_perception_vision_orbslam2_tpu.models import extractor
from opendlv_perception_vision_orbslam2_tpu.models.frontend import process_stereo
from opendlv_perception_vision_orbslam2_tpu.models.tracking import init_state, vo_step
from opendlv_perception_vision_orbslam2_tpu.ops import fast as fast_ops
from opendlv_perception_vision_orbslam2_tpu.ops import image as image_ops
from opendlv_perception_vision_orbslam2_tpu.ops import orb as orb_ops
from opendlv_perception_vision_orbslam2_tpu.ops import stereo as stereo_ops
from opendlv_perception_vision_orbslam2_tpu.utils import synthetic
from opendlv_perception_vision_orbslam2_tpu.utils.config import SystemConfig

USE_PALLAS_FAST = "--pallas" in sys.argv
if USE_PALLAS_FAST:
    from opendlv_perception_vision_orbslam2_tpu.ops import fast_pallas


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
    print(f"{name:46s} {dt:8.3f} ms")
    return out


def main():
    cfg = SystemConfig()
    ocfg = cfg.orb
    print("backend:", jax.default_backend(), "pallas_fast:", USE_PALLAS_FAST,
          file=sys.stderr)
    lefts, rights, gt, _ = synthetic.render_stereo_sequence(
        cfg, n_frames=3, n_points=900, seed=0, step=0.6
    )
    L, R = jax.device_put(lefts[1]), jax.device_put(rights[1])
    both = jnp.stack([L, R])

    def pyramid(im):
        return tuple(image_ops.build_pyramid(im, ocfg.n_levels, ocfg.scale_factor))

    def fast_stage(levels):
        outs = []
        for lv in levels:
            if USE_PALLAS_FAST:
                s = fast_pallas.fast_nms(lv, float(ocfg.min_th_fast))
            else:
                s, _ = fast_ops.fast_with_fallback(
                    lv, float(ocfg.ini_th_fast), float(ocfg.min_th_fast))
                s = fast_ops.nms_scores(s)
            outs.append(fast_ops.mask_border(s, extractor.EDGE_BORDER))
        return tuple(outs)

    budgets = extractor.per_level_budgets(
        ocfg.n_features, ocfg.scale_factor, ocfg.n_levels)

    def select_stage(levels):
        outs = []
        for s, b in zip(fast_stage(levels), budgets):
            outs.append(extractor._select_level_keypoints(
                s, s > float(ocfg.ini_th_fast), b, ocfg.cell_size))
        return tuple(outs)

    def patch_stage(levels):
        sels = select_stage(levels)
        return tuple(orb_ops.extract_patches(lv, s[0])
                     for lv, s in zip(levels, sels))

    def desc_stage(levels):
        ps = patch_stage(levels)
        angs = tuple(orb_ops.ic_angles_from_patches(p) for p in ps)
        return tuple(orb_ops.brief_from_patches(p, a) for p, a in zip(ps, angs))

    timeit("A pyramid (both eyes)", jax.jit(jax.vmap(pyramid)), both)
    timeit("B A+fast+nms", jax.jit(jax.vmap(lambda im: fast_stage(pyramid(im)))), both)
    timeit("C B+select", jax.jit(jax.vmap(lambda im: select_stage(pyramid(im)))), both)
    timeit("D C+patches", jax.jit(jax.vmap(lambda im: patch_stage(pyramid(im)))), both)
    timeit("E D+angles+brief", jax.jit(jax.vmap(lambda im: desc_stage(pyramid(im)))), both)
    timeit("F process_stereo (full FE)", jax.jit(lambda l, r: process_stereo(l, r, cfg)), L, R)

    state = init_state(process_stereo(lefts[0], rights[0], cfg))
    timeit("G vo_step (full frame)", jax.jit(lambda s, l, r: vo_step(s, l, r, cfg)), state, L, R)


if __name__ == "__main__":
    main()
