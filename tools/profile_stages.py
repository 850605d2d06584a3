"""Per-stage device timing at the bench operating point (KITTI-sized stereo).

Times each front-end kernel stage and the fused steps on the default JAX
backend.  Used to direct optimization work; not part of the test suite.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from opendlv_perception_vision_orbslam2_tpu.models import extractor
from opendlv_perception_vision_orbslam2_tpu.models.frontend import process_stereo
from opendlv_perception_vision_orbslam2_tpu.models.tracking import init_state, vo_step
from opendlv_perception_vision_orbslam2_tpu.ops import fast as fast_ops
from opendlv_perception_vision_orbslam2_tpu.ops import image as image_ops
from opendlv_perception_vision_orbslam2_tpu.ops import orb as orb_ops
from opendlv_perception_vision_orbslam2_tpu.ops import stereo as stereo_ops
from opendlv_perception_vision_orbslam2_tpu.utils import synthetic
from opendlv_perception_vision_orbslam2_tpu.utils.config import SystemConfig


def hard_sync(x):
    # np.asarray forces a real device round-trip; on the tunneled TPU
    # platform block_until_ready alone does not drain the queue.
    return np.asarray(jax.tree.leaves(x)[0])


def timeit(name, fn, *args, reps=20):
    out = fn(*args)
    hard_sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    hard_sync(out)
    dt = (time.time() - t0) / reps * 1e3
    print(f"{name:42s} {dt:8.3f} ms")
    return out


def main():
    cfg = SystemConfig()
    ocfg = cfg.orb
    print("backend:", jax.default_backend(), file=sys.stderr)
    lefts, rights, gt, _ = synthetic.render_stereo_sequence(
        cfg, n_frames=4, n_points=900, seed=0, step=0.6
    )
    L, R = jax.device_put(lefts[1]), jax.device_put(rights[1])

    # --- fused steps
    state = init_state(process_stereo(lefts[0], rights[0], cfg))
    f_vo = jax.jit(lambda s, l, r: vo_step(s, l, r, cfg))
    state2, T = f_vo(state, L, R)
    timeit("vo_step (full frame)", f_vo, state, L, R)
    f_fe = jax.jit(lambda l, r: process_stereo(l, r, cfg))
    timeit("process_stereo (front-end)", f_fe, L, R)

    # --- stacked L/R pyramid etc.
    both = jnp.stack([L, R])
    f_pyr = jax.jit(
        jax.vmap(lambda im: tuple(image_ops.build_pyramid(im, ocfg.n_levels, ocfg.scale_factor)))
    )
    levels = timeit("pyramid (both eyes)", f_pyr, both)

    def fast_all(levels):
        return tuple(
            fast_ops.mask_border(
                fast_ops.nms_scores(
                    fast_ops.fast_with_fallback(lv, float(ocfg.ini_th_fast), float(ocfg.min_th_fast))[0]
                ),
                extractor.EDGE_BORDER,
            )
            for lv in levels
        )

    f_fast = jax.jit(jax.vmap(fast_all))
    scoremaps = timeit("FAST+nms (all levels, both eyes)", f_fast, levels)

    budgets = extractor.per_level_budgets(ocfg.n_features, ocfg.scale_factor, ocfg.n_levels)

    def select_all(levels):
        outs = []
        for lv, b in zip(fast_all(levels), budgets):
            # strong mask approximated as scores>0 for timing purposes
            outs.append(extractor._select_level_keypoints(lv, lv > 0, b, ocfg.cell_size))
        return tuple(outs)

    f_sel = jax.jit(jax.vmap(select_all))
    sels = timeit("select keypoints (all levels)", f_sel, levels)

    def patches_all(levels, sels):
        return tuple(orb_ops.extract_patches(lv, s[0]) for lv, s in zip(levels, sels))

    f_pat = jax.jit(jax.vmap(patches_all))
    patches = timeit("extract_patches (all levels)", f_pat, levels, sels)

    f_ang = jax.jit(jax.vmap(lambda ps: tuple(orb_ops.ic_angles_from_patches(p) for p in ps)))
    angles = timeit("ic_angles (all levels)", f_ang, patches)

    f_brief = jax.jit(
        jax.vmap(lambda ps, an: tuple(orb_ops.brief_from_patches(p, a) for p, a in zip(ps, an)))
    )
    timeit("brief (all levels)", f_brief, patches, angles)

    # full extraction for stereo stage inputs
    f_ext = jax.jit(lambda l, r: extractor.extract_stereo_pair(l, r, ocfg))
    fl, fr = timeit("extract_stereo_pair (fused)", f_ext, L, R)


if __name__ == "__main__":
    main()
