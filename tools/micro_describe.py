"""Micro-ablation of the gather+describe stage (checksum outputs so the
tunnel never transfers big tensors).  Variants share one process/queue.

Stages mirror models/extractor.extract_from_pyramid_pair at the bench
operating point (2 eyes x 2000 kpts, KITTI-sized pyramid).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from opendlv_perception_vision_orbslam2_tpu.models import extractor
from opendlv_perception_vision_orbslam2_tpu.ops import image as image_ops
from opendlv_perception_vision_orbslam2_tpu.ops import orb as orb_ops
from opendlv_perception_vision_orbslam2_tpu.ops.gather_pallas import gather_patches
from opendlv_perception_vision_orbslam2_tpu.utils import synthetic
from opendlv_perception_vision_orbslam2_tpu.utils.config import SystemConfig

S = orb_ops.PATCH_SIDE


def timeit(name, fn, *args, reps=40):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    print(f"{name:52s} {(time.time() - t0) / reps * 1e3:8.3f} ms", flush=True)
    return out


def main():
    cfg = SystemConfig()
    ocfg = cfg.orb
    print("backend:", jax.default_backend(), file=sys.stderr)
    lefts, rights, _, _ = synthetic.render_stereo_sequence(
        cfg, n_frames=2, n_points=900, seed=0, step=0.6
    )
    both = jnp.stack([jax.device_put(lefts[1]), jax.device_put(rights[1])])

    def setup(both):
        lv = jax.vmap(
            lambda im: image_ops.build_pyramid(im, ocfg.n_levels, ocfg.scale_factor)
        )(both)
        sel = extractor._select_pyramid_keypoints(lv, ocfg)
        return lv, sel

    # Precompute the select stage ONCE on device so every variant below times
    # only its own work (base select outputs reused as traced inputs).
    lv, sel = jax.jit(setup)(both)
    lv = jax.tree.map(jax.device_put, lv)
    y0, x0 = sel[4], sel[5]
    budgets = extractor.per_level_budgets(
        ocfg.n_features, ocfg.scale_factor, ocfg.n_levels)

    # NOTE: y0/x0 are level-local centre coords (see extractor).
    def atlas_and_starts(lv, y0, x0):
        al, offs = orb_ops.build_patch_atlas([l[0] for l in lv])
        ar, _ = orb_ops.build_patch_atlas([l[1] for l in lv])
        atlas = jnp.concatenate([al, ar], axis=0)
        lvl_off = jnp.asarray(np.repeat(offs, budgets))
        yf = jnp.concatenate([y0[0] + lvl_off, y0[1] + lvl_off + al.shape[0]])
        xf = jnp.concatenate([x0[0], x0[1]])
        return atlas, yf, xf

    def g_xla(lv, y0, x0):
        atlas, yf, xf = atlas_and_starts(lv, y0, x0)

        def slc(y, x):
            return jax.lax.dynamic_slice(atlas, (y, x), (S, S))

        p = jax.vmap(slc)(yf, xf)
        return jnp.sum(p), p

    def g_pallas_level(lv, y0, x0):
        # One kernel call per (eye, level): the level image fits VMEM.
        outs = []
        for e in range(2):
            off = 0
            for l, b in enumerate(budgets):
                img = jnp.pad(lv[l][e], orb_ops.PATCH_HALF, mode="edge")
                ys = y0[e, off:off + b]
                xs = x0[e, off:off + b]
                outs.append(gather_patches(img, ys, xs, ph=S, pw=S))
                off += b
        p = jnp.concatenate(outs, axis=0)
        return jnp.sum(p), p

    def blur_einsum(p):
        bm = jnp.asarray(orb_ops._patch_blur_matrix())
        return jnp.einsum("is,nst,jt->nij", bm, p, bm)

    def blur_flat(p, dtype=jnp.float32):
        bm = jnp.asarray(orb_ops._patch_blur_matrix()).astype(dtype)
        n = p.shape[0]
        p = p.astype(dtype)
        # right pass: [N*S, S] @ [S, 39]
        t = (p.reshape(n * S, S) @ bm.T).reshape(n, S, 39)
        # left pass: [39, S] @ [S, N*39]
        t2 = bm @ t.transpose(1, 0, 2).reshape(S, n * 39)
        return t2.reshape(39, n, 39).transpose(1, 0, 2)

    def full_describe(p):
        ang = orb_ops.ic_angles_from_patches(p)
        return jnp.sum(orb_ops.brief_from_patches(p, ang))

    def brief_onebig(p):
        """All 30 bins in ONE [N,1521]@[1521,15360] matmul + row slice."""
        n = p.shape[0]
        bm = jnp.asarray(orb_ops._patch_blur_matrix())
        blurred = jnp.einsum("is,nst,jt->nij", bm, p, bm)
        flat = blurred.reshape(n, 39 * 39).astype(jnp.bfloat16)
        ang = orb_ops.ic_angles_from_patches(p)
        bin_ = jnp.floor((ang + jnp.pi) / (2 * jnp.pi) * 30).astype(jnp.int32) % 30
        oh = jnp.asarray(orb_ops._binned_onehots()).astype(jnp.bfloat16)
        W = oh.transpose(1, 0, 2).reshape(39 * 39, 30 * 512)
        all_vals = jax.lax.dot_general(
            flat, W, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [N, 15360]
        def row(v, b):
            return jax.lax.dynamic_slice(v, (b * 512,), (512,))
        vals = jax.vmap(row)(all_vals, bin_)
        return jnp.sum(orb_ops._pack256(vals[:, :256] < vals[:, 256:]))

    jg = jax.jit(lambda lv, y0, x0: g_xla(lv, y0, x0)[0])
    timeit("G1 xla atlas gather (checksum)", jg, lv, y0, x0)
    jp = jax.jit(lambda lv, y0, x0: g_pallas_level(lv, y0, x0)[0])
    timeit("G2 pallas per-level gather (checksum)", jp, lv, y0, x0)

    # check equality of the two gathers
    p1 = jax.jit(lambda lv, y0, x0: g_xla(lv, y0, x0)[1])(lv, y0, x0)
    p2 = jax.jit(lambda lv, y0, x0: g_pallas_level(lv, y0, x0)[1])(lv, y0, x0)
    print("gather equal:", bool(jnp.all(p1 == p2)), flush=True)

    patches = jax.device_put(p1)
    timeit("B1 blur einsum (checksum)",
           jax.jit(lambda p: jnp.sum(blur_einsum(p))), patches)
    timeit("B2 blur flat f32 (checksum)",
           jax.jit(lambda p: jnp.sum(blur_flat(p))), patches)
    timeit("B3 blur flat bf16 (checksum)",
           jax.jit(lambda p: jnp.sum(blur_flat(p, jnp.bfloat16))), patches)
    b1 = jax.jit(blur_einsum)(patches)
    b2 = jax.jit(blur_flat)(patches)
    print("blur f32 max err:", float(jnp.max(jnp.abs(b1 - b2))), flush=True)

    timeit("D1 describe current (checksum)",
           jax.jit(full_describe), patches)
    timeit("D2 describe one-big-matmul (checksum)",
           jax.jit(brief_onebig), patches)

    timeit("X1 gather+describe fused (current path)",
           jax.jit(lambda lv, y0, x0: full_describe(g_xla(lv, y0, x0)[1])),
           lv, y0, x0)


if __name__ == "__main__":
    main()
