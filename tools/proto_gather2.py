"""A/B test XLA patch-gather formulations on TPU.

Variants: 3-D batched dynamic_slice (current shape inside vmapped extract),
2-D per-image gathers, single-atlas 2-D gather, bf16 payloads (exact for
8-bit imagery), and smaller 33x33 patches (L2-clipped BRIEF pattern).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp


def bench(name, f, *args, reps=30):
    out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = f(*args)
    np.asarray(jax.tree.leaves(out)[0])
    print(f"{name:44s} {(time.time()-t0)/reps*1e3:8.3f} ms", flush=True)


def main():
    H, W = 420, 1285
    N = 4096  # total patches (both eyes, all levels)
    rng = np.random.default_rng(0)
    img_f32 = jnp.asarray(rng.normal(size=(2, H, W)).astype(np.float32))
    atlas_f32 = jnp.asarray(rng.normal(size=(2 * H, W)).astype(np.float32))
    atlas_bf16 = atlas_f32.astype(jnp.bfloat16)
    b = jnp.asarray(rng.integers(0, 2, N).astype(np.int32))

    for side in (45, 33):
        y = jnp.asarray(rng.integers(0, H - side, N).astype(np.int32))
        x = jnp.asarray(rng.integers(0, W - side, N).astype(np.int32))
        ya = jnp.asarray(rng.integers(0, 2 * H - side, N).astype(np.int32))

        def g3d(b, y, x, img):
            def slc(bi, yi, xi):
                return jax.lax.dynamic_slice(img, (bi, yi, xi), (1, side, side))[0]
            return jax.vmap(slc)(b, y, x)

        def g2d_atlas(y, x, atlas):
            def slc(yi, xi):
                return jax.lax.dynamic_slice(atlas, (yi, xi), (side, side))
            return jax.vmap(slc)(y, x)

        bench(f"3d batched f32 {side}x{side}", jax.jit(g3d), b, y, x, img_f32)
        bench(f"2d atlas f32 {side}x{side}", jax.jit(g2d_atlas), ya, x, atlas_f32)
        bench(f"2d atlas bf16 {side}x{side}", jax.jit(g2d_atlas), ya, x, atlas_bf16)

        # Two per-eye gathers of N/2 each on 2-D images.
        img0 = img_f32[0]
        y2 = y[: N // 2]
        x2 = x[: N // 2]

        def g2d_pair(y, x, img):
            def slc(yi, xi):
                return jax.lax.dynamic_slice(img, (yi, xi), (side, side))
            a = jax.vmap(slc)(y, x)
            bq = jax.vmap(slc)(y, x)
            return a, bq

        bench(f"2x 2d f32 {side}x{side} (N/2 each)", jax.jit(g2d_pair), y2, x2, img0)




def main2():
    H, W = 420, 1285
    N = 4096
    rng = np.random.default_rng(0)
    atlas_f32 = jnp.asarray(rng.normal(size=(2 * H, W)).astype(np.float32))
    atlas_bf16 = atlas_f32.astype(jnp.bfloat16)
    for side in (33,):
        ya = np.sort(rng.integers(0, 2 * H - side, N).astype(np.int32))
        x = rng.integers(0, W - side, N).astype(np.int32)

        def g2d_atlas(y, x, atlas):
            def slc(yi, xi):
                return jax.lax.dynamic_slice(atlas, (yi, xi), (side, side))
            return jax.vmap(slc)(y, x)

        bench(f"2d atlas bf16 {side} y-sorted", jax.jit(g2d_atlas),
              jnp.asarray(ya), jnp.asarray(x), atlas_bf16)
        xs = np.sort(x)
        bench(f"2d atlas bf16 {side} y+x-sorted", jax.jit(g2d_atlas),
              jnp.asarray(ya), jnp.asarray(xs), atlas_bf16)
        bench(f"2d atlas f32 {side} y-sorted", jax.jit(g2d_atlas),
              jnp.asarray(ya), jnp.asarray(x), atlas_f32)


if __name__ == "__main__":
    main2()
