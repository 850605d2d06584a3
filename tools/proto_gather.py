"""Prototype v2: Pallas aligned-window patch gather vs vmap(dynamic_slice).

TPU DMA slices must be tile-aligned (8 sublanes x 128 lanes for f32) in both
shape and offset.  So: DMA the aligned (56, 256) window containing each
patch, then shift to the exact (45, 45) patch with two one-hot matmuls on
the MXU (row select @ window @ col select).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SH, SW = 45, 45
WIN_H, WIN_W = 56, 256  # aligned window: 45+7 -> 56, 45+127 -> 256


def make_gather(N, BLK=8):
    grid = N // BLK

    def kernel(b_ref, ya_ref, xa_ref, dy_ref, dx_ref, img_ref, out_ref,
               raw, sems):
        i = pl.program_id(0)
        dmas = []
        for j in range(BLK):
            k = i * BLK + j
            ya = pl.multiple_of(ya_ref[k], 8)
            xa = pl.multiple_of(xa_ref[k], 128)
            dma = pltpu.make_async_copy(
                img_ref.at[b_ref[k], pl.ds(ya, WIN_H), pl.ds(xa, WIN_W)],
                raw.at[j],
                sems.at[j],
            )
            dma.start()
            dmas.append(dma)
        r_i = jax.lax.broadcasted_iota(jnp.int32, (SH, WIN_H), 0)
        r_s = jax.lax.broadcasted_iota(jnp.int32, (SH, WIN_H), 1)
        c_s = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, SW), 0)
        c_c = jax.lax.broadcasted_iota(jnp.int32, (WIN_W, SW), 1)
        for j in range(BLK):
            k = i * BLK + j
            dmas[j].wait()
            R = (r_s == r_i + dy_ref[k]).astype(jnp.float32)
            C = (c_s == c_c + dx_ref[k]).astype(jnp.float32)
            t = jnp.dot(R, raw[j], preferred_element_type=jnp.float32)
            out_ref[j] = jnp.dot(t, C, preferred_element_type=jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (BLK, SH, SW), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((BLK, WIN_H, WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA((BLK,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, SH, SW), jnp.float32),
        grid_spec=grid_spec,
    )


def main():
    B, H, W = 2, 420, 1285
    N = 4096
    # Pad image so aligned windows never run off the end.
    Hp = ((H - 1) // 8) * 8 + WIN_H
    Wp = ((W - 1) // 128) * 128 + WIN_W
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, Hp, Wp)).astype(np.float32))
    b = jnp.asarray(rng.integers(0, B, N).astype(np.int32))
    y = jnp.asarray(rng.integers(0, H - SH, N).astype(np.int32))
    x = jnp.asarray(rng.integers(0, W - SW, N).astype(np.int32))
    ya, dy = (y // 8) * 8, y % 8
    xa, dx = (x // 128) * 128, x % 128

    for BLK in (4, 8, 16):
        f = jax.jit(make_gather(N, BLK))
        out = f(b, ya, xa, dy, dx, img)
        np.asarray(out)
        t0 = time.time()
        for _ in range(30):
            out = f(b, ya, xa, dy, dx, img)
        np.asarray(out)
        print(f"pallas BLK={BLK}: {(time.time()-t0)/30*1e3:.3f} ms", flush=True)

    def xla_gather(b, y, x, img):
        def slc(bi, yi, xi):
            return jax.lax.dynamic_slice(img, (bi, yi, xi), (1, SH, SW))[0]
        return jax.vmap(slc)(b, y, x)

    g = jax.jit(xla_gather)
    out2 = g(b, y, x, img)
    np.asarray(out2)
    t0 = time.time()
    for _ in range(30):
        out2 = g(b, y, x, img)
    np.asarray(out2)
    print(f"xla vmap(dynamic_slice): {(time.time()-t0)/30*1e3:.3f} ms", flush=True)

    f = jax.jit(make_gather(N, 8))
    d = jnp.max(jnp.abs(f(b, ya, xa, dy, dx, img) - out2))
    print("max abs diff:", float(d))


if __name__ == "__main__":
    main()
