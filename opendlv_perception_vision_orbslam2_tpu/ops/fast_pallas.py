"""Pallas TPU kernel: fused FAST-9/16 V-score + 3x3 non-max suppression.

The XLA formulation in :mod:`ops.fast` is ~200 elementwise ops per pixel
whose doubling-tree intermediates (16 diffs -> p2/p4/p8/w9 per polarity)
defeat fusion: XLA materializes dozens of [H, W] arrays to HBM, making the
op HBM-bound (~1 ms per KITTI eye-level on v5e instead of the ~40 us the
VPU needs).  This kernel runs the whole chain out of VMEM: the image is cut
into row bands with a 4-px halo (3 for the Bresenham circle + 1 for NMS),
each band is one grid step, and the only HBM traffic is one image read and
one score-map write.

Semantics match ``nms_scores(fast_score_map(img, th))`` exactly (same op
tree, same fp32 order); the caller applies ``mask_border`` afterwards, which
also hides the zero-padding this kernel uses at the image edges (the
detection border of 16 px exceeds the halo, reference:
src/orbextractor.cpp:916-921).

Replaces the per-cell OpenCV ``cv::FAST`` loops of the reference
(reference: src/orbextractor.cpp:950-956).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fast import CIRCLE16

TILE_H = 32  # rows of output per grid step
HALO = 4     # 3 (circle radius) + 1 (NMS neighborhood)


def _fast_nms_kernel(x_ref, out_ref, *, threshold: float):
    """One row band: x [1, TILE_H + 2*HALO, Wb], out [1, TILE_H, Wb - 2*HALO].

    Scores are computed on a (TILE_H+2, Wc+2) window (one extra ring for the
    NMS compare) and suppressed down to (TILE_H, Wc).
    """
    x = x_ref[0]
    hb, wb = x.shape
    wc = wb - 2 * HALO  # output columns

    def view(dy, dx):
        # Full-tile shifted view via lane/sublane rotations: keeping every
        # operand at the aligned (hb, wb) tile shape avoids the per-op
        # relayouts that unaligned sub-slices would trigger.  Wrapped rows /
        # columns are garbage only within 3 px of the tile edge, which the
        # final center slice (offset HALO=4) and the >=120-column right
        # padding keep out of reach.
        v = x
        if dy:
            v = pltpu.roll(v, (-dy) % hb, axis=0)
        if dx:
            v = pltpu.roll(v, (-dx) % wb, axis=1)
        return v

    center = x
    diff = [view(dy, dx) - center for (dy, dx) in CIRCLE16]

    def arc_response(d):
        # Same prefix-min doubling tree as ops.fast.fast_score_map.
        p2 = [jnp.minimum(d[i], d[(i + 1) % 16]) for i in range(16)]
        p4 = [jnp.minimum(p2[i], p2[(i + 2) % 16]) for i in range(16)]
        p8 = [jnp.minimum(p4[i], p4[(i + 4) % 16]) for i in range(16)]
        w9 = [jnp.minimum(p8[i], d[(i + 8) % 16]) for i in range(16)]
        out = w9[0]
        for i in range(1, 16):
            out = jnp.maximum(out, w9[i])
        return out

    bright = arc_response(diff)
    dark = arc_response([-d for d in diff])
    v = jnp.maximum(bright, dark)
    scores = jnp.where(v > threshold, v, 0.0)

    # 3x3 NMS on the full tile (roll-shifted compares), then one final
    # unaligned slice down to the (TILE_H, wc) output window.
    best = scores
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            n = scores
            if dy:
                n = pltpu.roll(n, (-dy) % hb, axis=0)
            if dx:
                n = pltpu.roll(n, (-dx) % wb, axis=1)
            best = jnp.maximum(best, n)
    out = jnp.where(scores >= best, scores, 0.0)
    out_ref[0] = out[HALO : HALO + TILE_H, HALO : HALO + wc]


@functools.partial(jax.jit, static_argnames=("threshold", "interpret"))
def fast_nms(img, threshold: float, interpret: bool = False):
    """Fused dense FAST-9/16 V-score + 3x3 NMS for one [H, W] float32 image.

    Equivalent to ``nms_scores(fast_score_map(img, threshold))`` up to the
    (border-masked) halo ring at the image edges.
    """
    H, W = img.shape
    n_bands = -(-H // TILE_H)
    Hp = n_bands * TILE_H
    Wp = -(-W // 128) * 128

    padded = jnp.pad(
        img.astype(jnp.float32),
        ((HALO, HALO + (Hp - H)), (HALO, HALO + (Wp - W) + 120)),
    )
    # Overlapping row bands: [n_bands, TILE_H + 2*HALO, Wb].  The stack of
    # static slices is one fused copy (25% read amplification at TILE_H=32),
    # and lets plain BlockSpecs deliver halos without manual DMA.
    bands = jnp.stack(
        [padded[i * TILE_H : i * TILE_H + TILE_H + 2 * HALO] for i in range(n_bands)]
    )
    wb = bands.shape[2]

    out = pl.pallas_call(
        functools.partial(_fast_nms_kernel, threshold=float(threshold)),
        grid=(n_bands,),
        in_specs=[
            pl.BlockSpec(
                (1, TILE_H + 2 * HALO, wb),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_H, wb - 2 * HALO), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_bands, TILE_H, wb - 2 * HALO), jnp.float32),
        interpret=interpret,
    )(bands)

    return out.reshape(Hp, wb - 2 * HALO)[:H, :W]
