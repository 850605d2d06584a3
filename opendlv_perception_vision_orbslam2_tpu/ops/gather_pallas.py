"""Pallas TPU kernel: batched window ("patch") gather at dynamic offsets.

``vmap(dynamic_slice)`` — the round-1 formulation of per-keypoint patch
extraction (ops/orb.py extract_patches, ops/stereo.py SAD windows) — lowers
to an XLA gather whose per-row unaligned loads dominate the front-end
(~9 ms of an ~18 ms KITTI-sized frame on a v5e).  This kernel does the same
job out of VMEM: the whole (edge-padded) image is one VMEM operand, keypoint
coordinates arrive via scalar prefetch, and each window is one
sublane/lane-aligned vector load followed by two in-register rotations —
no HBM round trip per keypoint at all.

Alignment rules (Mosaic requires statically-provable aligned vector loads):
the load starts at ``(8*(y//8), 128*(x//128))`` and covers
``(ceil8(ph)+8, ceil128(pw)+128)``; the residual offsets ``y%8``/``x%128``
become dynamic ``pltpu.roll`` amounts, whose semantics are
``roll(x, s)[i] = x[(i-s) % n]`` — shifts are passed as nonnegative
``(n - r) % n`` (hardware rotate amounts must be nonnegative).

Replaces the OpenCV-side per-keypoint patch reads of the reference
(computeOrbDescriptor / IC_Angle patch access, reference:
src/orbextractor.cpp:136-203; ComputeStereoMatches SAD windows, reference:
src/orbframe.cpp:596-650).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(v: int, m: int) -> int:
    return -(-v // m) * m


@functools.partial(
    jax.jit, static_argnames=("ph", "pw", "kpg", "interpret")
)
def gather_patches(img, y0, x0, *, ph: int, pw: int, kpg: int = 8,
                   interpret: bool = False):
    """``img [H, W] float32``, ``y0/x0 [N] int32`` top-left corners ->
    ``[N, ph, pw]`` float32 windows.

    Starts must satisfy ``0 <= y0 <= H-ph`` and ``0 <= x0 <= W-pw`` (callers
    clip; the reference edge-pads its images the same way).  ``kpg`` windows
    are produced per grid step.
    """
    H, W = img.shape
    n = y0.shape[0]

    bh = _ceil_to(ph, 8) + 8        # aligned rows covering ph at any y%8
    bw = _ceil_to(pw, 128) + 128    # aligned cols covering pw at any x%128

    # Pad the image so the aligned block never reads out of bounds, and pad
    # the keypoint list to a multiple of kpg (junk slots gather from (0,0)).
    img_p = jnp.pad(img, ((0, _ceil_to(H, 8) + bh - H),
                          (0, _ceil_to(W, 128) + bw - W)))
    n_pad = _ceil_to(max(n, 1), kpg)
    y0 = jnp.clip(jnp.pad(y0, (0, n_pad - n)), 0, H - ph)
    x0 = jnp.clip(jnp.pad(x0, (0, n_pad - n)), 0, W - pw)

    def kernel(y_ref, x_ref, img_ref, out_ref):
        i = pl.program_id(0)
        for j in range(kpg):
            k = i * kpg + j
            y, x = y_ref[k], x_ref[k]
            ya = pl.multiple_of((y // 8) * 8, 8)
            xa = pl.multiple_of((x // 128) * 128, 128)
            block = img_ref[pl.ds(ya, bh), pl.ds(xa, bw)]
            r = pltpu.roll(block, (bh - (y - ya)) % bh, axis=0)
            r = pltpu.roll(r, (bw - (x - xa)) % bw, axis=1)
            out_ref[j] = r[:ph, :pw]

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(n_pad // kpg,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(
                (kpg, ph, pw), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad, ph, pw), jnp.float32),
        interpret=interpret,
    )(y0, x0, img_p)
    return out[:n]
