"""ORB orientation + steered-BRIEF descriptors as batched gather kernels.

Replaces the per-keypoint scalar loops of the reference
(IC_Angle reference: src/orbextractor.cpp:136-163; computeOrbDescriptor
reference: src/orbextractor.cpp:166-203) with batched gathers over all
keypoints of a pyramid level at once.

Descriptor layout: 256 bits packed into ``uint32 [N, 8]`` (the reference uses
``uint8 [N, 32]``; 8x uint32 words match the SWAR popcount distance at
reference: src/orbmatcher.cpp:1662-1676 and XLA's ``population_count``).

Intentional divergence (documented per SURVEY.md section 7): the reference
embeds ORB's machine-learned 256-pair sampling pattern
(``bit_pattern_31_`` reference: src/orbextractor.cpp:215-473).  We instead use
a fixed *seeded* Gaussian pattern (original BRIEF construction).  Nothing in
this codebase needs bit-compatibility with OpenCV descriptors (no external
vocabulary file is shipped with the reference either), and the seeded pattern
keeps the repo free of copied tables.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

PATCH_SIZE = 31
HALF_PATCH_SIZE = 15
N_BITS = 256
DESC_WORDS = 8  # 256 bits / 32


@functools.lru_cache(maxsize=None)
def brief_pattern():
    """Deterministic 256-pair sampling pattern, ``int32 [256, 4]`` (x1,y1,x2,y2).

    BRIEF G-II construction: iid Gaussian(0, (PATCH/5)^2), clipped to the
    13-px disc used by ORB, fixed seed => identical descriptors everywhere.
    """
    rng = np.random.default_rng(0x0B5E55ED)
    sigma = PATCH_SIZE / 5.0
    pts = []
    while len(pts) < N_BITS * 2:
        cand = rng.normal(0.0, sigma, size=(N_BITS * 4, 2))
        cand = np.round(cand).astype(np.int32)
        keep = (np.abs(cand[:, 0]) <= 13) & (np.abs(cand[:, 1]) <= 13)
        pts.extend(cand[keep].tolist())
    pts = np.asarray(pts[: N_BITS * 2], dtype=np.int32)
    return np.concatenate([pts[0::2], pts[1::2]], axis=1)  # [256, 4]


@functools.lru_cache(maxsize=None)
def _disc_offsets():
    """All (dy, dx) offsets inside the radius-15 disc, plus the dx weight
    arrays for the intensity-centroid moments."""
    ys, xs = np.mgrid[-HALF_PATCH_SIZE : HALF_PATCH_SIZE + 1,
                      -HALF_PATCH_SIZE : HALF_PATCH_SIZE + 1]
    mask = (ys * ys + xs * xs) <= HALF_PATCH_SIZE * HALF_PATCH_SIZE
    return ys[mask].astype(np.int32), xs[mask].astype(np.int32)


def _gather_pixels(img, y_idx, x_idx):
    """Clip-gather ``img[y, x]`` for integer index arrays of any shape."""
    H, W = img.shape
    y = jnp.clip(y_idx, 0, H - 1)
    x = jnp.clip(x_idx, 0, W - 1)
    return jnp.take(img.reshape(-1), y * W + x, axis=0)


def ic_angles(img, kpts_xy):
    """Intensity-centroid orientation for keypoints on one pyramid level.

    ``img [H, W]`` float32 (un-blurred level image, as in the reference where
    IC_Angle runs before the descriptor blur), ``kpts_xy [N, 2]`` float
    (x, y) level coords.  Returns angles ``[N]`` in radians.
    Equivalent of IC_Angle (reference: src/orbextractor.cpp:136-163) with the
    exact circular mask replacing the umax half-width table.
    """
    dys, dxs = _disc_offsets()
    dys = jnp.asarray(dys)
    dxs = jnp.asarray(dxs)
    x0 = jnp.round(kpts_xy[:, 0]).astype(jnp.int32)
    y0 = jnp.round(kpts_xy[:, 1]).astype(jnp.int32)
    ys = y0[:, None] + dys[None, :]
    xs = x0[:, None] + dxs[None, :]
    vals = _gather_pixels(img, ys, xs)            # [N, |disc|]
    m10 = jnp.sum(vals * dxs[None, :], axis=1)
    m01 = jnp.sum(vals * dys[None, :], axis=1)
    return jnp.arctan2(m01, m10)


def brief_descriptors(img_blurred, kpts_xy, angles):
    """Steered 256-bit BRIEF, packed ``uint32 [N, 8]``.

    ``img_blurred`` is the Gaussian-blurred level image (reference blurs before
    describing, src/orbextractor.cpp:610).  Rotation follows the reference's
    nearest-pixel steering (cvRound of the rotated pattern,
    reference: src/orbextractor.cpp:170-177).
    """
    pat = jnp.asarray(brief_pattern())            # [256, 4] int32
    cos_a = jnp.cos(angles)[:, None]              # [N, 1]
    sin_a = jnp.sin(angles)[:, None]

    def rotate(px, py):
        rx = jnp.round(px[None, :] * cos_a - py[None, :] * sin_a)
        ry = jnp.round(px[None, :] * sin_a + py[None, :] * cos_a)
        return rx.astype(jnp.int32), ry.astype(jnp.int32)

    x0 = jnp.round(kpts_xy[:, 0]).astype(jnp.int32)[:, None]
    y0 = jnp.round(kpts_xy[:, 1]).astype(jnp.int32)[:, None]

    ax, ay = rotate(pat[:, 0].astype(jnp.float32), pat[:, 1].astype(jnp.float32))
    bx, by = rotate(pat[:, 2].astype(jnp.float32), pat[:, 3].astype(jnp.float32))
    va = _gather_pixels(img_blurred, y0 + ay, x0 + ax)   # [N, 256]
    vb = _gather_pixels(img_blurred, y0 + by, x0 + bx)
    bits = (va < vb).astype(jnp.uint32)                   # [N, 256]

    # Pack 256 bits -> 8 uint32 words.
    bits = bits.reshape(bits.shape[0], DESC_WORDS, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(bits << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


def descriptor_mean(descs, valid):
    """Bitwise-majority mean descriptor over a masked set.

    Equivalent of OrbDescriptor::meanValue (reference:
    src/orbdescriptor.cpp:24-73) for the map-point distinctive-descriptor
    refresh; operates on ``uint32 [M, 8]`` + bool ``[M]``.
    """
    bits = unpack_bits(descs)                     # [M, 256]
    n = jnp.maximum(jnp.sum(valid), 1)
    counts = jnp.sum(bits * valid[:, None], axis=0)
    maj = (counts * 2 >= n).astype(jnp.uint32)
    return pack_bits(maj[None])[0]


def unpack_bits(descs):
    """``uint32 [..., 8]`` -> ``uint32 [..., 256]`` of 0/1 bits."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (descs[..., :, None] >> shifts) & jnp.uint32(1)
    return bits.reshape(*descs.shape[:-1], N_BITS)


def pack_bits(bits):
    """Inverse of :func:`unpack_bits`."""
    b = bits.reshape(*bits.shape[:-1], DESC_WORDS, 32).astype(jnp.uint32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(b << shifts, axis=-1, dtype=jnp.uint32)
