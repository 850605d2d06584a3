"""Horn 1987 closed-form absolute orientation (quaternion method), batched.

The reference uses this inside Sim3Solver::ComputeSim3 (reference:
src/sim3solver.cpp:240-351): centroids, the 3x3 correlation matrix M, the
4x4 N matrix, its dominant eigenvector as the rotation quaternion, then
scale + translation.  Here it is a pure-JAX batched routine (vmap over RANSAC
hypothesis sets) that also serves the EPnP solver's final R,t extraction
(reference: src/pnpsolver.cpp:543 estimate_R_and_t).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_to_rot(q):
    """[..., 4] (w, x, y, z) -> [..., 3, 3]."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = w * w + x * x + y * y + z * z
    s = 2.0 / jnp.where(n > 1e-12, n, 1.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], -1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], -1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], -1),
        ],
        axis=-2,
    )


def horn_align(a, b, w=None, fix_scale: bool = False):
    """Least-squares similarity aligning ``a -> b``: returns (R, t, s) with
    ``b ~ s R a + t``.

    ``a, b [..., N, 3]``; ``w [..., N]`` optional weights (masked points get
    weight 0).  ``fix_scale`` pins s = 1 (stereo/RGB-D loop closing,
    reference: src/sim3solver.cpp:45-47 mbFixScale).
    """
    if w is None:
        w = jnp.ones(a.shape[:-1], a.dtype)
    wsum = jnp.sum(w, axis=-1, keepdims=True) + 1e-12
    mu_a = jnp.sum(a * w[..., None], axis=-2) / wsum
    mu_b = jnp.sum(b * w[..., None], axis=-2) / wsum
    ac = a - mu_a[..., None, :]
    bc = b - mu_b[..., None, :]

    M = jnp.einsum("...n,...ni,...nj->...ij", w, ac, bc)   # correlation a b^T

    # Horn's 4x4 N matrix
    Sxx, Sxy, Sxz = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    Syx, Syy, Syz = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    Szx, Szy, Szz = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
        ],
        axis=-2,
    )
    evals, evecs = jnp.linalg.eigh(N)
    q = evecs[..., :, -1]                                  # dominant eigvec
    R = quat_to_rot(q)

    Ra = jnp.einsum("...ij,...nj->...ni", R, ac)
    if fix_scale:
        s = jnp.ones(a.shape[:-2], a.dtype)
    else:
        num = jnp.sum(w * jnp.sum(bc * Ra, axis=-1), axis=-1)
        den = jnp.sum(w * jnp.sum(ac * ac, axis=-1), axis=-1) + 1e-12
        s = num / den
    t = mu_b - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu_a)
    return R, t, s
