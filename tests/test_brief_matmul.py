"""The TPU matmul branch of brief_from_patches (per-bin +/-1 difference
matrices on the MXU) vs an explicit bf16 sampling oracle.

The matmul branch casts the blurred patch to bf16 before sampling; the
oracle reproduces exactly that quantization with take_along_axis, so the
comparison is bit-exact (sign of f32(bf16 b) - f32(bf16 a) == (a < b) in
bf16, and coincident clipped pairs give a zero column -> bit 0).
"""

import jax.numpy as jnp
import numpy as np

from opendlv_perception_vision_orbslam2_tpu.ops import orb as orb_ops


def _patches_angles(n=257, seed=1):
    rng = np.random.default_rng(seed)
    patches = jnp.asarray(
        rng.uniform(0, 255, (n, orb_ops.PATCH_SIDE, orb_ops.PATCH_SIDE)),
        jnp.float32,
    )
    angles = jnp.asarray(rng.uniform(-np.pi, np.pi, (n,)), jnp.float32)
    return patches, angles


def _oracle_bits(patches, angles):
    bm = jnp.asarray(orb_ops._patch_blur_matrix())
    flat = jnp.einsum("is,nst,jt->nij", bm, patches, bm).reshape(
        patches.shape[0], orb_ops.BRIEF_SIDE * orb_ops.BRIEF_SIDE
    )
    fb = flat.astype(jnp.bfloat16).astype(jnp.float32)
    bin_ = jnp.floor(
        (angles + jnp.pi) / (2.0 * jnp.pi) * orb_ops.N_ANGLE_BINS
    ).astype(jnp.int32) % orb_ops.N_ANGLE_BINS
    idx = jnp.asarray(orb_ops._binned_sample_indices())[bin_]
    vals = jnp.take_along_axis(fb, idx, axis=1)
    return orb_ops._pack256(
        vals[:, : orb_ops.N_BITS] < vals[:, orb_ops.N_BITS :]
    )


def test_diff_matmul_matches_bf16_oracle():
    patches, angles = _patches_angles()
    got = orb_ops.brief_from_patches(patches, angles, use_matmul=True)
    want = _oracle_bits(patches, angles)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_diff_matmul_close_to_f32_gather_branch():
    # bf16 quantization may flip bits whose endpoint intensities are within
    # rounding distance; on uniform-noise patches that's a tiny fraction.
    patches, angles = _patches_angles(n=128, seed=7)
    a = orb_ops.unpack_bits(orb_ops.brief_from_patches(patches, angles, use_matmul=True))
    b = orb_ops.unpack_bits(orb_ops.brief_from_patches(patches, angles, use_matmul=False))
    frac = float(jnp.mean((a != b).astype(jnp.float32)))
    assert frac < 0.02, frac


def test_diff_mats_columns_sum_to_zero_or_pm_one():
    dm = orb_ops._binned_diff_mats()
    # each column is e_b - e_a: entries in {-1, 0, 1}, column sum 0.
    assert set(np.unique(dm)) <= {-1, 0, 1}
    np.testing.assert_array_equal(dm.sum(axis=1), 0)
