"""Pallas window-gather kernel vs a NumPy slice oracle (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from opendlv_perception_vision_orbslam2_tpu.ops.gather_pallas import gather_patches


@pytest.mark.parametrize(
    "H,W,ph,pw,n",
    [
        (420, 1332, 45, 45, 100),   # ORB descriptor patches, KITTI L0 scale
        (97, 250, 11, 21, 37),      # stereo SAD strips, small level
        (64, 140, 11, 11, 5),       # left SAD windows
    ],
)
def test_gather_matches_slices(H, W, ph, pw, n):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (H, W)).astype(np.float32)
    y0 = rng.integers(0, H - ph + 1, n).astype(np.int32)
    x0 = rng.integers(0, W - pw + 1, n).astype(np.int32)
    out = np.asarray(
        gather_patches(jnp.asarray(img), jnp.asarray(y0), jnp.asarray(x0),
                       ph=ph, pw=pw, interpret=True)
    )
    ref = np.stack([img[y : y + ph, x : x + pw] for y, x in zip(y0, x0)])
    np.testing.assert_array_equal(out, ref)


def test_gather_clips_out_of_range_starts():
    rng = np.random.default_rng(2)
    img = rng.uniform(0, 255, (40, 200)).astype(np.float32)
    y0 = np.array([-3, 38], np.int32)   # below 0 / beyond H-ph
    x0 = np.array([190, -1], np.int32)
    out = np.asarray(
        gather_patches(jnp.asarray(img), jnp.asarray(y0), jnp.asarray(x0),
                       ph=8, pw=16, interpret=True)
    )
    ref = np.stack([img[0:8, 184:200], img[32:40, 0:16]])
    np.testing.assert_array_equal(out, ref)
