"""Fused Pallas FAST+NMS kernel vs the XLA op chain (interpret mode).

Covers the wiring contract used by models/extractor._select_pyramid_keypoints:
the Pallas path computes ``strong`` from the *post*-NMS map, which must give a
bit-identical per-cell selection because ``strong`` is only consulted at NMS
survivors (where pre- and post-NMS scores coincide).
"""

import jax.numpy as jnp
import numpy as np

from opendlv_perception_vision_orbslam2_tpu.models.extractor import (
    EDGE_BORDER,
    _select_level_keypoints,
)
from opendlv_perception_vision_orbslam2_tpu.ops import fast as fast_ops
from opendlv_perception_vision_orbslam2_tpu.ops.fast_pallas import fast_nms


def _rand_img(h, w, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 255, (h, w)), jnp.float32)


def test_fast_nms_matches_xla_chain_inner():
    img = _rand_img(96, 160)
    ref = fast_ops.nms_scores(fast_ops.fast_score_map(img, 7.0))
    out = fast_nms(img, 7.0, interpret=True)
    # The kernel zero-pads at the image edge where the XLA chain edge-pads;
    # everything at least 4 px (halo) inside must be bit-identical, and the
    # extractor masks EDGE_BORDER=16 > 4 anyway.
    m = 8
    np.testing.assert_array_equal(
        np.asarray(ref)[m:-m, m:-m], np.asarray(out)[m:-m, m:-m]
    )


def test_fast_nms_selection_equivalent_to_xla_path():
    """End-to-end selection parity: XLA chain (pre-NMS strong mask) vs the
    Pallas wiring (post-NMS strong mask)."""
    img = _rand_img(128, 192, seed=3)
    ini, mn, cell, budget = 20.0, 7.0, 16, 64

    scores_pre, strong_pre = fast_ops.fast_with_fallback(img, ini, mn)
    nmsed_x = fast_ops.nms_scores(scores_pre)
    sel_ref = _select_level_keypoints(
        fast_ops.mask_border(nmsed_x, EDGE_BORDER), strong_pre, budget, cell
    )

    nmsed_p = fast_nms(img, mn, interpret=True)
    strong_post = nmsed_p > ini
    sel_pal = _select_level_keypoints(
        fast_ops.mask_border(nmsed_p, EDGE_BORDER), strong_post, budget, cell
    )

    for a, b in zip(sel_ref, sel_pal):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
