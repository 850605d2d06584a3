"""Monocular SLAM pipeline (BASELINE config 4).

Re-designs the reference's monocular path: MonocularInitialization +
CreateInitialMapMonocular (reference: src/tracking.cpp:397-567) feeding the
same tracking/mapping machinery as stereo, with mono-only observation edges
(no depth), median-depth scale normalization at bootstrap, and map points
arriving exclusively through covisible triangulation
(models/triangulation.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie, matching
from ..utils.config import SystemConfig
from .frame import FrameState
from .frontend import process_mono
from .initializer import initialize_two_view
from .map_state import empty_map, insert_keyframe, cull_points
from .slam import StereoSlam
from .triangulation import create_new_map_points

MIN_INIT_FEATURES = 100   # reference: src/tracking.cpp:404, 421
# The reference demands 100 matches with its doubled mono feature budget
# (2*nFeatures, reference: src/tracking.cpp:433); scaled configs (tests)
# override the class attribute.
MIN_INIT_MATCHES = 100


class MonocularSlam(StereoSlam):
    """Monocular variant: same tracking/mapping core, different bootstrap
    and no stereo point source.  Scale is arbitrary (normalized to median
    scene depth 1 at init, reference: src/tracking.cpp:537-552)."""

    def __init__(self, config: SystemConfig, vocab=None,
                 enable_loop_closing: bool = True,
                 enable_relocalization: bool = True):
        if config.camera_type != "mono":
            # the shared stages key their sensor knobs off camera_type
            import dataclasses
            config = dataclasses.replace(config, camera_type="mono")
        super().__init__(config, vocab, enable_loop_closing,
                         enable_relocalization)
        self._init_ref: FrameState | None = None
        self._init_key = jax.random.PRNGKey(21)
        self.initialized = False
        self.min_init_matches = MIN_INIT_MATCHES
        self.min_triangulated = 50  # reference minTriangulated
                                    # (src/orbinitializer.cpp:468-571);
                                    # scale down with reduced feature budgets

    def reset(self):
        super().reset()
        self._init_ref = None
        self.initialized = False

    # ------------------------------------------------------------------

    def _try_initialize(self, cur: FrameState):
        if self._init_ref is None:
            if int(jnp.sum(cur.features.valid)) > MIN_INIT_FEATURES:
                self._init_ref = cur
            return None

        ref = self._init_ref
        idx_b, ok = matching.search_for_initialization(
            ref.features, cur.features
        )
        n_matches = int(jnp.sum(ok))
        if n_matches < self.min_init_matches:
            self._init_ref = cur  # reference resets the init frame (:436-441)
            return None

        cam = self.config.camera
        self._init_key, sub = jax.random.split(self._init_key)
        xy2 = jnp.take(cur.features.xy, idx_b, axis=0)
        res = initialize_two_view(
            ref.features.xy, xy2, ok, sub,
            fx=cam.fx, fy=cam.fy, cx=cam.cx, cy=cam.cy,
            min_triangulated=self.min_triangulated,
        )
        if not bool(res.success):
            return None

        # median-depth normalization (reference: :537-552)
        good = np.asarray(res.point_ok)
        pts = np.asarray(res.points)
        depths = pts[good][:, 2]
        med = float(np.median(depths)) if len(depths) else 1.0
        if med <= 0:
            self._init_ref = cur
            return None
        inv_med = 1.0 / med
        pts_scaled = jnp.asarray(pts * inv_med)
        T21 = np.array(res.T_21)  # copy: jax array views are read-only
        T21[:3, 3] *= inv_med
        T21 = jnp.asarray(T21)

        # build the initial two-keyframe map: bind ref features i <-> points,
        # cur features idx_b[i] <-> points
        F = ref.features.capacity
        self._ensure_vocab(ref)
        ref = ref._replace(T_cw=jnp.eye(4, dtype=jnp.float32))
        cur2 = cur._replace(T_cw=T21)

        # fake per-feature "depth" via the triangulated z so insert_keyframe
        # creates the points; bind second KF by tracked_point_slot
        good_j = jnp.asarray(good) & ok
        ref_feats = ref.features._replace(
            depth=jnp.where(good_j, pts_scaled[:, 2], -1.0)
        )
        ref = ref._replace(
            features=ref_feats,
            point_cam=jnp.where(good_j[:, None], pts_scaled, 0.0),
        )
        self.map, slot0 = insert_keyframe(
            self.map, ref, -jnp.ones((F,), jnp.int32),
            jnp.asarray(1e9),  # all points "close": create every triangulated one
        )
        binds0 = self.map.kf_obs_point[slot0]
        # map cur features to the same point slots through the match
        cur_binds = jnp.full((F,), -1, jnp.int32).at[
            jnp.where(good_j, idx_b, F - 1)
        ].max(jnp.where(good_j, binds0, -1))
        # mono KF insert must not create depth points: cur has no depth
        self.map, slot1 = insert_keyframe(
            self.map, cur2, cur_binds, jnp.asarray(1e9)
        )
        self._register_keyframe(int(slot0), 0)
        self._register_keyframe(int(slot1), 1)
        # full BA over the fresh two-keyframe map (CreateInitialMapMonocular
        # runs GlobalBundleAdjustemnt(20), reference: src/tracking.cpp:519)
        from .global_ba import run_global_ba
        self.map = run_global_ba(self.map, self.config, n_outer=10,
                                 cg_iters=20)
        T21 = self.map.kf_T_cw[slot1]
        cur2 = cur2._replace(T_cw=T21)
        self.n_keyframes = 2
        self.initialized = True
        self.last_kf_slot = int(slot1)
        self.T_cw = T21
        self.velocity = jnp.eye(4, dtype=jnp.float32)
        self.last_frame = cur2
        self.last_bindings = self.map.kf_obs_point[slot1]
        self.ref_kf_tracked = int(jnp.sum(self.last_bindings >= 0))
        self.trajectory.append(jnp.eye(4))
        self.trajectory.append(T21)
        return T21

    # ------------------------------------------------------------------

    def process(self, img, timestamp: float = 0.0):
        """Single grayscale image in (GrabImageMonocular, reference:
        src/tracking.cpp:233-260).

        Past initialization, the whole per-frame pipeline is the shared
        StereoSlam._step — one code path for both sensors, like the
        reference's sensor-agnostic Track/Mapping core (src/mapping.cpp is
        shared verbatim across sensors).  The sensor knobs (no stereo point
        creation, 20 triangulation neighbours, cnThObs 2, thRefRatio 0.9,
        inert close-point rule) key off config.camera_type inside the
        stages.
        """
        img = jnp.asarray(img, jnp.float32)

        if not self.initialized:
            # the reference doubles the extraction budget until the map is
            # bootstrapped (mpIniORBextractor with 2*nFeatures, reference:
            # src/tracking.cpp:118-121, 433) — init needs the densest
            # possible level-0 feature set for two-view matching
            import dataclasses
            n2 = min(2 * self.config.orb.n_features,
                     self.config.orb.max_keypoints)
            cfg_init = dataclasses.replace(
                self.config,
                orb=dataclasses.replace(self.config.orb, n_features=n2),
            )
            cur = process_mono(img, cfg_init, timestamp)
            return self._try_initialize(cur)

        cur = process_mono(img, self.config, timestamp)
        return self._step(cur)
