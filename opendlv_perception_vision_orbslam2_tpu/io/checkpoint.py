"""Map checkpoint save/resume.

The reference has write-only dumps and cannot reload a map (SURVEY.md
section 5: "No map serialization/reload").  With the map as one pytree of
arrays, full save/resume is a flat npz round-trip — a genuinely new
capability over the reference.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..models.map_state import MapState

_SCALARS = ("next_kf_id", "next_pt_id")


def save_map(path: str, m: MapState) -> None:
    arrays = {name: np.asarray(getattr(m, name)) for name in MapState._fields}
    np.savez_compressed(path, **arrays)


def load_map(path: str) -> MapState:
    data = np.load(path)
    kwargs = {}
    for name in MapState._fields:
        if name in data:
            kwargs[name] = jnp.asarray(data[name])
    m = MapState(**kwargs)
    if m.loop_valid is None:   # checkpoint predates persistent loop edges
        from ..models.map_state import LOOP_EDGE_CAP

        m = m._replace(
            loop_i=jnp.zeros((LOOP_EDGE_CAP,), jnp.int32),
            loop_j=jnp.zeros((LOOP_EDGE_CAP,), jnp.int32),
            loop_T=jnp.tile(
                jnp.eye(4, dtype=jnp.float32), (LOOP_EDGE_CAP, 1, 1)
            ),
            loop_s=jnp.ones((LOOP_EDGE_CAP,), jnp.float32),
            loop_valid=jnp.zeros((LOOP_EDGE_CAP,), bool),
        )
    return m
