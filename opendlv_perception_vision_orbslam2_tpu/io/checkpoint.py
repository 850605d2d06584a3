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
        a = jnp.asarray(data[name])
        kwargs[name] = a
    return MapState(**kwargs)
