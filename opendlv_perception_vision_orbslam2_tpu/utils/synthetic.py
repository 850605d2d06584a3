"""Synthetic stereo world: rendered corner sprites + ground-truth trajectory.

The reference has no test fixtures at all — its de-facto integration test is
a KITTI directory none of which ships with the repo (SURVEY.md section 4).
This module provides the miniature synthetic trajectory the new test strategy
calls for: a random 3-D point cloud rendered as high-contrast square sprites
with bilinear sub-pixel splatting, so the full front-end (FAST -> descriptors
-> stereo SAD -> tracking -> BA) can run end-to-end with known ground truth
and measurable ATE, offline and deterministically.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie
from ..utils.config import SystemConfig


SPRITE_R_DEF = 3


class SyntheticWorld(NamedTuple):
    points: jnp.ndarray       # [M, 3] world points
    patterns: jnp.ndarray     # [M, (2R+1)^2] per-point random sprite texture




def _sprite_patterns(rng, n_points: int, sprite_r: int, coarse: int):
    """Band-limited random sprite textures [n, (2r+1)^2]: coarse random
    grid bilinearly upsampled (white noise would alias under sub-pixel
    splatting and destabilize keypoints; smooth gradients survive them)."""
    side = 2 * sprite_r + 1
    base = rng.uniform(40.0, 250.0, (n_points, coarse, coarse)).astype(np.float32)
    t = np.linspace(0.0, coarse - 1.0, side)
    i0 = np.clip(np.floor(t).astype(np.int64), 0, coarse - 2)
    f = (t - i0).astype(np.float32)
    rows = (1 - f)[None, :, None] * base[:, i0, :] + f[None, :, None] * base[:, i0 + 1, :]
    return (
        (1 - f)[None, None, :] * rows[:, :, i0] + f[None, None, :] * rows[:, :, i0 + 1]
    ).reshape(n_points, side * side)


def make_world(n_points: int = 600, seed: int = 0,
               x_range=(-25.0, 25.0), y_range=(-4.0, 3.0),
               z_range=(2.0, 60.0), sprite_r: int = SPRITE_R_DEF,
               coarse: int = 4) -> SyntheticWorld:
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [
            rng.uniform(*x_range, n_points),
            rng.uniform(*y_range, n_points),
            rng.uniform(*z_range, n_points),
        ],
        axis=-1,
    ).astype(np.float32)
    # Unique random texture per sprite => distinctive ORB descriptors, like
    # real-world texture (a shared pattern would make every descriptor
    # ambiguous and unfairly break data association).
    patterns = _sprite_patterns(rng, n_points, sprite_r, coarse)
    return SyntheticWorld(jnp.asarray(pts), jnp.asarray(patterns))


def straight_trajectory(n_frames: int, step: float = 0.35,
                        yaw_rate: float = 0.0, step_x: float = 0.0):
    """Ground-truth camera poses T_cw [N, 4, 4]: forward motion along +z
    (plus optional lateral ``step_x`` along +x — sideways-dominant motion is
    the well-posed regime for monocular two-view initialization) with
    optional constant yaw (world frame = first camera frame)."""
    poses = []
    T_wc = np.eye(4, dtype=np.float32)
    for _ in range(n_frames):
        poses.append(np.linalg.inv(T_wc).astype(np.float32))
        dR = np.array(
            [
                [np.cos(yaw_rate), 0, np.sin(yaw_rate)],
                [0, 1, 0],
                [-np.sin(yaw_rate), 0, np.cos(yaw_rate)],
            ],
            dtype=np.float32,
        )
        step_T = np.eye(4, dtype=np.float32)
        step_T[:3, :3] = dR
        step_T[0, 3] = step_x
        step_T[2, 3] = step
        T_wc = T_wc @ step_T
    return jnp.asarray(np.stack(poses))


SPRITE_R = 3  # sprite half-size in pixels


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7))
def render_view(T_cw, world: SyntheticWorld, height: int, width: int,
                fx: float, fy: float, cx: float, cy: float):
    """Render one grayscale view [H, W] float32 with bilinear sub-pixel splats.

    Each visible point draws a (2R+1)^2 square sprite whose corners trigger
    FAST; bilinear splatting preserves sub-pixel position so stereo disparity
    and tracking accuracy are measurable below integer-pixel noise.
    """
    # sprite radius is derived from the pattern width (static under jit)
    r = (int(round(world.patterns.shape[1] ** 0.5)) - 1) // 2
    pts_cam = lie.transform_points(T_cw[None], world.points[None])[0]
    uv = lie.project(pts_cam, fx, fy, cx, cy)
    z = pts_cam[:, 2]
    visible = (z > 0.5) & (uv[:, 0] > r + 1) & (uv[:, 0] < width - r - 2) \
        & (uv[:, 1] > r + 1) & (uv[:, 1] < height - r - 2)

    u0 = jnp.floor(uv[:, 0]).astype(jnp.int32)
    v0 = jnp.floor(uv[:, 1]).astype(jnp.int32)
    fu = uv[:, 0] - u0
    fv = uv[:, 1] - v0

    img = jnp.full((height, width), 12.0, jnp.float32)  # dim flat background

    dy, dx = np.mgrid[-r : r + 1, -r : r + 1]
    dy = jnp.asarray(dy.reshape(-1))
    dx = jnp.asarray(dx.reshape(-1))
    val = jnp.where(visible[:, None], world.patterns, 0.0)   # [M, S]

    # Bilinear splat into 4 neighbouring pixel grids.
    for (oy, ox, w) in (
        (0, 0, (1 - fu) * (1 - fv)),
        (0, 1, fu * (1 - fv)),
        (1, 0, (1 - fu) * fv),
        (1, 1, fu * fv),
    ):
        ys = v0[:, None] + dy[None, :] + oy
        xs = u0[:, None] + dx[None, :] + ox
        img = img.at[ys, xs].add(val * w[:, None], mode="drop")
    return jnp.clip(img, 0.0, 255.0)


def render_stereo_sequence(config: SystemConfig, n_frames: int = 30,
                           n_points: int = 600, seed: int = 0,
                           step: float = 0.35, yaw_rate: float = 0.0,
                           step_x: float = 0.0,
                           z_range=(2.0, 60.0)):
    """Returns (imgs_left [N,H,W], imgs_right [N,H,W], T_cw_gt [N,4,4], world)."""
    cam = config.camera
    world = make_world(n_points, seed, z_range=z_range)
    poses = straight_trajectory(n_frames, step, yaw_rate, step_x)

    baseline = cam.baseline_m
    T_rl = jnp.asarray(np.array(
        [[1, 0, 0, -baseline], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        dtype=np.float32,
    ))

    def render_pair(T_cw):
        left = render_view(T_cw, world, cam.height, cam.width,
                           cam.fx, cam.fy, cam.cx, cam.cy)
        right = render_view(T_rl @ T_cw, world, cam.height, cam.width,
                            cam.fx, cam.fy, cam.cx, cam.cy)
        return left, right

    lefts, rights = jax.lax.map(render_pair, poses)
    return lefts, rights, poses, world


def render_depth_map(T_cw, world: SyntheticWorld, height: int, width: int,
                     fx: float, fy: float, cx: float, cy: float):
    """Per-pixel depth map [H, W] float32 for the RGB-D fixture (0 = no
    measurement, matching the d>0 validity rule of ComputeStereoFromRGBD,
    reference: src/orbframe.cpp:707-728).

    Each visible point stamps its camera-frame z over its sprite footprint
    so every FAST corner the gray render produces has a depth sample.
    """
    r = (int(round(world.patterns.shape[1] ** 0.5)) - 1) // 2
    pts_cam = lie.transform_points(T_cw[None], world.points[None])[0]
    uv = lie.project(pts_cam, fx, fy, cx, cy)
    z = pts_cam[:, 2]
    visible = (z > 0.5) & (uv[:, 0] > r + 1) & (uv[:, 0] < width - r - 2) \
        & (uv[:, 1] > r + 1) & (uv[:, 1] < height - r - 2)

    u0 = jnp.round(uv[:, 0]).astype(jnp.int32)
    v0 = jnp.round(uv[:, 1]).astype(jnp.int32)
    dy, dx = np.mgrid[-r - 1 : r + 2, -r - 1 : r + 2]
    ys = v0[:, None] + jnp.asarray(dy.reshape(-1))[None, :]
    xs = u0[:, None] + jnp.asarray(dx.reshape(-1))[None, :]

    # Sparse non-overlapping sprites: nearest-depth-wins via scatter-min.
    big = jnp.float32(1e9)
    stamp = jnp.where(visible[:, None], z[:, None], big)
    stamp = jnp.broadcast_to(stamp, ys.shape)
    depth = jnp.full((height, width), big, jnp.float32)
    depth = depth.at[ys, xs].min(stamp, mode="drop")
    return jnp.where(depth >= big, 0.0, depth)


def render_rgbd_sequence(config: SystemConfig, n_frames: int = 30,
                         n_points: int = 600, seed: int = 0,
                         step: float = 0.35, yaw_rate: float = 0.0):
    """Returns (imgs [N,H,W], depth_maps [N,H,W], T_cw_gt [N,4,4], world)."""
    cam = config.camera
    world = make_world(n_points, seed)
    poses = straight_trajectory(n_frames, step, yaw_rate)

    def render_one(T_cw):
        gray = render_view(T_cw, world, cam.height, cam.width,
                           cam.fx, cam.fy, cam.cx, cam.cy)
        depth = render_depth_map(T_cw, world, cam.height, cam.width,
                                 cam.fx, cam.fy, cam.cx, cam.cy)
        return gray, depth

    grays, depths = jax.lax.map(render_one, poses)
    return grays, depths, poses, world


def circular_trajectory(n_frames: int, radius: float = 15.0,
                        laps: float = 1.0):
    """Ground-truth camera poses T_cw [N, 4, 4] driving ``laps`` closed
    circles (heading tangent) — the loop-closure fixture: the camera
    re-enters its own start region once per lap."""
    poses = []
    for i in range(n_frames):
        th = 2.0 * np.pi * laps * i / n_frames
        # circle center at (radius, 0, 0): start at the origin facing +z,
        # turning right; camera forward R_wc@[0,0,1] = (sin th, 0, cos th)
        # equals the velocity direction for every th (a true tangent
        # heading — position and rotation must share the same phase or the
        # drive degenerates to sideways motion twice per lap)
        c = np.array([radius * (1.0 - np.cos(th)), 0.0, radius * np.sin(th)])
        R_wc = np.array(
            [
                [np.cos(th), 0, np.sin(th)],
                [0, 1, 0],
                [-np.sin(th), 0, np.cos(th)],
            ],
            dtype=np.float32,
        )
        T_wc = np.eye(4, dtype=np.float32)
        T_wc[:3, :3] = R_wc
        T_wc[:3, 3] = c
        poses.append(np.linalg.inv(T_wc).astype(np.float32))
    return jnp.asarray(np.stack(poses))


def make_ring_world(n_points: int = 1200, radius: float = 15.0,
                    seed: int = 0, r_off_range=(2.5, 12.0),
                    y_range=(-3.5, 2.5),
                    lateral_range=(-8.0, 8.0),
                    sprite_r: int = SPRITE_R_DEF,
                    coarse: int = 4) -> SyntheticWorld:
    """World points scattered in a band around the circular trajectory so
    every lap segment (including the revisit) sees dense texture.

    The default band suits the 512x256 test camera; KITTI-scale cameras
    (1241x376, fx=718.9) have a much narrower vertical FOV (+-14.7 deg), so
    callers at that geometry should push the band deeper (r_off) and
    flatter (y) or near points clip vertically out of frame."""
    rng = np.random.default_rng(seed)
    th = rng.uniform(0, 2 * np.pi, n_points)
    # points ahead of the tangent direction, mostly inside the close
    # stereo-depth band so every heading has translation-informative
    # texture (far points alone cannot anchor translation)
    r_off = rng.uniform(*r_off_range, n_points)
    y = rng.uniform(*y_range, n_points)
    # anchor on the same circle circular_trajectory drives (center at
    # (radius, 0, 0)); tangent = drive direction, outward = away from center
    cx = radius * (1 - np.cos(th))
    cz = radius * np.sin(th)
    tangent = np.stack([np.sin(th), np.zeros_like(th), np.cos(th)], -1)
    outward = np.stack([-np.cos(th), np.zeros_like(th), np.sin(th)], -1)
    lateral = rng.uniform(*lateral_range, n_points)
    pts = (
        np.stack([cx, np.zeros_like(cx), cz], -1)
        + tangent * r_off[:, None]
        + outward * lateral[:, None]
    )
    pts[:, 1] = y
    pts = pts.astype(np.float32)
    patterns = _sprite_patterns(rng, n_points, sprite_r, coarse)
    return SyntheticWorld(jnp.asarray(pts), jnp.asarray(patterns))


def render_loop_sequence(config: SystemConfig, n_frames: int = 200,
                         n_points: int = 1200, seed: int = 0,
                         radius: float = 15.0, laps: float = 2.0,
                         **world_kwargs):
    """Stereo render of a multi-lap circular drive — the long-sequence
    fixture exercising keyframe culling, capacity recycling and repeated
    loop closures.  Returns (lefts, rights, T_cw_gt, world).
    ``world_kwargs`` forward to :func:`make_ring_world` (band geometry)."""
    cam = config.camera
    world = make_ring_world(n_points, radius, seed, **world_kwargs)
    poses = circular_trajectory(n_frames, radius, laps)

    baseline = cam.baseline_m
    T_rl = jnp.asarray(np.array(
        [[1, 0, 0, -baseline], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        dtype=np.float32,
    ))

    def render_pair(T_cw):
        left = render_view(T_cw, world, cam.height, cam.width,
                           cam.fx, cam.fy, cam.cx, cam.cy)
        right = render_view(T_rl @ T_cw, world, cam.height, cam.width,
                            cam.fx, cam.fy, cam.cx, cam.cy)
        return left, right

    lefts, rights = jax.lax.map(render_pair, poses)
    return lefts, rights, poses, world
