"""Decompose the grid-LBA iteration cost: current layout vs PL-last layout.

Hypothesis: the [PL, KW, 3, 6] operand layouts put the tiny dims (3, 6) in
the minor-most (sublane, lane) positions, which TPU tiles to (8, 128) —
massive padding on every materialized einsum operand.  A structure-of-arrays
form with the big PL axis last should cut the per-iteration cost.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.orbslam2_tpu_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass

from opendlv_perception_vision_orbslam2_tpu.optim.ba_grid import (
    _obs_terms, GridBAProblem)
from opendlv_perception_vision_orbslam2_tpu.ops import lie

print("backend:", jax.default_backend(), flush=True)

PL, KW, KO, F = 4096, 16, 8, 2048
key = jax.random.PRNGKey(0)
T_all = jnp.tile(jnp.eye(4, dtype=jnp.float32), (KW, 1, 1))
T_all = T_all.at[:, :3, 3].set(
    0.1 * jax.random.normal(key, (KW, 3)))
pts = jax.random.normal(key, (PL, 3)) * 5.0 + jnp.array([0., 0., 20.])
o_uv = jax.random.normal(key, (PL, KW, 2)) * 100 + 300
o_ur = jnp.abs(jax.random.normal(key, (PL, KW))) * 100
o_sigma2 = jnp.ones((PL, KW))
o_valid = jnp.ones((PL, KW), bool)
prob = GridBAProblem(
    T_all=T_all, kf_valid=jnp.ones((KW,), bool),
    pose_free=jnp.ones((KO,), bool).at[0].set(False),
    pts=pts, pt_valid=jnp.ones((PL,), bool),
    g_pt=jnp.zeros((KW, F), jnp.int32), g_uv=jnp.zeros((KW, F, 2)),
    g_ur=jnp.zeros((KW, F)), g_sigma2=jnp.ones((KW, F)),
    g_valid=jnp.zeros((KW, F), bool),
    obs_table=jnp.zeros((PL, KW), jnp.int32),
    o_uv=o_uv, o_ur=o_ur, o_sigma2=o_sigma2, o_valid=o_valid,
)
fx = fy = 718.0
cx, cy, bf = 607.0, 185.0, 386.0


def bench(name, fn, reps=8):
    out = fn()
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"{name:<44}{(time.time()-t0)/reps*1e3:8.2f} ms", flush=True)


@jax.jit
def obs_terms_15():
    def body(c, _):
        r, Jp, Jl, st, bh = _obs_terms(T_all, pts + c, prob, fx, fy, cx, cy, bf)
        return c + 1e-9 * jnp.sum(r), None
    c, _ = jax.lax.scan(body, 0.0, None, length=15)
    return c


@jax.jit
def full_normal_15():
    """terms + all normal-equation einsums (current layout), 15x."""
    free_row = jnp.ones((KW,)).at[KO:].set(0.0)
    def body(c, _):
        r, Jp_t, Jl_t, st, bh = _obs_terms(
            T_all, pts + c, prob, fx, fy, cx, cy, bf)
        w = jnp.where(o_valid, 1.0 / o_sigma2, 0.0)
        w_t = jnp.stack([jnp.ones_like(w), jnp.ones_like(w),
                         jnp.where(st, 1.0, 0.0)], -1) * w[..., None]
        w_free = w_t * free_row[None, :, None]
        wJp_t = Jp_t * w_free[..., None]
        Hpp = jnp.einsum("pwri,pwrj->wij", wJp_t, Jp_t)[:KO]
        b_p = -jnp.einsum("pwri,pwr->wi", wJp_t, r)[:KO]
        wJl = Jl_t * w_t[..., None]
        Hll = jnp.einsum("pwri,pwrj->pij", wJl, Jl_t)
        b_l = -jnp.einsum("pwri,pwr->pi", wJl, r)
        Hpl = jnp.einsum("pwri,pwrj->pwij", wJp_t, Jl_t)[:, :KO]
        A = jnp.einsum("pkij,pjl->pkil", Hpl, Hll)
        S_off = jnp.einsum("pkil,pqml->kiqm", A, Hpl)
        return c + 1e-9 * (jnp.sum(Hpp) + jnp.sum(S_off) + jnp.sum(b_p)
                           + jnp.sum(b_l)), None
    c, _ = jax.lax.scan(body, 0.0, None, length=15)
    return c


def _obs_terms_T(T_all, pts, fx, fy, cx, cy, bf):
    """PL-LAST layout: every array is [..., KW, PL] with small dims leading."""
    R = T_all[:, :3, :3]
    t = T_all[:, :3, 3]
    # p_c[i, w, p]
    p_c = jnp.einsum("wij,pj->iwp", R, pts) + t.T[:, :, None]  # [3, KW, PL]
    x, y, z = p_c[0], p_c[1], p_c[2]
    z_safe = jnp.where(z > 1e-6, z, 1e-6)
    inv_z = 1.0 / z_safe
    inv_z2 = inv_z * inv_z
    u_hat = fx * x * inv_z + cx
    v_hat = fy * y * inv_z + cy
    ur_hat = u_hat - bf * inv_z
    o_uvT = jnp.transpose(o_uv, (2, 1, 0))     # [2, KW, PL]
    o_urT = o_ur.T                              # [KW, PL]
    is_stereo = o_urT >= 0
    r = jnp.stack([o_uvT[0] - u_hat, o_uvT[1] - v_hat,
                   jnp.where(is_stereo, o_urT - ur_hat, 0.0)], 0)  # [3,KW,PL]
    zeros = jnp.zeros_like(z)
    du = jnp.stack([fx * inv_z, zeros, -fx * x * inv_z2], 0)   # [3, KW, PL]
    dv = jnp.stack([zeros, fy * inv_z, -fy * y * inv_z2], 0)
    dur = du + jnp.stack([zeros, zeros, bf * inv_z2], 0)
    d_pix = jnp.stack([du, dv, dur], 0)        # [3r, 3c, KW, PL]
    # d_pc[c, l, w, p] = [I | -hat(p_c)]: 3x6
    hat = jnp.zeros((3, 3) + z.shape)
    hat = hat.at[0, 1].set(-p_c[2]).at[0, 2].set(p_c[1])
    hat = hat.at[1, 0].set(p_c[2]).at[1, 2].set(-p_c[0])
    hat = hat.at[2, 0].set(-p_c[1]).at[2, 1].set(p_c[0])
    I3 = jnp.broadcast_to(jnp.eye(3)[:, :, None, None], hat.shape)
    d_pc = jnp.concatenate([I3, -hat], axis=1)  # [3, 6, KW, PL]
    J_pose = -jnp.einsum("rcwp,clwp->rlwp", d_pix, d_pc)  # [3, 6, KW, PL]
    J_pt = -jnp.einsum("rcwp,wcl->rlwp", d_pix, R)        # [3, 3, KW, PL]
    return r, J_pose, J_pt, is_stereo, z <= 1e-6


@jax.jit
def full_normal_T_15():
    free_row = jnp.ones((KW,)).at[KO:].set(0.0)
    def body(c, _):
        r, Jp, Jl, st, bh = _obs_terms_T(T_all, pts + c, fx, fy, cx, cy, bf)
        w = jnp.where(o_valid.T, 1.0 / o_sigma2.T, 0.0)      # [KW, PL]
        w_t = jnp.stack([w, w, jnp.where(st, w, 0.0)], 0)    # [3, KW, PL]
        w_free = w_t * free_row[None, :, None]
        wJp = Jp * w_free[:, None]                           # [3, 6, KW, PL]
        Hpp = jnp.einsum("riwp,rjwp->wij", wJp, Jp)[:KO]
        b_p = -jnp.einsum("riwp,rwp->wi", wJp, r)[:KO]
        wJl = Jl * w_t[:, None]
        Hll = jnp.einsum("riwp,rjwp->ijp", wJl, Jl)          # [3, 3, PL]
        b_l = -jnp.einsum("riwp,rwp->ip", wJl, r)            # [3, PL]
        # Hpl with small dims LEADING: [6, 3, KO, PL]
        Hpl = jnp.einsum("riwp,rjwp->ijwp", wJp[:, :, :KO], Jl[:, :, :KO])
        A = jnp.einsum("ijwp,jlp->ilwp", Hpl, Hll)           # [6, 3, KO, PL]
        S_off = jnp.einsum("ilkp,mlqp->kiqm", A, Hpl)        # [KO,6,KO,6]
        return c + 1e-9 * (jnp.sum(Hpp) + jnp.sum(S_off) + jnp.sum(b_p)
                           + jnp.sum(b_l)), None
    c, _ = jax.lax.scan(body, 0.0, None, length=15)
    return c


bench("15x _obs_terms (current layout)", obs_terms_15)
bench("15x terms+normal eqs (current layout)", full_normal_15)
bench("15x terms+normal eqs (PL-last layout)", full_normal_T_15)
