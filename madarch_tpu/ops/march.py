"""Fused Pallas TPU kernels for the sphere-tracing hot loops.

The pure-JAX marches in render/raymarch.py materialize [N, n_slots]
distance intermediates in HBM every step; these kernels keep a tile of rays
(TILE_ROWS×128, planar x/y/z layout) entirely in VMEM/registers, read the
scene's scalar parameters from SMEM, and run the march ``while_loop``
per-tile — so a tile of rays exits as soon as *it* converges, the TPU
equivalent of a GPU warp's early exit (reference hot loops:
/root/reference/madarch/glsl/raymarching.glsl:1-57).

Scene parameters are packed by ``build_plan`` into one flat f32[NP, 1] SMEM
vector plus an i32[ntypes, 1] live-count vector; the kernel closure holds the
static layout and unrolls over capacity slots, masking dead slots by count —
the compiled-in scene structure mirrors the reference's generated
closest_primitive loops (madarch-scenes.adb:602-629).
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from madarch_tpu.core.vecmath import EPSILON

LANES = 128
TILE_ROWS = 8          # 8×128 = 1024 rays per grid program
BIG = 1e9


@dataclasses.dataclass(frozen=True)
class ScenePlan:
    """Static layout of the packed scene-parameter vector (hashable: keyed
    by primitive type identity and offsets only)."""

    entries: tuple  # ((ptype, cap, ((scalar_name, base_offset), ...)), ...)
    n_params: int
    static_counts: bool = False  # live counts baked in: no slot masking

    @property
    def total_capacity(self):
        return sum(cap for _, cap, _ in self.entries)


def build_plan(spec):
    """Static half: scalar layout for all primitive types with planar SDFs.

    When the spec carries static live counts (SceneSpec.specialized), the
    kernel unrolls over exactly the live slots and drops the per-slot count
    mask — the compiled kernel is the scene, as the reference's generated
    GLSL was (madarch-scenes.adb:602-629)."""
    entries = []
    off = 0
    for ptype, cap, n, static in spec.prim_bounds():
        if n == 0:
            continue
        if ptype.sdf_planar is None:
            return None  # custom type without planar form: no kernel path
        scalars = []
        for fname, kind in ptype.fields:
            if fname == "material_id":
                continue
            if kind == "vec3":
                for ax in "xyz":
                    scalars.append((f"{fname}_{ax}", off))
                    off += n
            elif kind == "float":
                scalars.append((fname, off))
                off += n
            else:
                return None  # int-valued SDF params unsupported in kernel
        entries.append((ptype, n, tuple(scalars)))
    return ScenePlan(entries=tuple(entries), n_params=off,
                     static_counts=spec.live_prims is not None)


def pack_params(plan: ScenePlan, data):
    """Dynamic half: f32[NP, 1] parameter vector + i32[ntypes, 1] counts."""
    parts = []
    counts = []
    for ptype, n, scalars in plan.entries:
        params = data.prims[ptype.name]
        for sname, _ in scalars:
            if sname in params:
                parts.append(params[sname][:n].astype(jnp.float32))
            else:
                base, ax = sname.rsplit("_", 1)
                parts.append(params[base][:n, "xyz".index(ax)].astype(
                    jnp.float32))
        counts.append(data.prim_counts[ptype.name])
    vec = jnp.concatenate(parts).reshape(-1, 1)
    cnt = jnp.stack(counts).astype(jnp.int32).reshape(-1, 1)
    return vec, cnt


def _scene_dist(plan: ScenePlan, params_ref, counts_ref, px, py, pz,
                max_dist):
    closest = jnp.full(px.shape, max_dist, jnp.float32)
    for t_idx, (ptype, n, scalars) in enumerate(plan.entries):
        cnt = None if plan.static_counts else counts_ref[t_idx, 0]
        for i in range(n):
            s = {name: params_ref[off + i, 0] for name, off in scalars}
            d = ptype.sdf_planar(s, px, py, pz)
            if cnt is not None:
                d = jnp.where(i < cnt, d, max_dist)
            closest = jnp.minimum(closest, d)
    return closest


# ---------------------------------------------------------------------------
# Kernels.  Ray layout: six f32[rows, 128] arrays (+ per-ray scalars in the
# same layout).  Outputs are f32 (hit masks as 0/1).
# ---------------------------------------------------------------------------

def _raycast_kernel(plan, max_dist, eps, max_steps, omega,
                    counts_ref, params_ref, ox, oy, oz, dx, dy, dz, en,
                    t_out, hit_out):
    shape = ox.shape

    def scene(px, py, pz):
        return _scene_dist(plan, params_ref, counts_ref, px, py, pz,
                           max_dist)

    # Masks are carried as f32 0/1: Mosaic cannot carry i1 vectors through
    # a while loop.  Over-relaxed stepping (render/raymarch.py::RELAXATION):
    # exact thanks to the non-overlap backtrack.
    def cond(state):
        step, _, active = state[:3]
        return jnp.logical_and(step < max_steps, jnp.max(active) > 0.5)

    def body(state):
        step, t, active, prev_r, step_len, om = state
        d = scene(ox[:] + t * dx[:], oy[:] + t * dy[:], oz[:] + t * dz[:])
        fail = jnp.where(om > 1.0, 1.0, 0.0) \
            * jnp.where(jnp.abs(d) + prev_r <= step_len, 1.0, 0.0)
        hit = (1.0 - fail) * jnp.where(d < eps, 1.0, 0.0)
        new_step = fail * (step_len * (1.0 - omega)) \
            + (1.0 - fail) * (d * om)
        om = jnp.where(fail > 0.5, 1.0, om)
        still = active * (1.0 - hit)
        t = t + new_step * still
        prev_r = jnp.where(still > 0.5, jnp.abs(d), prev_r)
        step_len = jnp.where(still > 0.5, new_step, step_len)
        still = still * jnp.where(t < max_dist, 1.0, 0.0)
        return step + 1, t, still, prev_r, step_len, om

    active0 = en[:]
    _, t, _, _, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.zeros(shape, jnp.float32), active0,
         jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
         jnp.full(shape, omega, jnp.float32)))
    d_end = scene(ox[:] + t * dx[:], oy[:] + t * dy[:], oz[:] + t * dz[:])
    hit = jnp.where(jnp.logical_and(d_end < eps, t < max_dist), 1.0, 0.0)
    t_out[:] = t
    hit_out[:] = hit * active0


def _visibility_kernel(plan, max_dist, eps, max_steps, omega,
                       counts_ref, params_ref, ox, oy, oz, dx, dy, dz, mx,
                       en, vis_out):
    shape = ox.shape

    def scene(px, py, pz):
        return _scene_dist(plan, params_ref, counts_ref, px, py, pz,
                           max_dist)

    def cond(state):
        step, _, active = state[:3]
        return jnp.logical_and(step < max_steps, jnp.max(active) > 0.5)

    def body(state):
        step, t, active, blocked, prev_r, step_len, om = state
        d = scene(ox[:] + t * dx[:], oy[:] + t * dy[:], oz[:] + t * dz[:])
        fail = jnp.where(om > 1.0, 1.0, 0.0) \
            * jnp.where(jnp.abs(d) + prev_r <= step_len, 1.0, 0.0)
        hit = (1.0 - fail) * jnp.where(d < eps, 1.0, 0.0)
        blocked = jnp.maximum(blocked, active * hit)
        new_step = fail * (step_len * (1.0 - omega)) \
            + (1.0 - fail) * (d * om)
        om = jnp.where(fail > 0.5, 1.0, om)
        still = active * (1.0 - hit)
        t = t + new_step * still
        prev_r = jnp.where(still > 0.5, jnp.abs(d), prev_r)
        step_len = jnp.where(still > 0.5, new_step, step_len)
        still = still * jnp.where(t < mx[:], 1.0, 0.0)
        return step + 1, t, still, blocked, prev_r, step_len, om

    t0 = jnp.zeros(shape, jnp.float32)
    active0 = en[:] * jnp.where(t0 < mx[:], 1.0, 0.0)
    _, _, _, blocked, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, active0,
                     jnp.zeros(shape, jnp.float32),
                     jnp.zeros(shape, jnp.float32),
                     jnp.zeros(shape, jnp.float32),
                     jnp.full(shape, omega, jnp.float32)))
    vis_out[:] = 1.0 - blocked


def _softshadow_kernel(plan, max_dist, eps, max_steps, k,
                       counts_ref, params_ref, ox, oy, oz, dx, dy, dz, mn,
                       mx, en, res_out):
    shape = ox.shape

    def scene(px, py, pz):
        return _scene_dist(plan, params_ref, counts_ref, px, py, pz,
                           max_dist)

    def cond(state):
        step = state[0]
        active = state[4]
        return jnp.logical_and(step < max_steps, jnp.max(active) > 0.5)

    def body(state):
        step, t, res, prev, active, blocked = state
        d = scene(ox[:] + t * dx[:], oy[:] + t * dy[:], oz[:] + t * dz[:])
        hit = jnp.where(d < eps, 1.0, 0.0)
        blocked = jnp.maximum(blocked, active * hit)
        still = active * (1.0 - hit)

        y = d * d / (2.0 * prev)
        dd = jnp.sqrt(jnp.maximum(d * d - y * y, 0.0))
        denom = t - y
        pen = jnp.where(denom > 1e-9, k * dd / jnp.maximum(denom, 1e-9),
                        BIG)
        res = jnp.where(still > 0.5, jnp.minimum(res, pen), res)

        prev = jnp.where(still > 0.5, d, prev)
        t = t + d * still
        still = still * jnp.where(t < mx[:], 1.0, 0.0)
        return step + 1, t, res, prev, still, blocked

    t0 = mn[:]
    active0 = en[:] * jnp.where(t0 < mx[:], 1.0, 0.0)
    state0 = (jnp.int32(0), t0, jnp.ones(shape, jnp.float32),
              jnp.full(shape, 1e20, jnp.float32), active0,
              jnp.zeros(shape, jnp.float32))
    _, _, res, _, _, blocked = jax.lax.while_loop(cond, body, state0)
    res_out[:] = res * (1.0 - blocked)


# ---------------------------------------------------------------------------
# Host-side wrappers: pad/reshape rays to (rows, 128) tiles and invoke.
# ---------------------------------------------------------------------------

def _to_rows(arr, n_pad, fill):
    flat = jnp.concatenate(
        [arr, jnp.full((n_pad - arr.shape[0],), fill, arr.dtype)]) \
        if arr.shape[0] != n_pad else arr
    return flat.reshape(-1, LANES)


def _ray_layout(n):
    per_tile = TILE_ROWS * LANES
    n_pad = -(-n // per_tile) * per_tile
    return n_pad, n_pad // LANES


def _tile_spec():
    return pl.BlockSpec((TILE_ROWS, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _smem_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _common(n):
    n_pad, rows = _ray_layout(n)
    grid = (rows // TILE_ROWS,)
    return n_pad, rows, grid


def _interpret():
    return jax.default_backend() != "tpu"


def pallas_raycast(plan, params_vec, counts, origins, dirs, max_dist, *,
                   eps=EPSILON, max_steps=300, enabled=None, omega=1.6):
    n = origins.shape[0]
    n_pad, rows, grid = _common(n)
    o = [_to_rows(origins[:, i], n_pad, 0.0) for i in range(3)]
    d = [_to_rows(dirs[:, i], n_pad, 1.0) for i in range(3)]
    en = (jnp.ones((n,), jnp.float32) if enabled is None
          else enabled.astype(jnp.float32))
    en = _to_rows(en, n_pad, 0.0)

    kern = partial(_raycast_kernel, plan, float(max_dist), float(eps),
                   int(max_steps), float(omega))
    t, hit = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[_smem_spec(), _smem_spec()] + [_tile_spec()] * 7,
        out_specs=(_tile_spec(), _tile_spec()),
        out_shape=(jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.float32)),
        interpret=_interpret(),
    )(counts, params_vec, *o, *d, en)
    t = t.reshape(-1)[:n]
    hit = hit.reshape(-1)[:n] > 0.5
    pos = origins + t[:, None] * dirs
    return t, hit, pos


def pallas_visibility(plan, params_vec, counts, origins, dirs, max_dists, *,
                      eps=EPSILON, max_steps=300, enabled=None, omega=1.6):
    n = origins.shape[0]
    n_pad, rows, grid = _common(n)
    o = [_to_rows(origins[:, i], n_pad, 0.0) for i in range(3)]
    d = [_to_rows(dirs[:, i], n_pad, 1.0) for i in range(3)]
    mx = _to_rows(jnp.broadcast_to(max_dists, (n,)).astype(jnp.float32),
                  n_pad, -1.0)
    en = (jnp.ones((n,), jnp.float32) if enabled is None
          else enabled.astype(jnp.float32))
    en = _to_rows(en, n_pad, 0.0)

    kern = partial(_visibility_kernel, plan, float(max_dists_bound(max_dists)),
                   float(eps), int(max_steps), float(omega))
    vis = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[_smem_spec(), _smem_spec()] + [_tile_spec()] * 8,
        out_specs=_tile_spec(),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=_interpret(),
    )(counts, params_vec, *o, *d, mx, en)
    return vis.reshape(-1)[:n]


def max_dists_bound(max_dists):
    """Static clamp used inside _scene_dist; any generous bound works —
    distances only need to exceed the hit epsilon comparisons."""
    return 1e4


def pallas_softshadows(plan, params_vec, counts, origins, dirs, min_dists,
                       max_dists, k, *, eps=EPSILON, max_steps=300,
                       enabled=None):
    n = origins.shape[0]
    n_pad, rows, grid = _common(n)
    o = [_to_rows(origins[:, i], n_pad, 0.0) for i in range(3)]
    d = [_to_rows(dirs[:, i], n_pad, 1.0) for i in range(3)]
    mn = _to_rows(jnp.broadcast_to(min_dists, (n,)).astype(jnp.float32),
                  n_pad, 0.0)
    mx = _to_rows(jnp.broadcast_to(max_dists, (n,)).astype(jnp.float32),
                  n_pad, -1.0)
    en = (jnp.ones((n,), jnp.float32) if enabled is None
          else enabled.astype(jnp.float32))
    en = _to_rows(en, n_pad, 0.0)

    kern = partial(_softshadow_kernel, plan, 1e4, float(eps),
                   int(max_steps), float(k))
    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[_smem_spec(), _smem_spec()] + [_tile_spec()] * 9,
        out_specs=_tile_spec(),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        interpret=_interpret(),
    )(counts, params_vec, *o, *d, mn, mx, en)
    return res.reshape(-1)[:n]
