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

Beyond the three bare marches, ``pallas_geometry`` is the fused
march-and-classify kernel: primary sphere trace, nearest-primitive index +
material id (the generated closest_primitive_info, madarch-scenes.adb:631),
tetrahedron-FD surface normal, ambient occlusion probes (lighting.glsl:51),
per-light penumbra marches (raymarching.glsl:4) and the 8 DDGI
probe-visibility marches (render_probes.glsl:30-45) — one kernel invocation
per shade batch, all ray state VMEM-resident.
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
# March steps executed per while_loop iteration: amortizes the scalar-core
# condition check + sync across UNROLL vector steps.  Lanes carry an exact
# per-step max_steps guard, so results are step-for-step identical to the
# unrolled-by-1 loop.
UNROLL = 3
# Central-difference half-step for the in-kernel tetrahedron normal.
NORMAL_H = 1e-3


@dataclasses.dataclass(frozen=True)
class ScenePlan:
    """Static layout of the packed scene-parameter vector (hashable: keyed
    by primitive type identity and offsets only).

    ``entries``: ((ptype, n_slots, ((scalar_name, base_offset), ...),
    global_index_offset), ...).  The global offset is capacity-based in spec
    order, matching scene_sdf_info's index convention."""

    entries: tuple
    n_params: int
    static_counts: bool = False  # live counts baked in: no slot masking

    @property
    def total_capacity(self):
        return sum(n for _, n, _, _ in self.entries)


def build_plan(spec):
    """Static half: scalar layout for all primitive types with planar SDFs.

    When the spec carries static live counts (SceneSpec.specialized), the
    kernel unrolls over exactly the live slots and drops the per-slot count
    mask — the compiled kernel is the scene, as the reference's generated
    GLSL was (madarch-scenes.adb:602-629).  material_id rides along as an
    f32 scalar so the geometry kernel can emit it from the argmin."""
    entries = []
    off = 0
    goff = 0
    for ptype, cap, n, static in spec.prim_bounds():
        if n == 0:
            goff += cap
            continue
        if ptype.sdf_planar is None:
            return None  # custom type without planar form: no kernel path
        scalars = []
        for fname, kind in ptype.fields:
            if kind == "vec3":
                for ax in "xyz":
                    scalars.append((f"{fname}_{ax}", off))
                    off += n
            elif kind == "float":
                scalars.append((fname, off))
                off += n
            elif fname == "material_id":
                scalars.append((fname, off))
                off += n
            else:
                return None  # other int-valued SDF params unsupported
        entries.append((ptype, n, tuple(scalars), goff))
        goff += cap
    return ScenePlan(entries=tuple(entries), n_params=off,
                     static_counts=spec.live_prims is not None)


def pack_params(plan: ScenePlan, data):
    """Dynamic half: f32[NP, 1] parameter vector + i32[ntypes, 1] counts."""
    parts = []
    counts = []
    for ptype, n, scalars, _ in plan.entries:
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


def pack_light_positions(spec, data):
    """f32[3L, 1] light positions in light_bounds slot order (the shadow-ray
    targets of the geometry kernel), or None if some live light type has no
    vec3 'position' field.  Returns (vec, n_slots)."""
    parts = []
    n_slots = 0
    for ltype, cap, n, static in spec.light_bounds():
        if n == 0:
            continue
        kinds = dict(ltype.fields)
        if kinds.get("position") != "vec3":
            return None, 0
        pos = data.lights[ltype.name]["position"][:n].astype(jnp.float32)
        parts.append(pos.reshape(-1))
        n_slots += n
    if n_slots == 0:
        return jnp.zeros((1, 1), jnp.float32), 0
    return jnp.concatenate(parts).reshape(-1, 1), n_slots


def _scene_dist(plan: ScenePlan, params_ref, counts_ref, px, py, pz,
                max_dist):
    closest = jnp.full(px.shape, max_dist, jnp.float32)
    for t_idx, (ptype, n, scalars, _) in enumerate(plan.entries):
        cnt = None if plan.static_counts else counts_ref[t_idx, 0]
        for i in range(n):
            s = {name: params_ref[off + i, 0] for name, off in scalars}
            d = ptype.sdf_planar(s, px, py, pz)
            if cnt is not None:
                d = jnp.where(i < cnt, d, max_dist)
            closest = jnp.minimum(closest, d)
    return closest


def _scene_dist_info(plan: ScenePlan, params_ref, counts_ref, px, py, pz,
                     max_dist):
    """(closest, global index, material id) — closest_primitive_info
    (madarch-scenes.adb:631-674) inside the kernel.  Index -1 on miss."""
    closest = jnp.full(px.shape, max_dist, jnp.float32)
    index = jnp.full(px.shape, -1, jnp.int32)
    mid = jnp.zeros(px.shape, jnp.int32)
    for t_idx, (ptype, n, scalars, goff) in enumerate(plan.entries):
        cnt = None if plan.static_counts else counts_ref[t_idx, 0]
        for i in range(n):
            s = {name: params_ref[off + i, 0] for name, off in scalars}
            d = ptype.sdf_planar(s, px, py, pz)
            if cnt is not None:
                d = jnp.where(i < cnt, d, max_dist)
            better = d < closest
            index = jnp.where(better, goff + i, index)
            if "material_id" in s:
                mid = jnp.where(better, s["material_id"].astype(jnp.int32),
                                mid)
            closest = jnp.minimum(closest, d)
    return closest, index, mid


# ---------------------------------------------------------------------------
# Shared march loops over planar (rows, 128) ray tiles.  o/d are (x, y, z)
# triples; masks are f32 0/1 (Mosaic cannot carry i1 vectors through a
# while loop).
# ---------------------------------------------------------------------------

def _march_primary(scene, o, d, en, max_dist, eps, max_steps, omega):
    """Over-relaxed sphere trace; returns final t (raymarching.glsl:25-37
    with the Keinert backtrack — exact, see render/raymarch.py)."""
    ox, oy, oz = o
    dx, dy, dz = d
    shape = ox.shape

    def cond(state):
        step, _, active = state[:3]
        return jnp.logical_and(step < max_steps, jnp.max(active) > 0.5)

    def body(state):
        step, t, active, prev_r, step_len, om = state
        for j in range(UNROLL):
            dist = scene(ox + t * dx, oy + t * dy, oz + t * dz)
            fail = jnp.where(om > 1.0, 1.0, 0.0) \
                * jnp.where(jnp.abs(dist) + prev_r <= step_len, 1.0, 0.0)
            hit = (1.0 - fail) * jnp.where(dist < eps, 1.0, 0.0)
            new_step = fail * (step_len * (1.0 - omega)) \
                + (1.0 - fail) * (dist * om)
            om = jnp.where(fail > 0.5, 1.0, om)
            still = active * (1.0 - hit)
            still = still * jnp.where(step + j < max_steps, 1.0, 0.0)
            t = t + new_step * still
            prev_r = jnp.where(still > 0.5, jnp.abs(dist), prev_r)
            step_len = jnp.where(still > 0.5, new_step, step_len)
            active = still * jnp.where(t < max_dist, 1.0, 0.0)
        return step + UNROLL, t, active, prev_r, step_len, om

    _, t, _, _, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.zeros(shape, jnp.float32), en,
         jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
         jnp.full(shape, omega, jnp.float32)))
    return t


def _march_visibility(scene, o, d, mx, en, eps, max_steps, omega):
    """1 if the ray reaches its per-ray max unobstructed, else 0
    (raymarching.glsl:53-56)."""
    ox, oy, oz = o
    dx, dy, dz = d
    shape = ox.shape

    def cond(state):
        step, _, active = state[:3]
        return jnp.logical_and(step < max_steps, jnp.max(active) > 0.5)

    def body(state):
        step, t, active, blocked, prev_r, step_len, om = state
        for j in range(UNROLL):
            dist = scene(ox + t * dx, oy + t * dy, oz + t * dz)
            fail = jnp.where(om > 1.0, 1.0, 0.0) \
                * jnp.where(jnp.abs(dist) + prev_r <= step_len, 1.0, 0.0)
            hit = (1.0 - fail) * jnp.where(dist < eps, 1.0, 0.0)
            in_step = jnp.where(step + j < max_steps, 1.0, 0.0)
            blocked = jnp.maximum(blocked, active * hit * in_step)
            new_step = fail * (step_len * (1.0 - omega)) \
                + (1.0 - fail) * (dist * om)
            om = jnp.where(fail > 0.5, 1.0, om)
            still = active * (1.0 - hit) * in_step
            t = t + new_step * still
            prev_r = jnp.where(still > 0.5, jnp.abs(dist), prev_r)
            step_len = jnp.where(still > 0.5, new_step, step_len)
            active = still * jnp.where(t < mx, 1.0, 0.0)
        return step + UNROLL, t, active, blocked, prev_r, step_len, om

    t0 = jnp.zeros(shape, jnp.float32)
    active0 = en * jnp.where(t0 < mx, 1.0, 0.0)
    _, _, _, blocked, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, active0,
                     jnp.zeros(shape, jnp.float32),
                     jnp.zeros(shape, jnp.float32),
                     jnp.zeros(shape, jnp.float32),
                     jnp.full(shape, omega, jnp.float32)))
    return 1.0 - blocked


def _march_shadow(scene, o, d, mn, mx, en, eps, max_steps, k):
    """Cone-approx penumbra march (raymarching.glsl:4-23); ω=1 like the
    reference (the penumbra estimate needs every intermediate distance)."""
    ox, oy, oz = o
    dx, dy, dz = d
    shape = ox.shape

    def cond(state):
        step = state[0]
        active = state[4]
        return jnp.logical_and(step < max_steps, jnp.max(active) > 0.5)

    def body(state):
        step, t, res, prev, active, blocked = state
        for j in range(UNROLL):
            dist = scene(ox + t * dx, oy + t * dy, oz + t * dz)
            hit = jnp.where(dist < eps, 1.0, 0.0)
            in_step = jnp.where(step + j < max_steps, 1.0, 0.0)
            blocked = jnp.maximum(blocked, active * hit * in_step)
            still = active * (1.0 - hit) * in_step

            y = dist * dist / (2.0 * prev)
            dd = jnp.sqrt(jnp.maximum(dist * dist - y * y, 0.0))
            denom = t - y
            pen = jnp.where(denom > 1e-9, k * dd / jnp.maximum(denom, 1e-9),
                            BIG)
            res = jnp.where(still > 0.5, jnp.minimum(res, pen), res)

            prev = jnp.where(still > 0.5, dist, prev)
            t = t + dist * still
            active = still * jnp.where(t < mx, 1.0, 0.0)
        return step + UNROLL, t, res, prev, active, blocked

    t0 = mn
    active0 = en * jnp.where(t0 < mx, 1.0, 0.0)
    state0 = (jnp.int32(0), t0, jnp.ones(shape, jnp.float32),
              jnp.full(shape, 1e20, jnp.float32), active0,
              jnp.zeros(shape, jnp.float32))
    _, _, res, _, _, blocked = jax.lax.while_loop(cond, body, state0)
    return res * (1.0 - blocked)


# ---------------------------------------------------------------------------
# Kernels.  Ray layout: six f32[rows, 128] arrays (+ per-ray scalars in the
# same layout).  Outputs are f32 (hit masks as 0/1).
# ---------------------------------------------------------------------------

def _raycast_kernel(plan, max_dist, eps, max_steps, omega,
                    counts_ref, params_ref, ox, oy, oz, dx, dy, dz, en,
                    t_out, hit_out):
    def scene(px, py, pz):
        return _scene_dist(plan, params_ref, counts_ref, px, py, pz,
                           max_dist)

    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    active0 = en[:]
    t = _march_primary(scene, o, d, active0, max_dist, eps, max_steps,
                       omega)
    d_end = scene(o[0] + t * d[0], o[1] + t * d[1], o[2] + t * d[2])
    hit = jnp.where(jnp.logical_and(d_end < eps, t < max_dist), 1.0, 0.0)
    t_out[:] = t
    hit_out[:] = hit * active0


def _visibility_kernel(plan, max_dist, eps, max_steps, omega,
                       counts_ref, params_ref, ox, oy, oz, dx, dy, dz, mx,
                       en, vis_out):
    def scene(px, py, pz):
        return _scene_dist(plan, params_ref, counts_ref, px, py, pz,
                           max_dist)

    vis_out[:] = _march_visibility(
        scene, (ox[:], oy[:], oz[:]), (dx[:], dy[:], dz[:]), mx[:], en[:],
        eps, max_steps, omega)


def _softshadow_kernel(plan, max_dist, eps, max_steps, k,
                       counts_ref, params_ref, ox, oy, oz, dx, dy, dz, mn,
                       mx, en, res_out):
    def scene(px, py, pz):
        return _scene_dist(plan, params_ref, counts_ref, px, py, pz,
                           max_dist)

    res_out[:] = _march_shadow(
        scene, (ox[:], oy[:], oz[:]), (dx[:], dy[:], dz[:]), mn[:], mx[:],
        en[:], eps, max_steps, k)


def _geometry_kernel(plan, cfg, counts_ref, params_ref, lpos_ref,
                     ox, oy, oz, dx, dy, dz, en,
                     t_out, hit_out, idx_out, mid_out, nx_out, ny_out,
                     nz_out, ao_out, sh_out, vis_out):
    """The fused march+classify+shade-geometry kernel.  ``cfg`` is the
    static tuple (max_dist, eps, max_steps, omega, n_lights, shadow_k,
    surface_offset, ao_steps, ao_step_size, spacing xyz, dims xyz)."""
    (max_dist, eps, max_steps, omega, n_lights, shadow_k, surf_off,
     ao_steps, ao_step, spx, spy, spz, dimx, dimy, dimz) = cfg

    def scene(px, py, pz):
        return _scene_dist(plan, params_ref, counts_ref, px, py, pz,
                           max_dist)

    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    en0 = en[:]

    # 1. primary sphere trace
    t = _march_primary(scene, o, d, en0, max_dist, eps, max_steps, omega)
    px = o[0] + t * d[0]
    py = o[1] + t * d[1]
    pz = o[2] + t * d[2]

    # 2. hit classification: distance + nearest primitive + material
    d_end, idx, mid = _scene_dist_info(plan, params_ref, counts_ref,
                                       px, py, pz, max_dist)
    hit = jnp.where(jnp.logical_and(d_end < eps, t < max_dist), 1.0, 0.0) \
        * en0

    # 3. tetrahedron-FD normal of the scene SDF (the autodiff-normal
    # stand-in inside the kernel; h=1e-3 ≈ the hit epsilon)
    h = NORMAL_H
    gx = jnp.zeros_like(px)
    gy = jnp.zeros_like(px)
    gz = jnp.zeros_like(px)
    for sx, sy, sz in ((1.0, -1.0, -1.0), (-1.0, -1.0, 1.0),
                       (-1.0, 1.0, -1.0), (1.0, 1.0, 1.0)):
        f = scene(px + sx * h, py + sy * h, pz + sz * h)
        gx = gx + sx * f
        gy = gy + sy * f
        gz = gz + sz * f
    norm = jnp.sqrt(gx * gx + gy * gy + gz * gz + 1e-24)
    nx = gx / norm
    ny = gy / norm
    nz = gz / norm

    # 4. ambient occlusion probes along the normal (lighting.glsl:51-69)
    if ao_steps > 0:
        ao_sum = jnp.zeros_like(px)
        max_ao_sum = 0.0
        for i in range(ao_steps):
            factor = 1.0 / (2.0 ** i)
            hh = (i + 1) * ao_step
            ao_sum = ao_sum + factor * scene(px + nx * hh, py + ny * hh,
                                             pz + nz * hh)
            max_ao_sum = max_ao_sum + factor * hh
        ao = 0.6 + 0.4 * ao_sum / max_ao_sum
    else:
        ao = jnp.ones_like(px)

    # shadow/visibility ray origin: surface point nudged off along n
    sox = px + nx * surf_off
    soy = py + ny * surf_off
    soz = pz + nz * surf_off

    # 5. per-light penumbra marches (lighting.glsl:27-36: origin offset,
    # k=64, dir/dist to the light evaluated at the un-offset hit point)
    for li in range(max(n_lights, 1)):
        if li < n_lights:
            lx = lpos_ref[3 * li + 0, 0]
            ly = lpos_ref[3 * li + 1, 0]
            lz = lpos_ref[3 * li + 2, 0]
            tlx = lx - px
            tly = ly - py
            tlz = lz - pz
            ldist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
            inv = 1.0 / jnp.maximum(ldist, 1e-9)
            ldx = tlx * inv
            ldy = tly * inv
            ldz = tlz * inv
            ndotl = nx * ldx + ny * ldy + nz * ldz
            sh_en = hit * jnp.where(ndotl > EPSILON, 1.0, 0.0)
            sh = _march_shadow(scene, (sox, soy, soz), (ldx, ldy, ldz),
                               jnp.zeros_like(px), ldist, sh_en, eps,
                               max_steps, shadow_k)
            sh_out[li] = sh
        else:
            sh_out[li] = jnp.ones_like(px)

    # 6. 8-corner probe visibility marches (render_probes.glsl:30-45):
    # corners of the probe-grid cell containing the hit point, clamped to
    # the grid; dir/dist from the un-offset hit point.
    cellx = jnp.floor(px / spx)
    celly = jnp.floor(py / spy)
    cellz = jnp.floor(pz / spz)
    for k in range(8):
        cx = jnp.clip(cellx + float((k >> 0) & 1), 0.0, float(dimx - 1))
        cy = jnp.clip(celly + float((k >> 1) & 1), 0.0, float(dimy - 1))
        cz = jnp.clip(cellz + float((k >> 2) & 1), 0.0, float(dimz - 1))
        wx = cx * spx - px
        wy = cy * spy - py
        wz = cz * spz - pz
        pdist = jnp.maximum(jnp.sqrt(wx * wx + wy * wy + wz * wz), 1e-6)
        inv = 1.0 / pdist
        vis = _march_visibility(
            scene, (sox, soy, soz), (wx * inv, wy * inv, wz * inv),
            pdist - surf_off, hit, eps, max_steps, omega)
        vis_out[k] = vis

    t_out[:] = t
    hit_out[:] = hit
    idx_out[:] = jnp.where(hit > 0.5, idx, -1)
    mid_out[:] = mid
    nx_out[:] = nx
    ny_out[:] = ny
    nz_out[:] = nz
    ao_out[:] = ao


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


def _stacked_spec(k):
    return pl.BlockSpec((k, TILE_ROWS, LANES), lambda i: (0, i, 0),
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


def pallas_geometry(plan, params_vec, counts, lpos_vec, n_lights, origins,
                    dirs, max_dist, *, probe_spacing, probe_dims,
                    surface_offset, ao_steps, ao_step_size=0.1,
                    shadow_k=64.0, eps=EPSILON, max_steps=300, enabled=None,
                    omega=1.6):
    """Fused geometry pass: returns a dict with t, hit (bool), idx (i32
    global primitive index, -1 on miss), mid (i32 material id), normal
    f32[N,3], ao f32[N], shadows f32[L,N], vis8 f32[8,N]."""
    n = origins.shape[0]
    n_pad, rows, grid = _common(n)
    o = [_to_rows(origins[:, i], n_pad, 0.0) for i in range(3)]
    d = [_to_rows(dirs[:, i], n_pad, 1.0) for i in range(3)]
    en = (jnp.ones((n,), jnp.float32) if enabled is None
          else enabled.astype(jnp.float32))
    en = _to_rows(en, n_pad, 0.0)

    l_pad = max(n_lights, 1)
    cfg = (float(max_dist), float(eps), int(max_steps), float(omega),
           int(n_lights), float(shadow_k), float(surface_offset),
           int(ao_steps), float(ao_step_size),
           float(probe_spacing[0]), float(probe_spacing[1]),
           float(probe_spacing[2]),
           int(probe_dims[0]), int(probe_dims[1]), int(probe_dims[2]))
    kern = partial(_geometry_kernel, plan, cfg)

    f32 = jnp.float32
    out_shape = (
        jax.ShapeDtypeStruct((rows, LANES), f32),          # t
        jax.ShapeDtypeStruct((rows, LANES), f32),          # hit
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),    # idx
        jax.ShapeDtypeStruct((rows, LANES), jnp.int32),    # mid
        jax.ShapeDtypeStruct((rows, LANES), f32),          # nx
        jax.ShapeDtypeStruct((rows, LANES), f32),          # ny
        jax.ShapeDtypeStruct((rows, LANES), f32),          # nz
        jax.ShapeDtypeStruct((rows, LANES), f32),          # ao
        jax.ShapeDtypeStruct((l_pad, rows, LANES), f32),   # shadows
        jax.ShapeDtypeStruct((8, rows, LANES), f32),       # vis8
    )
    out_specs = tuple([_tile_spec()] * 8
                      + [_stacked_spec(l_pad), _stacked_spec(8)])

    t, hit, idx, mid, nx, ny, nz, ao, sh, vis = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[_smem_spec(), _smem_spec(), _smem_spec()]
        + [_tile_spec()] * 7,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=_interpret(),
    )(counts, params_vec, lpos_vec, *o, *d, en)

    def unpad(a):
        return a.reshape(-1)[:n]

    normal = jnp.stack([unpad(nx), unpad(ny), unpad(nz)], axis=-1)
    return {
        "t": unpad(t),
        "hit": unpad(hit) > 0.5,
        "idx": unpad(idx),
        "mid": unpad(mid),
        "normal": normal,
        "ao": unpad(ao),
        "shadows": sh.reshape(l_pad, -1)[:n_lights, :n]
        if n_lights > 0 else jnp.ones((0, n), jnp.float32),
        "vis8": vis.reshape(8, -1)[:, :n],
    }
