"""Fused Pallas TPU kernels for the sphere-tracing hot loops.

The pure-JAX marches in render/raymarch.py materialize [N, n_slots]
distance intermediates in HBM every step; these kernels keep a tile of rays
(TILE_ROWS×128, planar x/y/z layout) entirely in VMEM/registers and run the
march ``while_loop`` per-tile — so a tile of rays exits as soon as *it*
converges, the TPU equivalent of a GPU warp's early exit (reference hot
loops: /root/reference/madarch/glsl/raymarching.glsl:1-57).

Scene parameters take one of three layouts, chosen per primitive type by
``build_plan``:

- **unrolled** (≤ UNROLL_SLOTS_MAX live slots): scalars packed into one
  flat f32[NP, 1] SMEM vector; the kernel closure unrolls over slots —
  the compiled-in scene structure mirrors the reference's generated
  closest_primitive loops (madarch-scenes.adb:602-629).
- **SMEM-rolled** (≤ 64 slots): same SMEM scalars, slot-interleaved, read
  at a dynamic ``fori_loop`` offset with an S_UNROLL-way block unroll —
  one compiled scene body per site (the round-2 full unroll hit 306 s
  compiles at 40 slots) at near-unrolled runtime.
- **chunked** (many slots, e.g. the 968-triangle obj_mesh): scalars stored
  as lane-replicated VMEM rows (f32[n_slots·NF, 128]) read one (1,128) row
  per scalar and broadcast along sublanes — no Mosaic relayouts; the slot
  loop is a rolled ``fori_loop`` so code size stays constant in slot
  count.  Types with a ``derive`` form (triangles) pack precomputed
  per-slot constants instead of raw fields.

Rolled types with spatial ``bounds`` additionally carry bounding AABBs
as SMEM scalars (global + per CHUNK/CHUNK_S-slot chunk) driving two
levels of culling, the TPU analogue of the reference's grid candidate
culling (madarch-scenes.adb:839-1118) at tile granularity:

  * every scene call computes the AABB of the tile's *active* lanes once
    (6 vector reduces); each chunk is then admitted or skipped by a pure
    scalar-core box-to-box gap test — no per-chunk vector reduces, no
    vector→scalar moves in the ``lax.cond`` predicate (the round-3
    attempt paid a reduce per chunk per step and lost);
  * skipped chunks contribute their per-lane point-to-AABB lower bound
    (sphere tracing only needs a conservative bound ≥ ``margin`` away),
    admitted chunks run the exact slot loop;
  * lanes outside ``margin`` of the *global* AABB blend to the global
    lower bound per-lane, and a whole-entry scalar test skips even the
    chunk loop when every active lane is far.

  The classify / FD-normal / AO sites also run culled: at a hit point the
  governing entry's true distance is ≤ the probe offset (≤ 0.3 for AO,
  ≤ √3·1e-3 for the tetrahedron normal) which is < ``margin``, so a
  skipped chunk's ≥ ``margin`` bound can never contaminate the min for
  any lane whose result is consumed.

Beyond the three bare marches, ``pallas_geometry`` is the fused
march-and-classify kernel: primary sphere trace, nearest-primitive index +
material id (closest_primitive_info, madarch-scenes.adb:631),
tetrahedron-FD surface normal, ambient occlusion probes (lighting.glsl:51),
per-light penumbra marches (raymarching.glsl:4) and the 8 DDGI
probe-visibility marches (render_probes.glsl:30-45) — one kernel invocation
per shade batch.  The AO offsets, FD-normal offsets, all lights' shadow
rays and all 8 probe-visibility rays are *stacked on the sublane axis* and
marched as single while_loops: one march instance each instead of
3+4+L+8 — both the round-2 compile cliff (38 inlined scene bodies) and the
loop-overhead tax die together.
"""
from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from madarch_tpu.core.vecmath import EPSILON

LANES = 128
# Rays per grid program: TILE_ROWS×128.  8 rows = one 32×32 screen block
# (the culling sweet spot for mesh scenes); env-tunable for A/Bs.
TILE_ROWS = int(os.environ.get("MADARCH_TILE_ROWS", "8"))
BIG = 1e9
# March steps executed per while_loop iteration: amortizes the scalar-core
# condition check + sync across UNROLL vector steps.  Lanes carry an exact
# per-step max_steps guard, so results are step-for-step identical to the
# unrolled-by-1 loop.
UNROLL = int(os.environ.get("MADARCH_UNROLL", "3"))
# Central-difference half-step for the in-kernel tetrahedron normal.
NORMAL_H = 1e-3
# Types with more live slots than this use a rolled slot loop.  8 keeps
# the GI/light_shafts room scenes (≤ 8 live slots per type) on the
# fully-unrolled SMEM path while 20-slot types (simple_scene) roll:
# compiled scene bodies stay O(8) instead of O(40), which is what held
# simple_scene at a 170 s compile.
UNROLL_SLOTS_MAX = 8
# Rolled types keep their scalars in SMEM (read at a dynamic fori_loop
# offset — near-unrolled runtime, measured fast on v5e) as long as they
# fit this many scalars and chunk culling can't pay off; bigger or
# heavily-bounded types (meshes) take the chunked VMEM layout + culling.
SMEM_ROLLED_SCALARS_MAX = int(
    os.environ.get("MADARCH_SMEM_MAX", "512"))
SMEM_ROLLED_SLOTS_MAX = 64
# Partial-unroll cap for the SMEM-rolled slot loop; the per-entry factor
# balances block count so no block evaluates clamped padding slots
# (v5e A/B on simple_scene: 20 → 99.8 M rays/s @ 55 s compile,
# 8 → 77.1 M, 12 → 65.5 M — unbalanced blocks waste clamped evals).
S_UNROLL = int(os.environ.get("MADARCH_S_UNROLL", "20"))
# Chunk granularity for bounding boxes: per-culling-chunk slot counts
# for the chunked-VMEM and SMEM-rolled layouts.  Rolled chunks are tiny
# (2 slots): their seg-candidate corridors admit per-slot-pair, and with
# dense candidate evaluation there is no per-step admit cost to amortize
# (v5e simple_scene geometry: CHUNK_S 8 -> 89 ms, 4 -> 79, 2 -> 71,
# 1 -> 74).
CHUNK = int(os.environ.get("MADARCH_CHUNK", "8"))
CHUNK_S = int(os.environ.get("MADARCH_CHUNK_S", "2"))
# Rolled-type chunk culling (default ON since the dense seg-candidate
# mode landed: the round-4 15% loss was the per-step ladder's admit
# conds, which dense corridors don't pay; MADARCH_S_CULL=0 restores the
# dense-eval layout).
S_CULL = os.environ.get("MADARCH_S_CULL", "1") == "1"
# Second culling level: groups of SUPER chunks get their own AABB row and
# one admit test, used when a type has at least SUPER_MIN chunks — cuts
# the per-call scalar cond count from n_chunks to
# n_supers + SUPER·(admitted supers).
SUPER = int(os.environ.get("MADARCH_SUPER", "8"))
SUPER_MIN = 16
# Unroll of the destacked probe-visibility marches (big plans): chunked
# plans use 1 (no wasted near-convergence evals on expensive scene
# bodies: v5e obj_mesh geometry 156 vs 161 ms; 8 compiled bodies instead
# of 24), cheap rolled plans keep 3 (simple_scene 168 -> 149 ms).
_VIS_UNROLL_ENV = os.environ.get("MADARCH_VIS_UNROLL", "")


def _vis_destack_unroll(plan):
    if _VIS_UNROLL_ENV:
        return int(_VIS_UNROLL_ENV)
    return 1 if plan.has_chunks else 3
# Chunk-culling admit margin for march-loop scene evals: skipped chunks
# contribute their exact per-lane point-to-AABB lower bound, so hits stay
# exact for any margin > eps and smaller margins just admit fewer chunks
# per step (the near-surface probe-visibility marches dominate mesh
# frames; v5e sweeps on obj_mesh geometry: 0.5 → 328 ms, 0.15 → 198,
# 0.06 → 167; post-clamp: 0.06 → 160, 0.03 → 146, 0.015 → 139).
# The _check_eps guard keeps eps < margin.  Env-tunable for perf A/Bs.
FAR_MARGIN = float(os.environ.get("MADARCH_MARGIN", "0.015"))
# AO/FD-normal scene-value reads stay culled at this fixed margin even
# when the march margin is tuned below ao_reach (~0.3): the culling there
# needs ao_reach < margin to keep consumed values exact.
AO_MARGIN = 0.5
# Penumbra marches keep at least this margin: a chunk skipped (or omitted
# from a segment-candidate list) at distance ≥ m bounds its penumbra
# estimate to k·~m/denom, which clears 1 (no darkening lost) for k = 64
# out to denom ≈ 9 — the light distances of the example scenes.  Below
# k = 32 shadows stay exact (see pallas_softshadows).
SHADOW_MARGIN_MIN = float(os.environ.get("MADARCH_SHADOW_MARGIN", "0.15"))
# Per-march-call segment candidates (opt-in; =1 replaces the per-step
# super/chunk cond ladder): before each march, one scalar pass over chunk
# AABBs vs the AABB of the active rays' full segments builds a compact
# candidate list in SMEM scratch; every march step then loops only the
# corridor's chunks.  Omitting non-candidates is sound for marches:
# geometry ≥ margin from the entire segment can neither be hit nor
# crossed by those rays, and penumbra influence is bounded as above.
# Measured on v5e obj_mesh at margin 0.06: 200 ms vs 169 ms for the
# ladder — the two-level ladder's 16 super conds skip 8 chunks each,
# while the flat candidate list pays one dynamic-trip cond per chunk —
# so the ladder stays the default and this is kept for corridor-shaped
# scenes where candidates are few.
SEG_CAND = os.environ.get("MADARCH_SEG_CAND", "0") == "1"
# Dense segment-candidate mode: marches evaluate EVERY corridor chunk
# every step — no per-step admit test, no tile-AABB reduces, no scalar
# branches.  Measured on v5e obj_mesh: 380 ms vs the ladder's 160 — the
# per-march corridors (camera frustum / surface→probe prisms) admit
# 40-90 of 121 chunks, so dense eval volume swamps the saved per-call
# overhead.  Kept as a measured-off knob: corridor-shaped scenes with
# few candidates could still win.  Sound for marches by the segment
# argument above.
SEG_DENSE = os.environ.get("MADARCH_SEG_DENSE", "0") == "1"


@dataclasses.dataclass(frozen=True)
class PlanEntry:
    """Per-type static layout (hashable; ptype hashes by identity)."""

    kind: str            # "u" unrolled-SMEM | "s" SMEM-rolled | "c" chunked
    ptype: object
    n: int               # static slot loop bound (live count or capacity)
    t_idx: int           # index into the counts vector
    goff: int            # global index offset (capacity-based, spec order)
    scalars: tuple = ()  # "u": ((name, smem offset), ...)
    fields: tuple = ()   # "s"/"c": scalar names in slot-interleaved order
    smem_off: int = -1   # "s": base offset into the SMEM param vector
    arr_idx: int = -1    # "c": index into PackedScene.chunked
    sph_idx: int = -1    # "s"/"c": index into PackedScene.spheres (-1: none)
    n_chunks: int = 0    # "s"/"c": chunk count (bounded types)
    chunk: int = 0       # "s"/"c": slots per culling chunk
    n_supers: int = 0    # second culling level (0: single-level)
    derived: bool = False  # "c": params are ptype.derive() constants
    # March-loop culling shape for this entry: "ladder" per-step
    # super/chunk conds | "cand" per-call segment candidates, per-step
    # re-test | "dense" candidates evaluated densely (no per-step test).
    # Measured per layout on v5e: rolled cheap SDFs win with dense
    # 2-slot corridors (simple_scene geometry 89 -> 71 ms) while the
    # chunked mesh layout keeps the ladder (obj_mesh 160 vs 380 ms
    # dense — see SEG_DENSE).
    seg: str = "ladder"


@dataclasses.dataclass(frozen=True)
class ScenePlan:
    """Static half of the packed scene (a jit static argument)."""

    entries: tuple
    n_params: int                # SMEM vector length (≥ 1 when packed)
    static_counts: bool = False  # live counts baked in: no slot masking
    # Far-field short-circuit margin, or None when no entry can use it
    # (unbounded or unrolled types are always evaluated exactly).
    # Captured at build time (with the per-entry seg modes) so the knobs
    # are part of the jit cache key: a knob change can never serve a
    # stale compile, and same-process A/Bs of knob settings work.
    margin: object = None

    @property
    def total_capacity(self):
        return sum(e.n for e in self.entries)

    @property
    def has_chunks(self):
        return any(e.kind == "c" for e in self.entries)

    @property
    def small(self):
        """Cheap-scene-body plans: marches re-amortize with unroll=3 and
        the stacked probe-vis path (the round-2 configuration that set the
        GI throughput floor); bigger plans drop to unroll=2 / destacked
        marches to keep compiled scene bodies bounded.  Rolled entries
        ("s"/"c") compile one body per site regardless of slot count, so
        only unrolled slots count against the budget."""
        unrolled = sum(e.n for e in self.entries if e.kind == "u")
        return not self.has_chunks and unrolled <= 16

    @property
    def all_bounded(self):
        """True when every live entry carries a global AABB — then a ray
        beyond the exit of every (margin-inflated) box can hit nothing,
        and marches clamp their budget to the per-lane box exit
        (_ray_box_cap): sky rays and probe-visibility tails stop at the
        scene's spatial extent instead of marching empty space."""
        return bool(self.entries) and all(
            e.sph_idx >= 0 for e in self.entries)

    @property
    def cand_entries(self):
        """Bounded entries whose march culling runs through per-call
        segment-candidate lists (seg "cand"/"dense") rather than the
        per-step super/chunk ladder."""
        return tuple(e for e in self.entries
                     if e.sph_idx >= 0 and e.seg != "ladder")


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PackedScene:
    """Dynamic half: device arrays consumed by the kernels (a pytree).

    vec: f32[NP, 1] scalars for unrolled/rolled types (SMEM).
    counts: i32[ntypes, 1] live counts (SMEM).
    chunked: per chunked type, f32[n_pad·NF, 128] lane-replicated scalars.
    spheres: per bounded rolled type, f32[(1+n_chunks)·6, 1] SMEM
      scalars: global + per-chunk bounding AABBs (lo xyz, hi xyz).  SMEM
      so the chunk admit test runs entirely on the scalar core.
    """

    vec: jnp.ndarray
    counts: jnp.ndarray
    chunked: tuple
    spheres: tuple


def _scalar_names(fields):
    """Planar scalar names for a field schema, in field order."""
    names = []
    for fname, kind in fields:
        if kind == "vec3":
            names += [f"{fname}_{ax}" for ax in "xyz"]
        else:
            names.append(fname)
    return names


def build_plan(spec):
    """Static half: layout for all primitive types with planar SDFs.

    When the spec carries static live counts (SceneSpec.specialized), slot
    loops run over exactly the live slots with no count mask — the compiled
    kernel is the scene, as the reference's generated GLSL was
    (madarch-scenes.adb:1189-1266)."""
    entries = []
    off = 0
    goff = 0
    arr_idx = 0
    sph_idx = 0
    t_idx = 0
    for ptype, cap, n, static in spec.prim_bounds():
        if n == 0:
            goff += cap
            continue
        if ptype.sdf_planar is None:
            return None  # custom type without planar form: no kernel path
        names = _scalar_names(ptype.fields)
        if any(k not in ("vec3", "float", "int") or
               (k == "int" and f != "material_id")
               for f, k in ptype.fields):
            return None  # int-valued SDF params unsupported
        if n <= UNROLL_SLOTS_MAX:
            scalars = []
            for name in names:
                scalars.append((name, off))
                off += n
            entries.append(PlanEntry(
                kind="u", ptype=ptype, n=n, t_idx=t_idx, goff=goff,
                scalars=tuple(scalars)))
        elif (n <= SMEM_ROLLED_SLOTS_MAX
              and n * len(names) <= SMEM_ROLLED_SCALARS_MAX):
            # rolled types default to dense seg-candidate culling: tiny
            # corridors with zero per-step admit cost (the per-step
            # ladder loses ~15% on cheap SDFs; see CHUNK_S / seg)
            bounded = S_CULL and getattr(ptype, "bounds", None) is not None \
                and n > CHUNK_S
            n_chunks = -(-n // CHUNK_S) if bounded else 0
            n_pad = n_chunks * CHUNK_S if bounded else n
            entries.append(PlanEntry(
                kind="s", ptype=ptype, n=n, t_idx=t_idx, goff=goff,
                fields=tuple(names), smem_off=off,
                sph_idx=sph_idx if bounded else -1, n_chunks=n_chunks,
                chunk=CHUNK_S, seg=_seg_env("dense") if bounded
                else "ladder"))
            if bounded:
                sph_idx += 1
            off += n_pad * len(names)
        else:
            bounded = getattr(ptype, "bounds", None) is not None
            n_chunks = -(-n // CHUNK) if bounded else 0
            derived = getattr(ptype, "derive", None) is not None
            if derived:
                names = _scalar_names(ptype.derived_fields)
            n_supers = (-(-n_chunks // SUPER)
                        if bounded and n_chunks >= SUPER_MIN else 0)
            entries.append(PlanEntry(
                kind="c", ptype=ptype, n=n, t_idx=t_idx, goff=goff,
                fields=tuple(names), arr_idx=arr_idx,
                sph_idx=sph_idx if bounded else -1, n_chunks=n_chunks,
                chunk=CHUNK, n_supers=n_supers, derived=derived,
                seg=_seg_env("ladder") if bounded else "ladder"))
            arr_idx += 1
            if bounded:
                sph_idx += 1
        goff += cap
        t_idx += 1
    entries = tuple(entries)
    return ScenePlan(
        entries=entries, n_params=max(off, 1),
        static_counts=spec.live_prims is not None,
        margin=(FAR_MARGIN if any(e.sph_idx >= 0 for e in entries)
                else None))


def _seg_env(default):
    """Per-layout seg default, overridable globally by the A/B envs."""
    if SEG_DENSE:
        return "dense"
    if SEG_CAND:
        return "cand"
    return default


def _sphere_rows(plan, e, params, count):
    """Global + per-chunk bounding-AABB SMEM rows for a bounded rolled
    entry: f32[(1+n_chunks)·6, 1] of (lox loy loz hix hiy hiz).

    AABBs beat bounding spheres here: Morton-run chunks are elongated, so
    a sphere carries half-diagonal slack into both the admit test and the
    skip-branch lower bound.  All-padded chunks keep lo=BIG/hi=-BIG —
    the point-to-box distance max(lo−p, p−hi, 0) is then huge on every
    axis, so they are naturally inert (no special-casing)."""
    lo, hi = e.ptype.bounds(
        jax.tree.map(lambda a: a[:e.n], params))            # [n,3] each
    if not plan.static_counts:
        live = (jnp.arange(e.n) < count)[:, None]
        lo = jnp.where(live, lo, BIG)
        hi = jnp.where(live, hi, -BIG)
    pad = e.n_chunks * e.chunk - e.n
    if pad:
        lo = jnp.concatenate([lo, jnp.full((pad, 3), BIG, jnp.float32)])
        hi = jnp.concatenate([hi, jnp.full((pad, 3), -BIG, jnp.float32)])
    lo_c = lo.reshape(e.n_chunks, e.chunk, 3).min(axis=1)
    hi_c = hi.reshape(e.n_chunks, e.chunk, 3).max(axis=1)
    glo = jnp.concatenate([lo_c.min(axis=0), hi_c.max(axis=0)])
    if e.n_supers:
        padc = e.n_supers * SUPER - e.n_chunks
        if padc:
            lo_c = jnp.concatenate(
                [lo_c, jnp.full((padc, 3), BIG, jnp.float32)])
            hi_c = jnp.concatenate(
                [hi_c, jnp.full((padc, 3), -BIG, jnp.float32)])
        lo_s = lo_c.reshape(e.n_supers, SUPER, 3).min(axis=1)
        hi_s = hi_c.reshape(e.n_supers, SUPER, 3).max(axis=1)
        rows = jnp.concatenate([
            glo, jnp.concatenate([lo_s, hi_s], axis=1).reshape(-1),
            jnp.concatenate([lo_c, hi_c], axis=1).reshape(-1)])
    else:
        rows = jnp.concatenate([
            glo, jnp.concatenate([lo_c, hi_c], axis=1).reshape(-1)])
    return rows.reshape(-1, 1)


def pack_params(plan: ScenePlan, data):
    """Dynamic half: build the PackedScene pytree from scene data."""
    parts = []
    counts = []
    chunked = []
    spheres = []
    for e in plan.entries:
        params = data.prims[e.ptype.name]
        src = (e.ptype.derive(jax.tree.map(lambda a: a[:e.n], params))
               if e.derived else params)
        cols = []
        for sname in (dict(e.scalars).keys() if e.kind == "u"
                      else e.fields):
            if sname in src:
                cols.append(src[sname][:e.n].astype(jnp.float32))
            else:
                base, ax = sname.rsplit("_", 1)
                cols.append(src[base][:e.n, "xyz".index(ax)]
                            .astype(jnp.float32))
        counts.append(data.prim_counts[e.ptype.name])
        if e.kind == "u":
            parts += cols
            continue
        # rolled layouts: scalars interleaved per slot
        # ([slot0 f0..fF, slot1 f0..fF, ...]), padded to the chunk grid
        nf = len(e.fields)
        n_pad = e.n_chunks * e.chunk if e.sph_idx >= 0 else e.n
        mat = jnp.stack(cols, axis=1)                       # [n, NF]
        if n_pad != e.n:
            mat = jnp.concatenate(
                [mat, jnp.zeros((n_pad - e.n, nf), jnp.float32)])
        if e.kind == "s":
            parts.append(mat.reshape(-1))
        else:
            chunked.append(jnp.broadcast_to(
                mat.reshape(n_pad * nf, 1), (n_pad * nf, LANES)))
        if e.sph_idx >= 0:
            spheres.append(_sphere_rows(plan, e, params, counts[-1]))
    vec = (jnp.concatenate(parts).reshape(-1, 1) if parts
           else jnp.zeros((1, 1), jnp.float32))
    cnt = (jnp.stack(counts).astype(jnp.int32).reshape(-1, 1) if counts
           else jnp.zeros((1, 1), jnp.int32))
    return PackedScene(vec=vec, counts=cnt, chunked=tuple(chunked),
                       spheres=tuple(spheres))


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


# ---------------------------------------------------------------------------
# Scene evaluation over planar (rows, 128) coordinate tiles.
# ---------------------------------------------------------------------------

class SceneRefs:
    """Bundle of the kernel-side scene refs, in pallas-arg order."""

    def __init__(self, counts, params, chunked, spheres):
        self.counts = counts
        self.params = params
        self.chunked = chunked
        self.spheres = spheres

    @staticmethod
    def n_args(plan):
        return 2 + sum(1 for e in plan.entries if e.kind == "c") \
            + sum(1 for e in plan.entries if e.sph_idx >= 0)

    @staticmethod
    def split(plan, args):
        counts, params = args[0], args[1]
        n_c = sum(1 for e in plan.entries if e.kind == "c")
        n_s = sum(1 for e in plan.entries if e.sph_idx >= 0)
        chunked = tuple(args[2:2 + n_c])
        spheres = tuple(args[2 + n_c:2 + n_c + n_s])
        return SceneRefs(counts, params, chunked, spheres), \
            args[2 + n_c + n_s:]


def _rep(ref, idx, shape):
    """Lane-replicated VMEM row at dynamic index -> broadcast to shape."""
    return jnp.broadcast_to(ref[pl.ds(idx, 1), :], shape)


def _tile_bounds(px, py, pz, act):
    """Scalar AABB (lox loy loz hix hiy hiz) of the tile's active-lane
    positions: the per-call inputs of the scalar-core chunk admit test.
    Inactive (converged) lanes are excluded so they don't inflate the
    bounds; with no active lane the AABB degenerates (lo=BIG, hi=-BIG):
    the admit gap becomes huge, everything skips, and every result of
    the call is don't-care anyway."""
    if act is None:
        lox, hix = jnp.min(px), jnp.max(px)
        loy, hiy = jnp.min(py), jnp.max(py)
        loz, hiz = jnp.min(pz), jnp.max(pz)
    else:
        on = act > 0.5
        lox = jnp.min(jnp.where(on, px, BIG))
        hix = jnp.max(jnp.where(on, px, -BIG))
        loy = jnp.min(jnp.where(on, py, BIG))
        hiy = jnp.max(jnp.where(on, py, -BIG))
        loz = jnp.min(jnp.where(on, pz, BIG))
        hiz = jnp.max(jnp.where(on, pz, -BIG))
    return lox, loy, loz, hix, hiy, hiz


def _seg_box(o, d, mx, en):
    """Scalar AABB of the enabled lanes' full ray segments {o, o+mx·d}.

    Segments are straight, so the AABB of the two endpoint sets contains
    every point any enabled ray can ever visit during its march — the
    input of the per-march-call candidate build."""
    ox, oy, oz = o
    dx, dy, dz = d
    ex = ox + mx * dx
    ey = oy + mx * dy
    ez = oz + mx * dz
    on = en > 0.5
    lox = jnp.minimum(jnp.min(jnp.where(on, ox, BIG)),
                      jnp.min(jnp.where(on, ex, BIG)))
    hix = jnp.maximum(jnp.max(jnp.where(on, ox, -BIG)),
                      jnp.max(jnp.where(on, ex, -BIG)))
    loy = jnp.minimum(jnp.min(jnp.where(on, oy, BIG)),
                      jnp.min(jnp.where(on, ey, BIG)))
    hiy = jnp.maximum(jnp.max(jnp.where(on, oy, -BIG)),
                      jnp.max(jnp.where(on, ey, -BIG)))
    loz = jnp.minimum(jnp.min(jnp.where(on, oz, BIG)),
                      jnp.min(jnp.where(on, ez, BIG)))
    hiz = jnp.maximum(jnp.max(jnp.where(on, oz, -BIG)),
                      jnp.max(jnp.where(on, ez, -BIG)))
    return lox, loy, loz, hix, hiy, hiz


def _build_candidates(e, refs, seg, cand_ref, margin):
    """One branch-free scalar pass over a bounded entry's chunk AABBs:
    chunks whose box-to-box gap against the segment AABB is < margin are
    compacted into ``cand_ref`` (SMEM scratch); returns the count.  The
    store is unconditional at the running count, so skipped chunks are
    simply overwritten by the next admitted one — no lax.cond."""
    sph = refs.spheres[e.sph_idx]
    slx, sly, slz, shx, shy, shz = seg
    m2 = margin * margin
    chunk_base = 6 + 6 * e.n_supers

    def body(c, cnt):
        base = chunk_base + 6 * c
        lox, loy, loz = sph[base, 0], sph[base + 1, 0], sph[base + 2, 0]
        hix, hiy, hiz = sph[base + 3, 0], sph[base + 4, 0], sph[base + 5, 0]
        gx = jnp.maximum(jnp.maximum(lox - shx, slx - hix), 0.0)
        gy = jnp.maximum(jnp.maximum(loy - shy, sly - hiy), 0.0)
        gz = jnp.maximum(jnp.maximum(loz - shz, slz - hiz), 0.0)
        cand_ref[cnt] = c
        return cnt + (gx * gx + gy * gy + gz * gz < m2).astype(jnp.int32)

    return jax.lax.fori_loop(0, e.n_chunks, body, jnp.int32(0))


def _ray_box_cap(plan, refs, o, d, margin):
    """Per-lane march budget from the bounded entries' global AABBs: the
    slab-test exit t of each margin-inflated box, maxed over entries and
    clamped at 0.  Beyond it the ray stays > margin from every bounded
    box, so with an all-bounded plan nothing can be hit or block — sound
    for primary/visibility marches at any margin > eps, and for penumbra
    marches at shadow margins where k·margin/denom clears 1 (the same
    bound as chunk skipping; see SHADOW_MARGIN_MIN).  Returns None when
    some entry is unbounded (the cap would be wrong) or culling is off."""
    if margin is None or not plan.all_bounded \
            or os.environ.get("MADARCH_NO_CAP", "") == "1":
        return None
    ox, oy, oz = o
    dx, dy, dz = d

    def slab(lo, hi, oo, dd):
        ds = jnp.where(jnp.abs(dd) < 1e-12, 1e-12, dd)
        inv = 1.0 / ds
        t1 = (lo - oo) * inv
        t2 = (hi - oo) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    cap = None
    for e in plan.entries:
        if e.sph_idx < 0:
            continue
        sph = refs.spheres[e.sph_idx]
        n1, x1 = slab(sph[0, 0] - margin, sph[3, 0] + margin, ox, dx)
        n2, x2 = slab(sph[1, 0] - margin, sph[4, 0] + margin, oy, dy)
        n3, x3 = slab(sph[2, 0] - margin, sph[5, 0] + margin, oz, dz)
        t_en = jnp.maximum(jnp.maximum(n1, n2), n3)
        t_ex = jnp.minimum(jnp.minimum(x1, x2), x3)
        ecap = jnp.where(t_en <= t_ex, jnp.maximum(t_ex, 0.0), 0.0)
        cap = ecap if cap is None else jnp.maximum(cap, ecap)
    return cap


def _make_march_scene(plan, refs, scratch, o, d, mx, en, max_dist, margin):
    """Scene closure for one march call: builds per-entry segment
    candidates ONCE (amortized over every step of the march) and returns
    a (px, py, pz, act) -> distance closure whose per-step chunk culling
    runs over the candidates alone.  Falls back to the per-step
    super/chunk ladder when candidates are disabled or nothing is
    bounded."""
    cands = plan.cand_entries
    if margin is None or not cands or not scratch:
        def scene_plain(px, py, pz, act):
            return _scene_dist(plan, refs, px, py, pz, max_dist,
                               margin=margin, act=act)
        return scene_plain

    if not isinstance(mx, tuple) and getattr(mx, "ndim", 0) == 0:
        mx = jnp.full(o[0].shape, mx, jnp.float32)
    seg = _seg_box(o, d, mx, en)
    cand = {e.sph_idx: (scratch[e.sph_idx],
                        _build_candidates(e, refs, seg, scratch[e.sph_idx],
                                          margin))
            for e in cands}

    def scene(px, py, pz, act):
        return _scene_dist(plan, refs, px, py, pz, max_dist, margin=margin,
                           act=act, cand=cand)
    return scene


def _entry_min(plan, e, refs, px, py, pz, max_dist, margin, info,
               tile=None, cand=None):
    """Min distance of one type over a (R,128) tile.

    info=False -> returns d; info=True -> (d, local slot f32, mid f32).
    Bounded rolled types cull through the SMEM AABB rows when ``margin``
    is not None: a scalar box-to-box gap test per chunk (and per
    super-chunk) against the active-lane tile AABB (``tile``) admits or
    skips each chunk; skipped chunks contribute their per-lane
    point-to-box lower bound (≥ margin for every active lane — safe for
    marches, hit tests, and the min structure at points whose true
    distance < margin).

    ``cand``: optional {sph_idx: (smem ref, count)} segment-candidate
    lists (march loops only — see _make_march_scene): the per-step test
    then runs over the candidate chunks alone and all other chunks are
    omitted outright."""
    cnt = None if plan.static_counts else refs.counts[e.t_idx, 0]
    shape = px.shape

    if e.kind == "u":
        best = jnp.full(shape, max_dist, jnp.float32)
        idx = jnp.zeros(shape, jnp.float32)
        mid = jnp.zeros(shape, jnp.float32)
        for i in range(e.n):
            s = {name: refs.params[off + i, 0] for name, off in e.scalars}
            d = e.ptype.sdf_planar(s, px, py, pz)
            if cnt is not None:
                d = jnp.where(i < cnt, d, max_dist)
            if info:
                better = d < best
                idx = jnp.where(better, float(i), idx)
                if "material_id" in s:
                    mid = jnp.where(better, s["material_id"], mid)
            best = jnp.minimum(best, d)
        return (best, idx, mid) if info else best

    # rolled: "s" reads slot scalars from SMEM at a dynamic fori_loop
    # offset; "c" reads lane-replicated VMEM rows
    nf = len(e.fields)
    mid_fi = e.fields.index("material_id") if "material_id" in e.fields \
        else -1
    n_live = cnt if cnt is not None else e.n

    if e.kind == "s":
        def prm_of(s):
            return {f: refs.params[e.smem_off + s * nf + fi, 0]
                    for fi, f in enumerate(e.fields)}
    else:
        arr = refs.chunked[e.arr_idx]

        def prm_of(s):
            return {f: _rep(arr, s * nf + fi, shape)
                    for fi, f in enumerate(e.fields)}

    n_slots_total = e.n_chunks * e.chunk if e.sph_idx >= 0 else e.n
    sdf_fn = e.ptype.sdf_planar_derived if e.derived else e.ptype.sdf_planar

    def slot_fold(s, carry):
        """Evaluate slot s and fold it into the carry.  Reads clamp to the
        packed range (block-unrolled loops may step past the end) while the
        mask keeps the original index, so clamped duplicates never win."""
        if info:
            best, idx, mid = carry
        else:
            best = carry
        prm = prm_of(jnp.minimum(s, n_slots_total - 1))
        d = sdf_fn(prm, px, py, pz)
        d = jnp.where(s < n_live, d, BIG)
        if info:
            better = d < best
            idx = jnp.where(better, s.astype(jnp.float32), idx)
            if mid_fi >= 0:
                mid = jnp.where(better, prm["material_id"], mid)
            return jnp.minimum(best, d), idx, mid
        return jnp.minimum(best, d)

    def init_carry(fill):
        base = jnp.full(shape, fill, jnp.float32)
        if info:
            return (base, jnp.zeros(shape, jnp.float32),
                    jnp.zeros(shape, jnp.float32))
        return base

    def fold_bound(lb, carry):
        """Fold a per-lane lower bound (no slot identity: never a hit)."""
        if info:
            best, idx, mid = carry
            return jnp.minimum(best, lb), idx, mid
        return jnp.minimum(carry, lb)

    def exact():
        # SMEM-rolled loops partially unroll by hand (Mosaic's fori_loop
        # supports only unroll=1 or full).  Block count balances so the
        # last block wastes at most (blocks·u − n) clamped evals — zero
        # whenever n ≤ S_UNROLL or divides evenly.
        if e.kind == "s" and S_UNROLL > 1:
            blocks = -(-n_slots_total // S_UNROLL)
            u = -(-n_slots_total // blocks)

            def block_fold(i, carry):
                for j in range(u):
                    carry = slot_fold(i * u + j, carry)
                return carry

            return jax.lax.fori_loop(0, blocks, block_fold,
                                     init_carry(max_dist))
        return jax.lax.fori_loop(0, n_slots_total, slot_fold,
                                 init_carry(max_dist))

    if e.sph_idx < 0 or margin is None:
        return exact()

    sph = refs.spheres[e.sph_idx]

    def box6(base):
        return (sph[base, 0], sph[base + 1, 0], sph[base + 2, 0],
                sph[base + 3, 0], sph[base + 4, 0], sph[base + 5, 0])

    def box_lb(lox, loy, loz, hix, hiy, hiz):
        """Per-lane lower bound: distance from p to the AABB."""
        bx = jnp.maximum(jnp.maximum(lox - px, px - hix), 0.0)
        by = jnp.maximum(jnp.maximum(loy - py, py - hiy), 0.0)
        bz = jnp.maximum(jnp.maximum(loz - pz, pz - hiz), 0.0)
        return jnp.sqrt(bx * bx + by * by + bz * bz)

    if tile is not None:  # dense candidate mode carries no tile AABB
        tlx, tly, tlz, thx, thy, thz = tile

    def gap2(lox, loy, loz, hix, hiy, hiz):
        """Scalar-core box-to-box gap² (tile AABB vs chunk AABB)."""
        gx = jnp.maximum(jnp.maximum(lox - thx, tlx - hix), 0.0)
        gy = jnp.maximum(jnp.maximum(loy - thy, tly - hiy), 0.0)
        gz = jnp.maximum(jnp.maximum(loz - thz, tlz - hiz), 0.0)
        return gx * gx + gy * gy + gz * gz

    gbox = box6(0)
    lbg = box_lb(*gbox)
    m2 = margin * margin

    chunk_base = 6 + 6 * e.n_supers  # chunk rows follow global + supers

    def chunk_body(c, carry):
        cbox = box6(chunk_base + 6 * c)

        def eval_chunk(cr):
            if e.kind == "s":
                for i in range(e.chunk):
                    cr = slot_fold(c * e.chunk + i, cr)
                return cr
            return jax.lax.fori_loop(
                0, e.chunk,
                lambda i, cc: slot_fold(c * e.chunk + i, cc), cr)

        def skip_chunk(cr):
            return fold_bound(box_lb(*cbox), cr)

        return jax.lax.cond(gap2(*cbox) < m2, eval_chunk, skip_chunk,
                            carry)

    if cand is not None and e.sph_idx in cand:
        cand_ref, n_cand = cand[e.sph_idx]
        if e.seg == "dense":
            # branch-free: every corridor chunk evaluates exactly, every
            # step (see SEG_DENSE)
            def cand_dense(i, cr):
                c = cand_ref[i]
                if e.kind == "s":
                    for j in range(e.chunk):
                        cr = slot_fold(c * e.chunk + j, cr)
                    return cr
                return jax.lax.fori_loop(
                    0, e.chunk,
                    lambda j, cc: slot_fold(c * e.chunk + j, cc), cr)
            out = jax.lax.fori_loop(0, n_cand, cand_dense,
                                    init_carry(max_dist))
        else:
            out = jax.lax.fori_loop(
                0, n_cand,
                lambda i, cr: chunk_body(cand_ref[i], cr),
                init_carry(max_dist))
        far_blend = jnp.minimum(lbg, max_dist)
        if info:
            best, idx, mid = out
            return jnp.where(lbg < margin, best, far_blend), idx, mid
        return jnp.where(lbg < margin, out, far_blend)

    def near():
        if e.n_supers == 0:
            return jax.lax.fori_loop(0, e.n_chunks, chunk_body,
                                     init_carry(max_dist))

        def super_body(si, carry):
            sbox = box6(6 + 6 * si)
            g2 = gap2(*sbox)

            def admit(cr):
                return jax.lax.fori_loop(
                    0, SUPER,
                    lambda j, cc: chunk_body(si * SUPER + j, cc), cr)

            def skip(cr):
                return fold_bound(box_lb(*sbox), cr)

            return jax.lax.cond(g2 < m2, admit, skip, carry)

        return jax.lax.fori_loop(0, e.n_supers, super_body,
                                 init_carry(max_dist))

    # whole-entry scalar test: skip even the chunk loop when every active
    # lane is ≥ margin from the global box
    out = jax.lax.cond(gap2(*gbox) < m2, near,
                       lambda: init_carry(BIG))
    far_blend = jnp.minimum(lbg, max_dist)
    if info:
        best, idx, mid = out
        return jnp.where(lbg < margin, best, far_blend), idx, mid
    return jnp.where(lbg < margin, out, far_blend)


def _chunk_tile(plan, margin, px, py, pz, act):
    """The tile bounding sphere, when some entry will consume it."""
    if margin is None or not any(
            e.sph_idx >= 0 for e in plan.entries):
        return None
    return _tile_bounds(px, py, pz, act)


def _scene_dist(plan, refs, px, py, pz, max_dist, margin=None, act=None,
                cand=None):
    # The per-step tile AABB (6 reduced bounds + scalar extractions —
    # most of a march call's overhead) is only computed when some entry
    # will test against it: a ladder entry, or a "cand"-mode candidate
    # list that re-tests per step.  All-dense plans skip it entirely.
    cand = cand or {}
    needs_tile = any(
        e.sph_idx >= 0 and (e.sph_idx not in cand or e.seg == "cand")
        for e in plan.entries)
    tile = _chunk_tile(plan, margin, px, py, pz, act) if needs_tile \
        else None
    closest = jnp.full(px.shape, max_dist, jnp.float32)
    for e in plan.entries:
        closest = jnp.minimum(closest, _entry_min(
            plan, e, refs, px, py, pz, max_dist, margin, info=False,
            tile=tile, cand=cand))
    return closest


def _scene_dist_info(plan, refs, px, py, pz, max_dist, margin=None,
                     act=None):
    """(closest, global index, material id) — closest_primitive_info
    (madarch-scenes.adb:631-674) inside the kernel.  Index -1 on miss.

    Culling is safe here: hit lanes (the only consumers of idx/mid) have
    true distance < eps < margin, and any skipped chunk's bound is
    ≥ margin for active lanes, so it can never win the min for them."""
    tile = _chunk_tile(plan, margin, px, py, pz, act)
    closest = jnp.full(px.shape, max_dist, jnp.float32)
    index = jnp.full(px.shape, -1.0, jnp.float32)
    mid = jnp.zeros(px.shape, jnp.float32)
    for e in plan.entries:
        d, idx, m = _entry_min(plan, e, refs, px, py, pz, max_dist,
                               margin=margin, info=True, tile=tile)
        better = d < closest
        index = jnp.where(better, e.goff + idx, index)
        mid = jnp.where(better, m, mid)
        closest = jnp.minimum(closest, d)
    return closest, index.astype(jnp.int32), mid.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Shared march loops over planar (rows, 128) ray tiles.  o/d are (x, y, z)
# triples; masks are f32 0/1 (Mosaic cannot carry i1 vectors through a
# while loop).
# ---------------------------------------------------------------------------

def _march_primary(scene, o, d, en, max_dist, eps, max_steps, omega,
                   unroll=UNROLL, cap=None):
    """Over-relaxed sphere trace; returns final t (raymarching.glsl:25-37
    with the Keinert backtrack — exact, see render/raymarch.py).

    ``cap``: optional per-lane global-box exit (_ray_box_cap).  A lane
    beyond the cap is retired only once its position passes the Keinert
    fail check (``~fail``): a valid position ≥ cap means nothing was
    skipped on the way and nothing exists beyond — retiring on the raw
    ``t >= cap`` test would kill over-relaxed lanes mid-overshoot before
    their backtrack and lose real hits (the obj_mesh zero-hit bug)."""
    ox, oy, oz = o
    dx, dy, dz = d
    shape = ox.shape

    def cond(state):
        step, _, active = state[:3]
        return jnp.logical_and(step < max_steps, jnp.max(active) > 0.5)

    def body(state):
        step, t, active, prev_r, step_len, om = state
        for j in range(unroll):
            dist = scene(ox + t * dx, oy + t * dy, oz + t * dz, active)
            fail = jnp.where(om > 1.0, 1.0, 0.0) \
                * jnp.where(jnp.abs(dist) + prev_r <= step_len, 1.0, 0.0)
            hit = (1.0 - fail) * jnp.where(dist < eps, 1.0, 0.0)
            new_step = fail * (step_len * (1.0 - omega)) \
                + (1.0 - fail) * (dist * om)
            om = jnp.where(fail > 0.5, 1.0, om)
            still = active * (1.0 - hit)
            if cap is not None:
                done = (1.0 - fail) * jnp.where(t >= cap, 1.0, 0.0)
                still = still * (1.0 - done)
            still = still * jnp.where(step + j < max_steps, 1.0, 0.0)
            t = t + new_step * still
            prev_r = jnp.where(still > 0.5, jnp.abs(dist), prev_r)
            step_len = jnp.where(still > 0.5, new_step, step_len)
            active = still * jnp.where(t < max_dist, 1.0, 0.0)
        return step + unroll, t, active, prev_r, step_len, om

    _, t, _, _, _, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.zeros(shape, jnp.float32), en,
         jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32),
         jnp.full(shape, omega, jnp.float32)))
    return t


def _march_visibility(scene, o, d, mx, en, eps, max_steps, omega,
                      unroll=UNROLL, cap=None):
    """1 if the ray reaches its per-ray max unobstructed, else 0
    (raymarching.glsl:53-56).  ``cap``: optional per-lane global-box exit;
    lanes beyond it retire only at a fail-checked position (see
    _march_primary) so pending backtracks still run."""
    ox, oy, oz = o
    dx, dy, dz = d
    shape = ox.shape

    def cond(state):
        step, _, active = state[:3]
        return jnp.logical_and(step < max_steps, jnp.max(active) > 0.5)

    def body(state):
        step, t, active, blocked, prev_r, step_len, om = state
        for j in range(unroll):
            dist = scene(ox + t * dx, oy + t * dy, oz + t * dz, active)
            fail = jnp.where(om > 1.0, 1.0, 0.0) \
                * jnp.where(jnp.abs(dist) + prev_r <= step_len, 1.0, 0.0)
            hit = (1.0 - fail) * jnp.where(dist < eps, 1.0, 0.0)
            in_step = jnp.where(step + j < max_steps, 1.0, 0.0)
            blocked = jnp.maximum(blocked, active * hit * in_step)
            new_step = fail * (step_len * (1.0 - omega)) \
                + (1.0 - fail) * (dist * om)
            om = jnp.where(fail > 0.5, 1.0, om)
            still = active * (1.0 - hit) * in_step
            if cap is not None:
                done = (1.0 - fail) * jnp.where(t >= cap, 1.0, 0.0)
                still = still * (1.0 - done)
            t = t + new_step * still
            prev_r = jnp.where(still > 0.5, jnp.abs(dist), prev_r)
            step_len = jnp.where(still > 0.5, new_step, step_len)
            active = still * jnp.where(t < mx, 1.0, 0.0)
        return step + unroll, t, active, blocked, prev_r, step_len, om

    t0 = jnp.zeros(shape, jnp.float32)
    active0 = en * jnp.where(t0 < mx, 1.0, 0.0)
    steps, _, _, blocked, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), t0, active0,
                     jnp.zeros(shape, jnp.float32),
                     jnp.zeros(shape, jnp.float32),
                     jnp.zeros(shape, jnp.float32),
                     jnp.full(shape, omega, jnp.float32)))
    if os.environ.get("MADARCH_VIS_STEPS", "") == "1":
        # diagnostic: per-tile while-loop trip count instead of
        # visibility (tiles pay the max over their lanes — this is the
        # number that prices the march)
        return jnp.full(shape, steps.astype(jnp.float32))
    return 1.0 - blocked


def _march_shadow(scene, o, d, mn, mx, en, eps, max_steps, k,
                  unroll=UNROLL):
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
        for j in range(unroll):
            dist = scene(ox + t * dx, oy + t * dy, oz + t * dz, active)
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
        return step + unroll, t, res, prev, active, blocked

    t0 = mn
    active0 = en * jnp.where(t0 < mx, 1.0, 0.0)
    state0 = (jnp.int32(0), t0, jnp.ones(shape, jnp.float32),
              jnp.full(shape, 1e20, jnp.float32), active0,
              jnp.zeros(shape, jnp.float32))
    _, _, res, _, _, blocked = jax.lax.while_loop(cond, body, state0)
    return res * (1.0 - blocked)


# ---------------------------------------------------------------------------
# Kernels.  Ray layout: f32[rows, 128] arrays (+ per-ray scalars in the
# same layout).  Outputs are f32 (hit masks as 0/1).
# ---------------------------------------------------------------------------

def _split_scratch(plan, rest):
    """Peel the per-bounded-entry candidate scratch refs off the end of
    the kernel args (pallas passes scratch after outputs), keyed by
    sph_idx as _make_march_scene expects."""
    cands = plan.cand_entries
    if not cands:
        return rest, {}
    n_scr = len(cands)
    scratch = {e.sph_idx: r for e, r in
               zip(cands, rest[len(rest) - n_scr:])}
    return rest[:len(rest) - n_scr], scratch


def _raycast_kernel(plan, max_dist, eps, max_steps, omega, *args):
    refs, rest = SceneRefs.split(plan, args)
    rest, scratch = _split_scratch(plan, rest)
    ox, oy, oz, dx, dy, dz, en, t_out, hit_out = rest
    margin = plan.margin

    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    active0 = en[:]
    scene = _make_march_scene(plan, refs, scratch, o, d,
                              jnp.float32(max_dist), active0, max_dist,
                              margin)
    cap = _ray_box_cap(plan, refs, o, d, margin)
    eff = max_dist if cap is None else jnp.minimum(max_dist, cap)
    en_m = active0 if cap is None \
        else active0 * jnp.where(eff > 0.0, 1.0, 0.0)
    t = _march_primary(scene, o, d, en_m, max_dist, eps, max_steps,
                       omega, cap=cap)
    if cap is not None:
        # exit-capped lanes are guaranteed misses: snap t to the miss
        # convention (t = max_dist) the un-capped march converges to
        t = jnp.where(jnp.logical_and(t >= eff, eff < max_dist),
                      max_dist, t)
    # t == max_dist lanes can never be hits: keep them out of the final
    # classification's culling tile box (see _geometry_kernel.classify)
    near = active0 * jnp.where(t < max_dist, 1.0, 0.0)
    d_end = scene(o[0] + t * d[0], o[1] + t * d[1], o[2] + t * d[2], near)
    hit = jnp.where(jnp.logical_and(d_end < eps, t < max_dist), 1.0, 0.0)
    if os.environ.get("MADARCH_DEBUG_CAP", "") == "1" and cap is not None:
        # diagnostic: expose the per-lane box-exit budget and the
        # pre-march enable mask instead of t/hit (cap-clamp debugging)
        t_out[:] = cap
        hit_out[:] = en_m
        return
    t_out[:] = t
    hit_out[:] = hit * active0


def _visibility_kernel(plan, max_dist, eps, max_steps, omega, *args):
    refs, rest = SceneRefs.split(plan, args)
    rest, scratch = _split_scratch(plan, rest)
    ox, oy, oz, dx, dy, dz, mx, en, vis_out = rest
    margin = plan.margin

    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    scene = _make_march_scene(plan, refs, scratch, o, d, mx[:], en[:],
                              max_dist, margin)
    cap = _ray_box_cap(plan, refs, o, d, margin)
    en_m = en[:] if cap is None \
        else en[:] * jnp.where(cap > 0.0, 1.0, 0.0)
    vis_out[:] = _march_visibility(
        scene, o, d, mx[:], en_m, eps, max_steps, omega, cap=cap)


def _softshadow_kernel(plan, max_dist, eps, max_steps, k, margin, *args):
    refs, rest = SceneRefs.split(plan, args)
    rest, scratch = _split_scratch(plan, rest)
    ox, oy, oz, dx, dy, dz, mn, mx, en, res_out = rest

    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    scene = _make_march_scene(plan, refs, scratch, o, d, mx[:], en[:],
                              max_dist, margin)
    cap = _ray_box_cap(plan, refs, o, d, margin)
    mx_eff = mx[:] if cap is None else jnp.minimum(mx[:], cap)
    res_out[:] = _march_shadow(
        scene, o, d, mn[:], mx_eff, en[:], eps, max_steps, k)


def _stack(rows):
    return jnp.concatenate(rows, axis=0)


def _geometry_kernel(plan, cfg, *args):
    """The fused march+classify+shade-geometry kernel.  ``cfg`` is the
    static tuple (max_dist, eps, max_steps, omega, n_lights, shadow_k,
    surface_offset, ao_steps, ao_step_size, spacing xyz, dims xyz,
    want_ao, want_shadows, want_vis, want_refl, refl_shadows, n_mats).

    With ``want_refl`` the specular mode-2 reflection geometry
    (render_probes.glsl:138-209) folds into the same launch: reflect the
    view ray at the primary FD normal, march it, classify, FD-normal,
    penumbra and probe-visibility march the reflection hit — the scene
    stays VMEM-resident across both bounces (the reference does primary
    + reflection in ONE fragment invocation).  The per-lane roughness
    gate (< 0.75, render_probes.glsl:268) reads the material table from
    SMEM via an unrolled one-hot select.

    Outputs are meaningful only where their enabling mask is set: idx,
    mid, normal, ao (and every reflection output) are garbage on lanes
    with hit == 0 — consumers must mask by hit."""
    (max_dist, eps, max_steps, omega, n_lights, shadow_k, surf_off,
     ao_steps, ao_step, spx, spy, spz, dimx, dimy, dimz,
     want_ao, want_shadows, want_vis, want_refl, refl_shadows,
     n_mats, m_unroll) = cfg
    refs, rest = SceneRefs.split(plan, args)
    rest, scratch = _split_scratch(plan, rest)
    if want_refl:
        (lpos_ref, rough_ref, ox, oy, oz, dx, dy, dz, en,
         t_out, hit_out, idx_out, mid_out, nx_out, ny_out, nz_out, ao_out,
         sh_out, vis_out, rt_out, rhit_out, rmid_out, rnx_out, rny_out,
         rnz_out, rsh_out, rvis_out, rpid_out, rbdx_out, rbdy_out,
         rbdz_out) = rest
    else:
        (lpos_ref, ox, oy, oz, dx, dy, dz, en,
         t_out, hit_out, idx_out, mid_out, nx_out, ny_out, nz_out, ao_out,
         sh_out, vis_out) = rest
    margin = plan.margin
    # penumbra marches keep a floor on the skip margin (SHADOW_MARGIN_MIN)
    # and stay exact for small k (ADVICE r3 / pallas_softshadows gate)
    shadow_margin = max(margin, SHADOW_MARGIN_MIN) \
        if margin is not None and shadow_k >= 32.0 else None
    # AO reads scene *values* at offsets ≤ ao_steps·ao_step from the hit
    # point; culling is exact there only while that stays under margin —
    # decoupled from the (tunable) march margin via AO_MARGIN
    ao_reach = ao_steps * ao_step + NORMAL_H * 2.0
    ao_margin = None
    if margin is not None:
        ao_margin = max(margin, AO_MARGIN)
        if ao_reach >= ao_margin:
            ao_margin = None

    def scene_at_hits(px, py, pz, act, margin_=None):
        """Scene distance at points within ao_reach of active hit points:
        the governing entry's true distance is < margin there, so chunk
        culling returns exact values for every consumed lane."""
        return _scene_dist(plan, refs, px, py, pz, max_dist,
                           margin=margin_, act=act)

    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    en0 = en[:]
    R = en0.shape[0]

    # ---- reusable per-bounce blocks -------------------------------------

    def primary_march(oo, dd, en_mask):
        """Sphere trace + miss-convention snap (budget clamped to the
        per-lane global-box exit for bounded scenes)."""
        scn = _make_march_scene(plan, refs, scratch, oo, dd,
                                jnp.float32(max_dist), en_mask, max_dist,
                                margin)
        cap = _ray_box_cap(plan, refs, oo, dd, margin)
        eff = max_dist if cap is None else jnp.minimum(max_dist, cap)
        en_m = en_mask if cap is None \
            else en_mask * jnp.where(eff > 0.0, 1.0, 0.0)
        t = _march_primary(scn, oo, dd, en_m, max_dist, eps, max_steps,
                           omega, unroll=m_unroll, cap=cap)
        if cap is not None:
            t = jnp.where(jnp.logical_and(t >= eff, eff < max_dist),
                          max_dist, t)
        return t

    def classify(ppx, ppy, ppz, t, en_mask):
        """Hit classification: nearest primitive + material (culled: only
        hit lanes consume idx/mid, and their true distance < eps < margin
        keeps skipped-chunk bounds out of the min)."""
        d_end, idx, mid = _scene_dist_info(plan, refs, ppx, ppy, ppz,
                                           max_dist, margin=margin,
                                           act=en_mask)
        hit = jnp.where(jnp.logical_and(d_end < eps, t < max_dist),
                        1.0, 0.0) * en_mask
        return hit, idx, mid

    def fd_normal(ppx, ppy, ppz, hit):
        """Tetrahedron-FD normal of the scene SDF: the four offset points
        stacked on the sublane axis -> ONE scene eval (h=1e-3 ≈ hit eps)."""
        h = NORMAL_H
        tet = ((1.0, -1.0, -1.0), (-1.0, -1.0, 1.0),
               (-1.0, 1.0, -1.0), (1.0, 1.0, 1.0))
        hit4 = _stack([hit] * 4)
        f = scene_at_hits(_stack([ppx + s[0] * h for s in tet]),
                          _stack([ppy + s[1] * h for s in tet]),
                          _stack([ppz + s[2] * h for s in tet]),
                          hit4, ao_margin)
        gx = jnp.zeros_like(ppx)
        gy = jnp.zeros_like(ppx)
        gz = jnp.zeros_like(ppx)
        for k in range(4):
            fk = f[k * R:(k + 1) * R]
            gx = gx + tet[k][0] * fk
            gy = gy + tet[k][1] * fk
            gz = gz + tet[k][2] * fk
        norm = jnp.sqrt(gx * gx + gy * gy + gz * gz + 1e-24)
        return gx / norm, gy / norm, gz / norm

    def shadow_block(ppx, ppy, ppz, sx, sy, sz, nnx, nny, nnz, hit, out):
        """Per-light penumbra marches (lighting.glsl:27-36: origin offset,
        k=64, dir/dist to the light evaluated at the un-offset hit point),
        all lights stacked -> ONE march; writes the stacked out ref."""
        sdx, sdy, sdz, smx, sen = [], [], [], [], []
        for li in range(n_lights):
            lx = lpos_ref[3 * li + 0, 0]
            ly = lpos_ref[3 * li + 1, 0]
            lz = lpos_ref[3 * li + 2, 0]
            tlx = lx - ppx
            tly = ly - ppy
            tlz = lz - ppz
            ldist = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
            inv = 1.0 / jnp.maximum(ldist, 1e-9)
            ldx = tlx * inv
            ldy = tly * inv
            ldz = tlz * inv
            ndotl = nnx * ldx + nny * ldy + nnz * ldz
            sdx.append(ldx)
            sdy.append(ldy)
            sdz.append(ldz)
            smx.append(ldist)
            sen.append(hit * jnp.where(ndotl > EPSILON, 1.0, 0.0))
        # stacked tiles amortize the loop-condition check over k×R rows
        # already; small plans still win from unroll=3 (round-2's GI
        # configuration), big plans cap at 2 to bound compiled scene bodies
        sh_o = (_stack([sx] * n_lights), _stack([sy] * n_lights),
                _stack([sz] * n_lights))
        sh_d = (_stack(sdx), _stack(sdy), _stack(sdz))
        sh_mx = _stack(smx)
        sh_en = _stack(sen)
        scene_shadow = _make_march_scene(plan, refs, scratch, sh_o, sh_d,
                                         sh_mx, sh_en, max_dist,
                                         shadow_margin)
        cap_sh = _ray_box_cap(plan, refs, sh_o, sh_d, shadow_margin)
        if cap_sh is not None:
            sh_mx = jnp.minimum(sh_mx, cap_sh)
        sh = _march_shadow(
            scene_shadow, sh_o, sh_d,
            jnp.zeros((n_lights * R, LANES), jnp.float32), sh_mx,
            sh_en, eps, max_steps, shadow_k,
            unroll=UNROLL if plan.small else 2)
        for li in range(n_lights):
            out[li] = sh[li * R:(li + 1) * R]

    def vis_block(ppx, ppy, ppz, sx, sy, sz, hit, out, pick=None,
                  pick_out=None):
        """8-corner probe visibility marches (render_probes.glsl:30-45):
        corners of the probe-grid cell containing the hit point, clamped
        to the grid; dir/dist from the un-offset hit point.  Stacking the
        8 marches into one while_loop amortizes loop overhead but runs
        for the max step count over ALL corners; with an expensive scene
        eval that tail dominates (v5e: stacked wins 9% at 8 live slots,
        loses 18% at 40, loses 60% on the 968-triangle mesh) — so big
        plans destack (unroll=VIS_DESTACK_UNROLL, one compiled body per
        corner).  MADARCH_VIS_STACK=0/1 overrides for perf A/Bs."""
        cellx = jnp.floor(ppx / spx)
        celly = jnp.floor(ppy / spy)
        cellz = jnp.floor(ppz / spz)
        _vs = os.environ.get("MADARCH_VIS_STACK", "")
        destack = _vs != "1" if _vs in ("0", "1") else not plan.small

        def corner(kxb, kyb, kzb):
            cx = jnp.clip(cellx + kxb, 0.0, float(dimx - 1))
            cy = jnp.clip(celly + kyb, 0.0, float(dimy - 1))
            cz = jnp.clip(cellz + kzb, 0.0, float(dimz - 1))
            wx = cx * spx - ppx
            wy = cy * spy - ppy
            wz = cz * spz - ppz
            pdist = jnp.maximum(jnp.sqrt(wx * wx + wy * wy + wz * wz),
                                1e-6)
            inv = 1.0 / pdist
            # pid = z·gx·gy + y·gx + x (grid_position_to_probe_id)
            pid = cz * float(dimx * dimy) + cy * float(dimx) + cx
            return (wx * inv, wy * inv, wz * inv), pdist - surf_off, pid

        def fold_pick(best, v_d, vis, pid):
            """Mode-2 best-probe pick (render_probes.glsl:166-180):
            weight = dot(dir-to-probe, normal)·vis, strict-> argmax so
            the first max wins like jnp.argmax."""
            nnx, nny, nnz = pick
            w = (v_d[0] * nnx + v_d[1] * nny + v_d[2] * nnz) * vis
            bw, bpid, bdx, bdy, bdz = best
            better = w > bw
            return (jnp.maximum(bw, w),
                    jnp.where(better, pid, bpid),
                    jnp.where(better, -v_d[0], bdx),
                    jnp.where(better, -v_d[1], bdy),
                    jnp.where(better, -v_d[2], bdz))

        def pick_init():
            z = jnp.zeros_like(ppx)
            return (z - BIG, z, z, z, z)

        def one_corner(kxb, kyb, kzb):
            """March one cell corner (corner offsets as DATA, so the
            fori path compiles ONE march body for all 8)."""
            v_d, v_mx, pid = corner(kxb, kyb, kzb)
            v_o = (sx, sy, sz)
            # per-corner candidate corridors: the surface→probe
            # segments of one corner are tight, so each march re-culls
            scene_v = _make_march_scene(plan, refs, scratch, v_o, v_d,
                                        v_mx, hit, max_dist, margin)
            cap_v = _ray_box_cap(plan, refs, v_o, v_d, margin)
            v_en = hit if cap_v is None \
                else hit * jnp.where(cap_v > 0.0, 1.0, 0.0)
            vis = _march_visibility(
                scene_v, v_o, v_d, v_mx, v_en, eps, max_steps, omega,
                unroll=_vis_destack_unroll(plan), cap=cap_v)
            return vis, v_d, pid

        if destack and os.environ.get("MADARCH_VIS_FORI", "1") == "1":
            # ONE compiled march body, 8 sequential runs: corner bits
            # become data and the result stores at a dynamic leading
            # index — big plans drop from 8 compiled bodies to 1
            def body(kk, best):
                kxb = (kk & 1).astype(jnp.float32)
                kyb = ((kk >> 1) & 1).astype(jnp.float32)
                kzb = ((kk >> 2) & 1).astype(jnp.float32)
                vis, v_d, pid = one_corner(kxb, kyb, kzb)
                out[pl.ds(kk, 1)] = vis[None]
                if pick is None:
                    return best
                return fold_pick(best, v_d, vis, pid)
            best = jax.lax.fori_loop(
                0, 8, body, pick_init() if pick is not None else 0)
        elif destack:
            best = pick_init() if pick is not None else None
            for k in range(8):
                vis, v_d, pid = one_corner(float((k >> 0) & 1),
                                           float((k >> 1) & 1),
                                           float((k >> 2) & 1))
                out[k] = vis
                if pick is not None:
                    best = fold_pick(best, v_d, vis, pid)
        else:
            vdx, vdy, vdz, vmx, pids = [], [], [], [], []
            for k in range(8):
                v_d, v_mx, pid = corner(float((k >> 0) & 1),
                                        float((k >> 1) & 1),
                                        float((k >> 2) & 1))
                vdx.append(v_d[0])
                vdy.append(v_d[1])
                vdz.append(v_d[2])
                vmx.append(v_mx)
                pids.append(pid)
            v_o = (_stack([sx] * 8), _stack([sy] * 8), _stack([sz] * 8))
            v_d = (_stack(vdx), _stack(vdy), _stack(vdz))
            v_mx = _stack(vmx)
            v_en = _stack([hit] * 8)
            scene_v = _make_march_scene(plan, refs, scratch, v_o, v_d,
                                        v_mx, v_en, max_dist, margin)
            cap_v = _ray_box_cap(plan, refs, v_o, v_d, margin)
            if cap_v is not None:
                v_en = v_en * jnp.where(cap_v > 0.0, 1.0, 0.0)
            vis = _march_visibility(
                scene_v, v_o, v_d, v_mx, v_en, eps, max_steps, omega,
                unroll=UNROLL, cap=cap_v)
            best = pick_init() if pick is not None else None
            for k in range(8):
                vis_k = vis[k * R:(k + 1) * R]
                out[k] = vis_k
                if pick is not None:
                    best = fold_pick(
                        best, (vdx[k], vdy[k], vdz[k]), vis_k, pids[k])

        if pick is not None:
            _, bpid, bdx, bdy, bdz = best
            pick_out[0][:] = bpid
            pick_out[1][:] = bdx
            pick_out[2][:] = bdy
            pick_out[3][:] = bdz

    # ---- 1. primary bounce ----------------------------------------------
    t = primary_march(o, d, en0)
    px = o[0] + t * d[0]
    py = o[1] + t * d[1]
    pz = o[2] + t * d[2]
    hit, idx, mid = classify(px, py, pz, t, en0)
    nx, ny, nz = fd_normal(px, py, pz, hit)

    # ambient occlusion probes along the normal (lighting.glsl:51-69),
    # all ao_steps offsets in ONE stacked scene eval
    if ao_steps > 0 and want_ao:
        hs = [(i + 1) * ao_step for i in range(ao_steps)]
        hit_ao = _stack([hit] * ao_steps)
        fa = scene_at_hits(_stack([px + nx * hh for hh in hs]),
                           _stack([py + ny * hh for hh in hs]),
                           _stack([pz + nz * hh for hh in hs]),
                           hit_ao, ao_margin)
        ao_sum = jnp.zeros_like(px)
        max_ao_sum = 0.0
        for i in range(ao_steps):
            factor = 1.0 / (2.0 ** i)
            ao_sum = ao_sum + factor * fa[i * R:(i + 1) * R]
            max_ao_sum = max_ao_sum + factor * hs[i]
        ao = 0.6 + 0.4 * ao_sum / max_ao_sum
    else:
        ao = jnp.ones_like(px)

    # shadow/visibility ray origin: surface point nudged off along n
    sox = px + nx * surf_off
    soy = py + ny * surf_off
    soz = pz + nz * surf_off

    if n_lights > 0 and want_shadows:
        shadow_block(px, py, pz, sox, soy, soz, nx, ny, nz, hit, sh_out)
    else:
        for li in range(max(n_lights, 1)):
            sh_out[li] = jnp.ones_like(px)

    if want_vis:
        vis_block(px, py, pz, sox, soy, soz, hit, vis_out)
    else:
        for k in range(8):
            vis_out[k] = jnp.ones_like(px)

    t_out[:] = t
    hit_out[:] = hit
    idx_out[:] = jnp.where(hit > 0.5, idx, -1)
    mid_out[:] = mid
    nx_out[:] = nx
    ny_out[:] = ny
    nz_out[:] = nz
    ao_out[:] = ao

    # ---- 2. reflection bounce (specular mode 2) -------------------------
    if want_refl:
        # roughness(mid) < 0.75 gate via unrolled one-hot SMEM select
        # (equals material_lookup's clamped gather for mid < n_mats)
        midf = mid.astype(jnp.float32)
        rough = jnp.zeros_like(px)
        for m in range(n_mats):
            rough = rough + jnp.where(midf == float(m),
                                      rough_ref[m, 0], 0.0)
        r_en = hit * jnp.where(rough < 0.75, 1.0, 0.0)
        ddn = d[0] * nx + d[1] * ny + d[2] * nz
        r_d = (d[0] - 2.0 * ddn * nx, d[1] - 2.0 * ddn * ny,
               d[2] - 2.0 * ddn * nz)
        r_o = (sox, soy, soz)
        r_t = primary_march(r_o, r_d, r_en)
        rpx = r_o[0] + r_t * r_d[0]
        rpy = r_o[1] + r_t * r_d[1]
        rpz = r_o[2] + r_t * r_d[2]
        r_hit, _r_idx, r_mid = classify(rpx, rpy, rpz, r_t, r_en)
        rnx, rny, rnz = fd_normal(rpx, rpy, rpz, r_hit)
        rsox = rpx + rnx * surf_off
        rsoy = rpy + rny * surf_off
        rsoz = rpz + rnz * surf_off

        if n_lights > 0 and refl_shadows:
            shadow_block(rpx, rpy, rpz, rsox, rsoy, rsoz, rnx, rny, rnz,
                         r_hit, rsh_out)
        else:
            for li in range(max(n_lights, 1)):
                rsh_out[li] = jnp.ones_like(px)
        # the 8 corner marches double as the mode-2 best-probe pick
        # (weight = dot(dir-to-probe, normal)·vis, argmax — the XLA side
        # then skips its [8,N] weight block and gathers entirely)
        vis_block(rpx, rpy, rpz, rsox, rsoy, rsoz, r_hit, rvis_out,
                  pick=(rnx, rny, rnz),
                  pick_out=(rpid_out, rbdx_out, rbdy_out, rbdz_out))

        rt_out[:] = r_t
        rhit_out[:] = r_hit
        rmid_out[:] = r_mid
        rnx_out[:] = rnx
        rny_out[:] = rny
        rnz_out[:] = rnz


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


def _vmem_spec():
    return pl.BlockSpec(memory_space=pltpu.VMEM)


def _scene_specs(plan):
    """in_specs for the PackedScene args, matching SceneRefs.split order."""
    n_c = sum(1 for e in plan.entries if e.kind == "c")
    n_s = sum(1 for e in plan.entries if e.sph_idx >= 0)
    return [_smem_spec(), _smem_spec()] + [_vmem_spec()] * n_c \
        + [_smem_spec()] * n_s


def _scene_args(packed):
    return (packed.counts, packed.vec) + tuple(packed.chunked) \
        + tuple(packed.spheres)


def _cand_scratch(plan):
    """SMEM scratch for the per-march segment-candidate lists: one
    i32[n_chunks] per bounded entry (reused across the marches of one
    kernel invocation — they run sequentially)."""
    return [pltpu.SMEM((max(e.n_chunks, 1),), jnp.int32)
            for e in plan.cand_entries]


def _check_eps(plan, eps):
    """Culled hit classification relies on eps < margin (skipped-chunk
    bounds are ≥ margin and must never read as hits; ADVICE r4)."""
    if plan.margin is not None and not eps < plan.margin:
        raise ValueError(
            f"march eps {eps} must be < culling margin {plan.margin}; "
            "set MADARCH_MARGIN higher or pass a smaller eps")


def _common(n):
    n_pad, rows = _ray_layout(n)
    grid = (rows // TILE_ROWS,)
    return n_pad, rows, grid


def _interpret():
    return jax.default_backend() != "tpu"


def pallas_raycast(plan, packed, origins, dirs, max_dist, *,
                   eps=EPSILON, max_steps=300, enabled=None, omega=1.6):
    n = origins.shape[0]
    n_pad, rows, grid = _common(n)
    o = [_to_rows(origins[:, i], n_pad, 0.0) for i in range(3)]
    d = [_to_rows(dirs[:, i], n_pad, 1.0) for i in range(3)]
    en = (jnp.ones((n,), jnp.float32) if enabled is None
          else enabled.astype(jnp.float32))
    en = _to_rows(en, n_pad, 0.0)

    _check_eps(plan, eps)
    kern = partial(_raycast_kernel, plan, float(max_dist), float(eps),
                   int(max_steps), float(omega))
    t, hit = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=_scene_specs(plan) + [_tile_spec()] * 7,
        out_specs=(_tile_spec(), _tile_spec()),
        out_shape=(jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
                   jax.ShapeDtypeStruct((rows, LANES), jnp.float32)),
        scratch_shapes=_cand_scratch(plan),
        interpret=_interpret(),
    )(*_scene_args(packed), *o, *d, en)
    t = t.reshape(-1)[:n]
    hit = hit.reshape(-1)[:n] > 0.5
    pos = origins + t[:, None] * dirs
    return t, hit, pos


def pallas_visibility(plan, packed, origins, dirs, max_dists, *,
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

    _check_eps(plan, eps)
    kern = partial(_visibility_kernel, plan, 1e4, float(eps),
                   int(max_steps), float(omega))
    vis = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=_scene_specs(plan) + [_tile_spec()] * 8,
        out_specs=_tile_spec(),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        scratch_shapes=_cand_scratch(plan),
        interpret=_interpret(),
    )(*_scene_args(packed), *o, *d, mx, en)
    return vis.reshape(-1)[:n]


def pallas_softshadows(plan, packed, origins, dirs, min_dists,
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

    # the far-field short-circuit underestimates penumbras for small k
    # (see FAR_MARGIN); stay exact unless k·margin comfortably clears 1,
    # and keep the skip margin at the penumbra floor (SHADOW_MARGIN_MIN)
    margin = max(FAR_MARGIN, SHADOW_MARGIN_MIN) if k >= 32.0 else None
    kern = partial(_softshadow_kernel, plan, 1e4, float(eps),
                   int(max_steps), float(k), margin)
    res = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=_scene_specs(plan) + [_tile_spec()] * 9,
        out_specs=_tile_spec(),
        out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.float32),
        scratch_shapes=_cand_scratch(plan),
        interpret=_interpret(),
    )(*_scene_args(packed), *o, *d, mn, mx, en)
    return res.reshape(-1)[:n]


def pallas_geometry(plan, packed, lpos_vec, n_lights, origins,
                    dirs, max_dist, *, probe_spacing, probe_dims,
                    surface_offset, ao_steps, ao_step_size=0.1,
                    shadow_k=64.0, eps=EPSILON, max_steps=300, enabled=None,
                    omega=1.6, want_ao=True, want_shadows=True,
                    want_vis=True, mat_rough_vec=None, refl_shadows=True,
                    march_unroll=None):
    """Fused geometry pass: returns a dict with t, hit (bool), idx (i32
    global primitive index, -1 on miss), mid (i32 material id), normal
    f32[N,3], ao f32[N], shadows f32[L,N], vis8 f32[8,N].

    Outputs other than t/hit are only meaningful where hit is true (and
    shadows/vis8 additionally only where their enabling mask held) —
    non-hit lanes carry whatever the culled marches left behind.

    The ``want_*`` flags statically skip unused marches (reflection-ray
    calls need no AO; see render/shading.py) — skipped outputs are 1s.

    ``mat_rough_vec`` (f32[n_mats, 1] material roughness) folds the
    specular mode-2 reflection bounce into the same launch: the returned
    dict gains "refl" = {t, hit, mid, normal, shadows, vis8} at the
    reflection hits (shadows only marched when ``refl_shadows``)."""
    n = origins.shape[0]
    n_pad, rows, grid = _common(n)
    o = [_to_rows(origins[:, i], n_pad, 0.0) for i in range(3)]
    d = [_to_rows(dirs[:, i], n_pad, 1.0) for i in range(3)]
    en = (jnp.ones((n,), jnp.float32) if enabled is None
          else enabled.astype(jnp.float32))
    en = _to_rows(en, n_pad, 0.0)

    _check_eps(plan, eps)
    want_refl = mat_rough_vec is not None
    n_mats = int(mat_rough_vec.shape[0]) if want_refl else 0
    l_pad = max(n_lights, 1)
    cfg = (float(max_dist), float(eps), int(max_steps), float(omega),
           int(n_lights), float(shadow_k), float(surface_offset),
           int(ao_steps), float(ao_step_size),
           float(probe_spacing[0]), float(probe_spacing[1]),
           float(probe_spacing[2]),
           int(probe_dims[0]), int(probe_dims[1]), int(probe_dims[2]),
           bool(want_ao), bool(want_shadows), bool(want_vis),
           bool(want_refl), bool(refl_shadows), n_mats,
           int(march_unroll if march_unroll is not None else UNROLL))
    kern = partial(_geometry_kernel, plan, cfg)

    f32 = jnp.float32
    out_shape = [
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
    ]
    out_specs = [_tile_spec()] * 8 + [_stacked_spec(l_pad),
                                      _stacked_spec(8)]
    in_specs = _scene_specs(plan) + [_smem_spec()]
    extra_in = ()
    if want_refl:
        out_shape += [
            jax.ShapeDtypeStruct((rows, LANES), f32),          # r_t
            jax.ShapeDtypeStruct((rows, LANES), f32),          # r_hit
            jax.ShapeDtypeStruct((rows, LANES), jnp.int32),    # r_mid
            jax.ShapeDtypeStruct((rows, LANES), f32),          # r_nx
            jax.ShapeDtypeStruct((rows, LANES), f32),          # r_ny
            jax.ShapeDtypeStruct((rows, LANES), f32),          # r_nz
            jax.ShapeDtypeStruct((l_pad, rows, LANES), f32),   # r_shadows
            jax.ShapeDtypeStruct((8, rows, LANES), f32),       # r_vis8
            jax.ShapeDtypeStruct((rows, LANES), f32),          # r_best_pid
            jax.ShapeDtypeStruct((rows, LANES), f32),          # r_best_dx
            jax.ShapeDtypeStruct((rows, LANES), f32),          # r_best_dy
            jax.ShapeDtypeStruct((rows, LANES), f32),          # r_best_dz
        ]
        out_specs += [_tile_spec()] * 6 + [_stacked_spec(l_pad),
                                           _stacked_spec(8)] \
            + [_tile_spec()] * 4
        in_specs = in_specs + [_smem_spec()]
        extra_in = (mat_rough_vec,)

    outs = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs + [_tile_spec()] * 7,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=_cand_scratch(plan),
        interpret=_interpret(),
    )(*_scene_args(packed), lpos_vec, *extra_in, *o, *d, en)
    t, hit, idx, mid, nx, ny, nz, ao, sh, vis = outs[:10]

    def unpad(a):
        return a.reshape(-1)[:n]

    def sh_out(a):
        return a.reshape(l_pad, -1)[:n_lights, :n] if n_lights > 0 \
            else jnp.ones((0, n), jnp.float32)

    normal = jnp.stack([unpad(nx), unpad(ny), unpad(nz)], axis=-1)
    refl = None
    if want_refl:
        (r_t, r_hit, r_mid, rnx, rny, rnz, r_sh, r_vis,
         r_pid, r_bdx, r_bdy, r_bdz) = outs[10:]
        refl = {
            "t": unpad(r_t),
            "hit": unpad(r_hit) > 0.5,
            "mid": unpad(r_mid),
            "normal": jnp.stack([unpad(rnx), unpad(rny), unpad(rnz)],
                                axis=-1),
            "shadows": sh_out(r_sh),
            "vis8": r_vis.reshape(8, -1)[:, :n],
            # mode-2 best-probe pick done in-kernel: probe id (f32 of an
            # int) + the probe→hit direction of the winning corner
            "best_pid": unpad(r_pid),
            "best_dir": jnp.stack([unpad(r_bdx), unpad(r_bdy),
                                   unpad(r_bdz)], axis=-1),
        }
    return {
        "t": unpad(t),
        "hit": unpad(hit) > 0.5,
        "idx": unpad(idx),
        "mid": unpad(mid),
        "normal": normal,
        "ao": unpad(ao),
        "shadows": sh_out(sh),
        "vis8": vis.reshape(8, -1)[:, :n],
        "refl": refl,
    }
