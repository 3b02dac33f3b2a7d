"""Parity tests: Pallas march kernels (interpret mode) vs the XLA path.

The pure-JAX marches are the reference implementation (themselves tested
against closed-form values); the fused kernels must agree ray-for-ray.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from madarch_tpu.ops import march as M
from madarch_tpu.render import raymarch as rm
from madarch_tpu.scene import lights as L
from madarch_tpu.scene import primitives as P
from madarch_tpu.scene.scene import SceneBuilder, SceneSpec, scene_sdf


def build_scene():
    spec = SceneSpec(prims=((P.Sphere, 4), (P.Plane, 6), (P.Box, 4)),
                     lights=((L.PointLight, 1),), max_dist=20.0)
    b = SceneBuilder(spec)
    b.add_material((0.5, 0.5, 0.5), 0.0, 0.5)
    b.add_primitive(P.Sphere, center=(0.0, 0.0, 5.0), radius=1.0,
                    material_id=0)
    b.add_primitive(P.Sphere, center=(2.0, 1.0, 7.0), radius=0.7,
                    material_id=0)
    b.add_primitive(P.Plane, normal=(0.0, 1.0, 0.0), offset=1.0,
                    material_id=0)
    b.add_primitive(P.Box, center=(-2.0, 0.0, 6.0), side=(1.0, 1.0, 1.0),
                    material_id=0)
    b.add_light(L.PointLight, position=(0.0, 5.0, 3.0), color=(1.0,) * 3)
    return spec, b.device_data()


def rand_rays(n, seed=0):
    rng = np.random.RandomState(seed)
    origins = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    origins[:, 1] += 1.0  # above the floor
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return jnp.asarray(origins), jnp.asarray(dirs)


@pytest.fixture(scope="module")
def scene():
    spec, data = build_scene()
    plan = M.build_plan(spec)
    assert plan is not None
    packed = M.pack_params(plan, data)
    sdf_b = jax.vmap(lambda p: scene_sdf(spec, data, p))
    return spec, data, plan, packed, sdf_b


def test_plan_layout(scene):
    spec, data, plan, packed, _ = scene
    assert plan.total_capacity == 14
    assert all(e.kind == "u" for e in plan.entries)  # small scene: unrolled
    np.testing.assert_array_equal(np.asarray(packed.counts).ravel(),
                                  [2, 1, 1])
    # sphere center_x of slot 0 is the first packed scalar
    assert float(packed.vec[0, 0]) == 0.0
    # radius block: after center_x/y/z (3*4 values)
    assert np.isclose(float(packed.vec[12, 0]), 1.0)
    assert np.isclose(float(packed.vec[13, 0]), 0.7)


def test_raycast_parity(scene):
    spec, data, plan, packed, sdf_b = scene
    origins, dirs = rand_rays(64)
    t_ref, hit_ref, pos_ref = rm.raycast(sdf_b, origins, dirs, 20.0)
    t_k, hit_k, pos_k = M.pallas_raycast(plan, packed, origins, dirs,
                                         20.0)
    np.testing.assert_array_equal(np.asarray(hit_k), np.asarray(hit_ref))
    np.testing.assert_allclose(t_k, t_ref, rtol=1e-5, atol=1e-5)


def test_raycast_parity_enabled_mask(scene):
    spec, data, plan, packed, sdf_b = scene
    origins, dirs = rand_rays(32, seed=3)
    enabled = jnp.asarray(np.random.RandomState(4).rand(32) > 0.5)
    t_ref, hit_ref, _ = rm.raycast(sdf_b, origins, dirs, 20.0,
                                   enabled=enabled)
    t_k, hit_k, _ = M.pallas_raycast(plan, packed, origins, dirs, 20.0,
                                     enabled=enabled)
    np.testing.assert_array_equal(np.asarray(hit_k), np.asarray(hit_ref))
    np.testing.assert_allclose(t_k, t_ref, rtol=1e-5, atol=1e-5)


def test_visibility_parity(scene):
    spec, data, plan, packed, sdf_b = scene
    origins, dirs = rand_rays(64, seed=1)
    max_dists = jnp.asarray(
        np.random.RandomState(2).uniform(0.5, 10.0, 64), jnp.float32)
    v_ref = rm.raycast_visibility(sdf_b, origins, dirs, max_dists)
    v_k = M.pallas_visibility(plan, packed, origins, dirs, max_dists)
    np.testing.assert_allclose(v_k, v_ref)


def test_softshadows_parity(scene):
    spec, data, plan, packed, sdf_b = scene
    origins, dirs = rand_rays(64, seed=5)
    max_dists = jnp.full((64,), 12.0, jnp.float32)
    s_ref = rm.softshadows(sdf_b, origins, dirs, jnp.zeros(64), max_dists,
                           64.0)
    s_k = M.pallas_softshadows(plan, packed, origins, dirs,
                               jnp.zeros(64), max_dists, 64.0)
    np.testing.assert_allclose(s_k, s_ref, rtol=1e-5, atol=1e-5)


def test_planar_sdf_matches_vector_sdf():
    """Planar forms used by the kernels == vector forms used everywhere."""
    rng = np.random.RandomState(7)
    pts = jnp.asarray(rng.randn(32, 3).astype(np.float32) * 3)
    cases = [
        (P.Sphere, {"center": jnp.asarray([0.5, -1.0, 2.0]),
                    "radius": jnp.float32(1.3)}),
        (P.Plane, {"normal": jnp.asarray([0.0, 1.0, 0.0]),
                   "offset": jnp.float32(2.0)}),
        (P.Box, {"center": jnp.asarray([1.0, 0.0, -1.0]),
                 "side": jnp.asarray([0.5, 1.5, 2.0])}),
        (P.Triangle, {"v1": jnp.asarray([0.0, 0.0, 0.0]),
                      "v2": jnp.asarray([2.0, 0.0, 0.0]),
                      "v3": jnp.asarray([0.0, 2.0, 0.0])}),
    ]
    for ptype, params in cases:
        ref = jax.vmap(lambda p: ptype.sdf(params, p))(pts)
        scal = {}
        for k, v in params.items():
            if v.ndim == 1:
                for i, ax in enumerate("xyz"):
                    scal[f"{k}_{ax}"] = v[i]
            else:
                scal[k] = v
        planar = ptype.sdf_planar(scal, pts[:, 0], pts[:, 1], pts[:, 2])
        np.testing.assert_allclose(planar, ref, rtol=1e-5, atol=1e-5,
                                   err_msg=ptype.name)


def test_geometry_kernel_parity(scene):
    """The fused geometry kernel vs the XLA components it replaces."""
    from madarch_tpu.scene.scene import (primitive_material_id,
                                         scene_sdf_info)

    spec, data, plan, packed, sdf_b = scene
    origins, dirs = rand_rays(96, seed=11)
    lpos, n_lights = M.pack_light_positions(spec, data)
    assert n_lights == 1
    spacing = (2.0, 3.0, 3.0)
    dims = (4, 3, 3)
    g = M.pallas_geometry(plan, packed, lpos, n_lights, origins, dirs,
                          20.0, probe_spacing=spacing, probe_dims=dims,
                          surface_offset=rm.SURFACE_OFFSET, ao_steps=3)

    # primary march + hit classification
    t_ref, hit_ref, pos_ref = rm.raycast(sdf_b, origins, dirs, 20.0)
    np.testing.assert_array_equal(np.asarray(g["hit"]), np.asarray(hit_ref))
    np.testing.assert_allclose(g["t"], t_ref, rtol=1e-5, atol=1e-5)

    pos = np.asarray(origins + g["t"][:, None] * dirs)
    _, idx_ref = jax.vmap(
        lambda p: scene_sdf_info(spec, data, p))(jnp.asarray(pos))
    idx_ref = jnp.where(g["hit"], idx_ref, -1)
    np.testing.assert_array_equal(np.asarray(g["idx"]), np.asarray(idx_ref))
    mid_ref = primitive_material_id(spec, data, jnp.maximum(g["idx"], 0))
    hits = np.asarray(g["hit"])
    np.testing.assert_array_equal(np.asarray(g["mid"])[hits],
                                  np.asarray(mid_ref)[hits])

    # FD normal vs autodiff-gradient normal (h=1e-3 tetrahedron)
    n_ref = np.asarray(rm.scene_normal(sdf_b, jnp.asarray(pos)))
    np.testing.assert_allclose(np.asarray(g["normal"])[hits], n_ref[hits],
                               atol=2e-2)

    # AO probes using the kernel's own normal
    ao_ref = rm.ambient_occlusion(sdf_b, jnp.asarray(pos), g["normal"])
    np.testing.assert_allclose(g["ao"], ao_ref, rtol=1e-5, atol=1e-5)

    # per-light penumbra march (slot 0)
    lp = jnp.asarray([0.0, 5.0, 3.0])
    to_l = lp - pos
    ldist = jnp.linalg.norm(to_l, axis=-1)
    ldir = to_l / ldist[:, None]
    ndotl = jnp.sum(g["normal"] * ldir, axis=-1)
    sh_on = g["hit"] & (ndotl > 1e-3)
    sh_ref = rm.softshadows(
        sdf_b, jnp.asarray(pos) + g["normal"] * rm.SURFACE_OFFSET, ldir,
        jnp.zeros(pos.shape[0]), ldist, 64.0, enabled=sh_on)
    on = np.asarray(sh_on)
    np.testing.assert_allclose(np.asarray(g["shadows"][0])[on],
                               np.asarray(sh_ref)[on], rtol=1e-4, atol=1e-4)

    # probe-visibility marches: corner 0 and corner 7
    sp = np.asarray(spacing, np.float32)
    dm = np.asarray(dims, np.int32)
    cell = np.floor(pos / sp)
    for k in (0, 7):
        off = np.asarray([(k >> 0) & 1, (k >> 1) & 1, (k >> 2) & 1],
                         np.float32)
        corner = np.clip(cell + off, 0.0, (dm - 1).astype(np.float32))
        world = corner * sp
        to_p = world - pos
        pdist = np.maximum(np.linalg.norm(to_p, axis=-1), 1e-6)
        vdir = to_p / pdist[:, None]
        v_ref = rm.raycast_visibility(
            sdf_b, jnp.asarray(pos) + g["normal"] * rm.SURFACE_OFFSET,
            jnp.asarray(vdir), jnp.asarray(pdist) - rm.SURFACE_OFFSET,
            enabled=g["hit"])
        np.testing.assert_allclose(np.asarray(g["vis8"][k])[hits],
                                   np.asarray(v_ref)[hits])


# ---------------------------------------------------------------------------
# Chunked layout (> UNROLL_SLOTS_MAX slots): the obj_mesh-scale path.
# ---------------------------------------------------------------------------

def build_chunked_scene(n_tris=80):
    """Triangle fan + floor plane: 80 triangles exceed the SMEM-rolled
    budget so the plan takes the chunked VMEM layout with bounding
    spheres (the obj_mesh-scale path)."""
    spec = SceneSpec(prims=((P.Triangle, n_tris), (P.Plane, 2)),
                     lights=((L.PointLight, 1),), max_dist=20.0)
    spec = spec.specialized({"triangle": n_tris, "plane": 1},
                            {"point_light": 1})
    assert n_tris > 64, "chunked coverage needs > SMEM_ROLLED_SLOTS_MAX"
    b = SceneBuilder(spec)
    b.add_material((0.5, 0.5, 0.5), 0.0, 0.5)
    rng = np.random.RandomState(3)
    for i in range(n_tris):
        c = rng.uniform(-2.0, 2.0, 3) + np.array([0.0, 1.5, 5.0])
        v = c + rng.uniform(-0.4, 0.4, (3, 3))
        b.add_primitive(P.Triangle, v1=v[0], v2=v[1], v3=v[2],
                        material_id=0)
    b.add_primitive(P.Plane, normal=(0.0, 1.0, 0.0), offset=1.0,
                    material_id=0)
    b.add_light(L.PointLight, position=(0.0, 5.0, 3.0), color=(1.0,) * 3)
    return spec, b.device_data()


@pytest.fixture(scope="module")
def chunked_scene():
    spec, data = build_chunked_scene()
    plan = M.build_plan(spec)
    assert plan is not None
    packed = M.pack_params(plan, data)
    sdf_b = jax.vmap(lambda p: scene_sdf(spec, data, p))
    return spec, data, plan, packed, sdf_b


def test_chunked_plan_layout(chunked_scene):
    spec, data, plan, packed, _ = chunked_scene
    kinds = {e.ptype.name: e.kind for e in plan.entries}
    assert kinds == {"triangle": "c", "plane": "u"}
    tri = next(e for e in plan.entries if e.ptype.name == "triangle")
    assert tri.sph_idx == 0 and tri.n_chunks == -(-80 // M.CHUNK)
    assert plan.margin == M.FAR_MARGIN
    assert len(packed.chunked) == 1 and len(packed.spheres) == 1
    # replicated rows: all lanes equal
    arr = np.asarray(packed.chunked[0])
    np.testing.assert_array_equal(arr[:, 0], arr[:, 63])
    # bounding AABBs contain their geometry (global: all vertices;
    # chunks: their slots' vertices)
    sph = np.asarray(packed.spheres[0])[:, 0].reshape(-1, 6)
    g, chunks = sph[0], sph[1:]
    verts = np.stack([np.asarray(data.prims["triangle"][k][:80])
                      for k in ("v1", "v2", "v3")], axis=1)  # [n,3,3]
    flat = verts.reshape(-1, 3)
    assert (flat >= g[:3] - 1e-4).all() and (flat <= g[3:] + 1e-4).all()
    for c in range(len(chunks)):
        vs = verts[c * M.CHUNK:(c + 1) * M.CHUNK].reshape(-1, 3)
        if len(vs) == 0:
            continue
        assert (vs >= chunks[c, :3] - 1e-4).all()
        assert (vs <= chunks[c, 3:] + 1e-4).all()


def test_chunked_raycast_parity(chunked_scene):
    """Hit flags equal; hit t within the margin-path tolerance; misses
    land at/after max_dist on both paths."""
    spec, data, plan, packed, sdf_b = chunked_scene
    origins, dirs = rand_rays(64, seed=21)
    t_ref, hit_ref, _ = rm.raycast(sdf_b, origins, dirs, 20.0)
    t_k, hit_k, _ = M.pallas_raycast(plan, packed, origins, dirs, 20.0)
    hit_ref = np.asarray(hit_ref)
    hit_k = np.asarray(hit_k)
    agree = hit_ref == hit_k
    assert agree.mean() >= 0.98, "hit flags diverged beyond grazing noise"
    both = hit_ref & hit_k
    np.testing.assert_allclose(np.asarray(t_k)[both],
                               np.asarray(t_ref)[both], atol=5e-3)
    miss = ~hit_ref & ~hit_k
    assert (np.asarray(t_k)[miss] >= 20.0 - 1e-3).all()


def test_chunked_visibility_parity(chunked_scene):
    spec, data, plan, packed, sdf_b = chunked_scene
    origins, dirs = rand_rays(64, seed=22)
    max_dists = jnp.full((64,), 10.0, jnp.float32)
    v_ref = np.asarray(rm.raycast_visibility(sdf_b, origins, dirs,
                                             max_dists))
    v_k = np.asarray(M.pallas_visibility(plan, packed, origins, dirs,
                                         max_dists))
    assert (v_ref == v_k).mean() >= 0.98


def test_chunked_geometry_smoke(chunked_scene):
    """Fused geometry kernel runs on a chunked scene and classifies hits
    with in-range indices/materials and unit normals."""
    spec, data, plan, packed, sdf_b = chunked_scene
    origins, dirs = rand_rays(32, seed=23)
    lpos, n_lights = M.pack_light_positions(spec, data)
    g = M.pallas_geometry(plan, packed, lpos, n_lights, origins, dirs,
                          20.0, probe_spacing=(2.0, 3.0, 3.0),
                          probe_dims=(4, 3, 3),
                          surface_offset=rm.SURFACE_OFFSET, ao_steps=3)
    hits = np.asarray(g["hit"])
    assert hits.any()
    idx = np.asarray(g["idx"])
    assert (idx[hits] >= 0).all() and (idx[hits] < 82).all()
    n = np.asarray(g["normal"])[hits]
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-3)
    assert np.isfinite(np.asarray(g["ao"])).all()
    assert np.asarray(g["shadows"]).shape == (1, 32)
    assert np.asarray(g["vis8"]).shape == (8, 32)


# ---------------------------------------------------------------------------
# SMEM-rolled layout ("s"): mid-size types (simple_scene's 20 spheres /
# 14 boxes) roll a fori_loop over SMEM scalars — one compiled scene body,
# near-unrolled runtime.
# ---------------------------------------------------------------------------

def build_rolled_scene():
    spec = SceneSpec(prims=((P.Sphere, 20), (P.Plane, 2)),
                     lights=((L.PointLight, 1),), max_dist=20.0)
    spec = spec.specialized({"sphere": 20, "plane": 1}, {"point_light": 1})
    b = SceneBuilder(spec)
    b.add_material((0.5, 0.5, 0.5), 0.0, 0.5)
    rng = np.random.RandomState(5)
    for i in range(20):
        c = rng.uniform(-3.0, 3.0, 3) + np.array([0.0, 1.5, 5.0])
        b.add_primitive(P.Sphere, center=c, radius=0.4,
                        material_id=0)
    b.add_primitive(P.Plane, normal=(0.0, 1.0, 0.0), offset=1.0,
                    material_id=0)
    b.add_light(L.PointLight, position=(0.0, 5.0, 3.0), color=(1.0,) * 3)
    return spec, b.device_data()


def test_smem_rolled_layout_and_parity():
    spec, data = build_rolled_scene()
    plan = M.build_plan(spec)
    kinds = {e.ptype.name: e.kind for e in plan.entries}
    assert kinds == {"sphere": "s", "plane": "u"}
    sph = next(e for e in plan.entries if e.ptype.name == "sphere")
    assert sph.smem_off >= 0 and plan.n_params >= 20 * len(sph.fields)
    packed = M.pack_params(plan, data)
    sdf_b = jax.vmap(lambda p: scene_sdf(spec, data, p))
    origins, dirs = rand_rays(64, seed=31)
    t_ref, hit_ref, _ = rm.raycast(sdf_b, origins, dirs, 20.0)
    t_k, hit_k, _ = M.pallas_raycast(plan, packed, origins, dirs, 20.0)
    assert (np.asarray(hit_ref) == np.asarray(hit_k)).mean() >= 0.98
    both = np.asarray(hit_ref) & np.asarray(hit_k)
    np.testing.assert_allclose(np.asarray(t_k)[both],
                               np.asarray(t_ref)[both], atol=5e-3)


def test_triangle_derived_planar_matches_plain():
    """sdf_planar_derived on derive() constants == sdf_planar on raw
    vertices, across random triangles and points."""
    rng = np.random.RandomState(13)
    verts = jnp.asarray(rng.randn(16, 3, 3).astype(np.float32) * 2)
    pts = rng.randn(64, 3).astype(np.float32) * 3
    px, py, pz = (jnp.asarray(pts[:, i]) for i in range(3))
    params = {"v1": verts[:, 0], "v2": verts[:, 1], "v3": verts[:, 2],
              "material_id": jnp.zeros((16,), jnp.int32)}
    der = P.Triangle.derive(params)
    for i in range(16):
        plain_s = {}
        for k in ("v1", "v2", "v3"):
            for j, ax in enumerate("xyz"):
                plain_s[f"{k}_{ax}"] = params[k][i, j]
        d_plain = P.Triangle.sdf_planar(plain_s, px, py, pz)
        der_s = {}
        for name, kind in P.Triangle.derived_fields:
            if kind == "vec3":
                for j, ax in enumerate("xyz"):
                    der_s[f"{name}_{ax}"] = der[name][i, j]
            else:
                der_s[name] = der[name][i]
        d_der = P.Triangle.sdf_planar_derived(der_s, px, py, pz)
        np.testing.assert_allclose(d_der, d_plain, rtol=1e-5, atol=1e-6)


def test_super_chunk_culling_parity():
    """A 200-triangle scene crosses SUPER_MIN: the two-level culling path
    (super admit/skip + chunk admit/skip) must agree with the XLA march."""
    spec, data = build_chunked_scene(n_tris=200)
    plan = M.build_plan(spec)
    tri = next(e for e in plan.entries if e.ptype.name == "triangle")
    assert tri.n_supers > 0, "scene must exercise the super level"
    packed = M.pack_params(plan, data)
    # super boxes contain their chunks' boxes
    rows = np.asarray(packed.spheres[0])[:, 0]
    n_sup = tri.n_supers
    sup = rows[6:6 + 6 * n_sup].reshape(n_sup, 6)
    chk = rows[6 + 6 * n_sup:].reshape(-1, 6)
    for si in range(n_sup):
        grp = chk[si * M.SUPER:(si + 1) * M.SUPER]
        real = grp[(grp[:, 0] <= grp[:, 3])]  # non-inert chunks
        if len(real) == 0:
            continue
        assert (real[:, :3] >= sup[si, :3] - 1e-4).all()
        assert (real[:, 3:] <= sup[si, 3:] + 1e-4).all()
    sdf_b = jax.vmap(lambda p: scene_sdf(spec, data, p))
    origins, dirs = rand_rays(64, seed=41)
    t_ref, hit_ref, _ = rm.raycast(sdf_b, origins, dirs, 20.0)
    t_k, hit_k, _ = M.pallas_raycast(plan, packed, origins, dirs, 20.0)
    assert (np.asarray(hit_ref) == np.asarray(hit_k)).mean() >= 0.98
    both = np.asarray(hit_ref) & np.asarray(hit_k)
    np.testing.assert_allclose(np.asarray(t_k)[both],
                               np.asarray(t_ref)[both], atol=5e-3)


def test_smem_rolled_culling_optin_parity(monkeypatch):
    """MADARCH_S_CULL=1 layout: rolled types gain chunk AABBs; marches
    stay ray-for-ray consistent with the XLA path."""
    monkeypatch.setattr(M, "S_CULL", True)
    spec, data = build_rolled_scene()
    plan = M.build_plan(spec)
    sph = next(e for e in plan.entries if e.ptype.name == "sphere")
    assert sph.kind == "s" and sph.sph_idx >= 0 and sph.n_chunks > 0
    packed = M.pack_params(plan, data)
    assert len(packed.spheres) == 1
    sdf_b = jax.vmap(lambda p: scene_sdf(spec, data, p))
    origins, dirs = rand_rays(64, seed=51)
    t_ref, hit_ref, _ = rm.raycast(sdf_b, origins, dirs, 20.0)
    t_k, hit_k, _ = M.pallas_raycast(plan, packed, origins, dirs, 20.0)
    assert (np.asarray(hit_ref) == np.asarray(hit_k)).mean() >= 0.98
    both = np.asarray(hit_ref) & np.asarray(hit_k)
    np.testing.assert_allclose(np.asarray(t_k)[both],
                               np.asarray(t_ref)[both], atol=5e-3)


@pytest.mark.parametrize("cull", [True, False])
def test_dynamic_count_rolled_parity(monkeypatch, cull):
    """Unspecialized spec (dynamic live counts) through the SMEM-rolled
    layout: slot masking by the runtime count must match the XLA path —
    the ball_game configuration (counts change without recompiling).
    With culling off the match is exact on every lane; with the default
    dense-corridor culling, hits and hit-lane t stay consistent."""
    monkeypatch.setattr(M, "S_CULL", cull)
    spec = SceneSpec(prims=((P.Sphere, 20), (P.Plane, 4)),
                     lights=((L.PointLight, 1),), max_dist=20.0)
    b = SceneBuilder(spec)
    b.add_material((0.5, 0.5, 0.5), 0.0, 0.5)
    rng = np.random.RandomState(9)
    for i in range(7):  # 7 live of 20 capacity
        b.add_primitive(P.Sphere,
                        center=rng.uniform(-2, 2, 3) + [0, 1.5, 5],
                        radius=0.5, material_id=0)
    b.add_primitive(P.Plane, normal=(0.0, 1.0, 0.0), offset=1.0,
                    material_id=0)
    b.add_light(L.PointLight, position=(0.0, 5.0, 3.0), color=(1.0,) * 3)
    data = b.device_data()
    plan = M.build_plan(spec)
    assert not plan.static_counts
    kinds = {e.ptype.name: e.kind for e in plan.entries}
    assert kinds["sphere"] == "s"
    packed = M.pack_params(plan, data)
    sdf_b = jax.vmap(lambda p: scene_sdf(spec, data, p))
    origins, dirs = rand_rays(64, seed=61)
    t_ref, hit_ref, _ = rm.raycast(sdf_b, origins, dirs, 20.0)
    t_k, hit_k, _ = M.pallas_raycast(plan, packed, origins, dirs, 20.0)
    np.testing.assert_array_equal(np.asarray(hit_k), np.asarray(hit_ref))
    if cull:
        both = np.asarray(hit_ref) & np.asarray(hit_k)
        np.testing.assert_allclose(np.asarray(t_k)[both],
                                   np.asarray(t_ref)[both], atol=5e-3)
    else:
        np.testing.assert_allclose(t_k, t_ref, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# All-bounded plans: the global-box exit clamp (_ray_box_cap).
# ---------------------------------------------------------------------------

def build_bounded_scene(n_tris=80):
    """Triangles ONLY (no plane): every entry bounded, so marches clamp
    their budget to the per-lane global-AABB exit."""
    spec = SceneSpec(prims=((P.Triangle, n_tris),),
                     lights=((L.PointLight, 1),), max_dist=20.0)
    spec = spec.specialized({"triangle": n_tris}, {"point_light": 1})
    b = SceneBuilder(spec)
    b.add_material((0.5, 0.5, 0.5), 0.0, 0.5)
    rng = np.random.RandomState(5)
    for i in range(n_tris):
        c = rng.uniform(-1.5, 1.5, 3) + np.array([0.0, 1.0, 5.0])
        v = c + rng.uniform(-0.5, 0.5, (3, 3))
        b.add_primitive(P.Triangle, v1=v[0], v2=v[1], v3=v[2],
                        material_id=0)
    b.add_light(L.PointLight, position=(0.0, 5.0, 3.0), color=(1.0,) * 3)
    return spec, b.device_data()


@pytest.fixture(scope="module")
def bounded_scene():
    spec, data = build_bounded_scene()
    plan = M.build_plan(spec)
    assert plan is not None and plan.all_bounded
    packed = M.pack_params(plan, data)
    sdf_b = jax.vmap(lambda p: scene_sdf(spec, data, p))
    return spec, data, plan, packed, sdf_b


def far_rays(n, seed=0):
    """Rays aimed at the triangle cloud from ~6 units out: the first
    over-relaxed step (omega * first-eval distance) overshoots the whole
    global box, so the clamp must NOT retire lanes before their Keinert
    backtrack (the round-5 obj_mesh zero-hit regression)."""
    rng = np.random.RandomState(seed)
    origins = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    origins[:, 2] -= 1.0
    targets = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32) \
        + np.array([0.0, 1.0, 5.0], np.float32)
    dirs = targets - origins
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    return jnp.asarray(origins), jnp.asarray(dirs)


def test_bounded_clamp_raycast_parity(bounded_scene):
    spec, data, plan, packed, sdf_b = bounded_scene
    origins, dirs = far_rays(128, seed=31)
    t_ref, hit_ref, _ = rm.raycast(sdf_b, origins, dirs, 20.0)
    t_k, hit_k, _ = M.pallas_raycast(plan, packed, origins, dirs, 20.0)
    hit_ref = np.asarray(hit_ref)
    hit_k = np.asarray(hit_k)
    assert hit_ref.sum() > 10, "fixture must actually produce hits"
    assert (hit_ref == hit_k).mean() >= 0.98
    both = hit_ref & hit_k
    np.testing.assert_allclose(np.asarray(t_k)[both],
                               np.asarray(t_ref)[both], atol=5e-3)
    # guaranteed misses (rays past the box) land at the miss convention
    miss = ~hit_ref & ~hit_k
    assert (np.asarray(t_k)[miss] >= 20.0 - 1e-3).all()


def test_bounded_clamp_visibility_parity(bounded_scene):
    spec, data, plan, packed, sdf_b = bounded_scene
    origins, dirs = far_rays(128, seed=32)
    max_dists = jnp.full((128,), 15.0, jnp.float32)
    v_ref = np.asarray(rm.raycast_visibility(sdf_b, origins, dirs,
                                             max_dists))
    v_k = np.asarray(M.pallas_visibility(plan, packed, origins, dirs,
                                         max_dists))
    assert (v_ref == 0.0).any() and (v_ref == 1.0).any()
    assert (v_ref == v_k).mean() >= 0.98


def test_bounded_clamp_geometry_hits(bounded_scene):
    """The fused geometry kernel on an all-bounded plan still classifies
    hits (idx/mid in range, unit normals) with the clamp active."""
    spec, data, plan, packed, sdf_b = bounded_scene
    origins, dirs = far_rays(64, seed=33)
    lpos, n_lights = M.pack_light_positions(spec, data)
    g = M.pallas_geometry(
        plan, packed, lpos, n_lights, origins, dirs, 20.0,
        probe_spacing=(2.0, 3.0, 3.0), probe_dims=(3, 3, 4),
        surface_offset=0.25, ao_steps=3)
    hits = np.asarray(g["hit"])
    assert hits.any()
    idx = np.asarray(g["idx"])
    assert (idx[hits] >= 0).all() and (idx[hits] < 80).all()
    n = np.asarray(g["normal"])[hits]
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-3)


@pytest.mark.parametrize("knob", ["SEG_CAND", "SEG_DENSE"])
def test_seg_cand_optin_parity(monkeypatch, knob):
    """MADARCH_SEG_CAND=1 / MADARCH_SEG_DENSE=1: marches cull through
    per-march segment candidate lists (SMEM scratch) — with a per-step
    cond over candidates, or fully dense corridor evals — instead of the
    per-step super/chunk ladder; results stay ray-for-ray consistent
    with the XLA path (both measured slower than the ladder on v5e
    obj_mesh: 200 / 380 ms vs 169 — kept as measured-off knobs)."""
    monkeypatch.setattr(M, knob, True)
    spec, data = build_bounded_scene()
    plan = M.build_plan(spec)
    packed = M.pack_params(plan, data)
    sdf_b = jax.vmap(lambda p: scene_sdf(spec, data, p))
    origins, dirs = far_rays(128, seed=61)
    t_ref, hit_ref, _ = rm.raycast(sdf_b, origins, dirs, 20.0)
    t_k, hit_k, _ = M.pallas_raycast(plan, packed, origins, dirs, 20.0)
    hit_ref = np.asarray(hit_ref)
    hit_k = np.asarray(hit_k)
    assert hit_ref.sum() > 10
    assert (hit_ref == hit_k).mean() >= 0.98
    both = hit_ref & hit_k
    np.testing.assert_allclose(np.asarray(t_k)[both],
                               np.asarray(t_ref)[both], atol=5e-3)
