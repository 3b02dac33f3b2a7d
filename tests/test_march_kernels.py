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
    vec, counts = M.pack_params(plan, data)
    sdf_b = jax.vmap(lambda p: scene_sdf(spec, data, p))
    return spec, data, plan, vec, counts, sdf_b


def test_plan_layout(scene):
    spec, data, plan, vec, counts, _ = scene
    assert plan.total_capacity == 14
    np.testing.assert_array_equal(np.asarray(counts).ravel(), [2, 1, 1])
    # sphere center_x of slot 0 is the first packed scalar
    assert float(vec[0, 0]) == 0.0
    # radius block: after center_x/y/z (3*4 values)
    assert np.isclose(float(vec[12, 0]), 1.0)
    assert np.isclose(float(vec[13, 0]), 0.7)


def test_raycast_parity(scene):
    spec, data, plan, vec, counts, sdf_b = scene
    origins, dirs = rand_rays(64)
    t_ref, hit_ref, pos_ref = rm.raycast(sdf_b, origins, dirs, 20.0)
    t_k, hit_k, pos_k = M.pallas_raycast(plan, vec, counts, origins, dirs,
                                         20.0)
    np.testing.assert_array_equal(np.asarray(hit_k), np.asarray(hit_ref))
    np.testing.assert_allclose(t_k, t_ref, rtol=1e-5, atol=1e-5)


def test_raycast_parity_enabled_mask(scene):
    spec, data, plan, vec, counts, sdf_b = scene
    origins, dirs = rand_rays(32, seed=3)
    enabled = jnp.asarray(np.random.RandomState(4).rand(32) > 0.5)
    t_ref, hit_ref, _ = rm.raycast(sdf_b, origins, dirs, 20.0,
                                   enabled=enabled)
    t_k, hit_k, _ = M.pallas_raycast(plan, vec, counts, origins, dirs, 20.0,
                                     enabled=enabled)
    np.testing.assert_array_equal(np.asarray(hit_k), np.asarray(hit_ref))
    np.testing.assert_allclose(t_k, t_ref, rtol=1e-5, atol=1e-5)


def test_visibility_parity(scene):
    spec, data, plan, vec, counts, sdf_b = scene
    origins, dirs = rand_rays(64, seed=1)
    max_dists = jnp.asarray(
        np.random.RandomState(2).uniform(0.5, 10.0, 64), jnp.float32)
    v_ref = rm.raycast_visibility(sdf_b, origins, dirs, max_dists)
    v_k = M.pallas_visibility(plan, vec, counts, origins, dirs, max_dists)
    np.testing.assert_allclose(v_k, v_ref)


def test_softshadows_parity(scene):
    spec, data, plan, vec, counts, sdf_b = scene
    origins, dirs = rand_rays(64, seed=5)
    max_dists = jnp.full((64,), 12.0, jnp.float32)
    s_ref = rm.softshadows(sdf_b, origins, dirs, jnp.zeros(64), max_dists,
                           64.0)
    s_k = M.pallas_softshadows(plan, vec, counts, origins, dirs,
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
