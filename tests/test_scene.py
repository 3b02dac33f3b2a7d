"""Tests for the scene layer: masked dispatch, indices, lights, builder."""
import jax
import jax.numpy as jnp
import numpy as np

from madarch_tpu.scene import primitives as P
from madarch_tpu.scene import lights as L
from madarch_tpu.scene.scene import (SceneSpec, SceneBuilder, scene_sdf,
                                     scene_sdf_info, primitive_info,
                                     sample_light, material_lookup)


def make_spec():
    return SceneSpec(
        prims=((P.Sphere, 4), (P.Plane, 4), (P.Box, 4)),
        lights=((L.PointLight, 2), (L.SpotLight, 2)),
        max_dist=20.0,
    )


def make_scene():
    spec = make_spec()
    b = SceneBuilder(spec)
    b.add_material(albedo=(1.0, 0.0, 0.0), metallic=0.0, roughness=0.6)
    b.add_material(albedo=(0.1, 0.1, 0.1), metallic=0.9, roughness=0.1)
    b.add_primitive(P.Sphere, center=(0.0, 0.0, 5.0), radius=1.0,
                    material_id=1)
    b.add_primitive(P.Plane, normal=(0.0, 1.0, 0.0), offset=1.0,
                    material_id=0)
    b.add_primitive(P.Box, center=(3.0, 0.0, 5.0), side=(1.0, 1.0, 1.0),
                    material_id=0)
    b.add_light(L.PointLight, position=(0.0, 3.0, 0.0),
                color=(0.9, 0.9, 0.9))
    b.add_light(L.SpotLight, position=(3.5, 5.0, 2.0),
                direction=(1.0, 0.0, 0.0), aperture=np.pi / 4,
                color=(0.9, 0.9, 0.8))
    return spec, b.device_data()


def test_scene_sdf_min_over_live_primitives():
    spec, data = make_scene()
    p = jnp.asarray([0.0, 0.0, 3.0], jnp.float32)
    # sphere at dist 1.0, plane at dist 1.0, box at ~sqrt(9+4)-ish further
    assert np.isclose(scene_sdf(spec, data, p), 1.0, atol=1e-5)
    # point near the plane only
    p2 = jnp.asarray([-5.0, -0.5, -5.0], jnp.float32)
    assert np.isclose(scene_sdf(spec, data, p2), 0.5, atol=1e-5)


def test_empty_slots_do_not_contribute():
    spec, data = make_scene()
    # empty sphere slots are zero-initialized (center 0, radius 0) => would
    # report dist ~|p| if not masked.
    p = jnp.asarray([0.0, 0.2, 0.0], jnp.float32)
    d = scene_sdf(spec, data, p)
    # plane (y=-1) at dist 1.2, not the phantom sphere at dist 0.2
    assert np.isclose(d, 1.2, atol=1e-5)


def test_sdf_info_returns_global_index():
    spec, data = make_scene()
    # closest = sphere (index 0 in sphere block at offset 0)
    p = jnp.asarray([0.0, 0.3, 4.5], jnp.float32)
    dist, idx = scene_sdf_info(spec, data, p)
    assert int(idx) == 0
    # closest = plane: global index = sphere capacity (4) + 0
    p = jnp.asarray([-5.0, -0.9, -5.0], jnp.float32)
    dist, idx = scene_sdf_info(spec, data, p)
    assert int(idx) == 4
    # closest = box: offset 8
    p = jnp.asarray([3.0, 0.0, 6.5], jnp.float32)
    dist, idx = scene_sdf_info(spec, data, p)
    assert int(idx) == 8


def test_primitive_info_normal_and_material():
    spec, data = make_scene()
    p = jnp.asarray([0.0, 0.0, 4.0], jnp.float32)
    n, mid = primitive_info(spec, data, jnp.int32(0), p)
    np.testing.assert_allclose(n, [0.0, 0.0, -1.0], atol=1e-5)
    assert int(mid) == 1
    n, mid = primitive_info(spec, data, jnp.int32(4), p)
    np.testing.assert_allclose(n, [0.0, 1.0, 0.0], atol=1e-5)
    assert int(mid) == 0


def test_sample_light_dispatch():
    spec, data = make_scene()
    p = jnp.asarray([0.0, 0.0, 0.0], jnp.float32)
    n = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    rad, ldir, ldist = sample_light(spec, data, jnp.int32(0), p, n)
    np.testing.assert_allclose(ldir, [0.0, 1.0, 0.0], atol=1e-6)
    assert np.isclose(ldist, 3.0, atol=1e-6)
    # point light radiance = color / (d^2 * 0.03)
    np.testing.assert_allclose(rad, np.array([0.9] * 3) / (9.0 * 0.03),
                               rtol=1e-5)
    # index 1 -> spot light (count-based offset: 1 point light)
    rad2, ldir2, ldist2 = sample_light(spec, data, jnp.int32(1), p, n)
    expected_dist = np.linalg.norm([3.5, 5.0, 2.0])
    assert np.isclose(ldist2, expected_dist, rtol=1e-5)


def test_sample_light_passes_surface_normal_through():
    # A user light whose radiance depends on the surface normal: catches the
    # loop-bound shadowing of the ``n`` argument (round-1 defect).
    normal_lit = L.make_light(
        "normal_lit",
        fields=(("position", P.VEC3), ("color", P.VEC3)),
        sample=lambda params, pos, normal: (
            params["color"] * vm_dot(normal, normal),  # needs a real vec3
            (params["position"] - pos)
            / jnp.linalg.norm(params["position"] - pos),
            jnp.linalg.norm(params["position"] - pos)),
        position=lambda params: params["position"])
    spec = SceneSpec(prims=((P.Sphere, 2),), lights=((normal_lit, 2),))
    b = SceneBuilder(spec)
    b.add_light(normal_lit, position=(0.0, 3.0, 0.0), color=(1.0, 1.0, 1.0))
    data = b.device_data()
    p = jnp.zeros((3,), jnp.float32)
    n = jnp.asarray([0.0, 1.0, 0.0], jnp.float32)
    rad, _, _ = sample_light(spec, data, jnp.int32(0), p, n)
    np.testing.assert_allclose(rad, [1.0, 1.0, 1.0], atol=1e-6)


def vm_dot(a, b):
    return jnp.sum(a * b, axis=-1, keepdims=True)


def test_add_light_capacity_check():
    spec = make_spec()
    b = SceneBuilder(spec)
    b.add_light(L.PointLight, position=(0, 1, 0), color=(1, 1, 1))
    b.add_light(L.PointLight, position=(0, 2, 0), color=(1, 1, 1))
    try:
        b.add_light(L.PointLight, position=(0, 3, 0), color=(1, 1, 1))
        assert False, "expected capacity error"
    except ValueError as e:
        assert "capacity" in str(e)


def test_set_material_bounds_check():
    spec = make_spec()
    b = SceneBuilder(spec)
    for bad in (-1, spec.max_materials):
        try:
            b.set_material(bad, (1, 0, 0), 0.0, 0.5)
            assert False, "expected bounds error"
        except ValueError as e:
            assert "out of range" in str(e)


def test_material_lookup():
    spec, data = make_scene()
    albedo, metallic, roughness = material_lookup(data, jnp.int32(1))
    np.testing.assert_allclose(albedo, [0.1, 0.1, 0.1], atol=1e-6)
    assert np.isclose(metallic, 0.9)


def test_scene_queries_jit_and_vmap():
    spec, data = make_scene()
    pts = jnp.asarray(np.random.RandomState(1).randn(128, 3) * 3,
                      jnp.float32)
    f = jax.jit(jax.vmap(lambda p: scene_sdf(spec, data, p)))
    eager = jax.vmap(lambda p: scene_sdf(spec, data, p))(pts)
    np.testing.assert_allclose(f(pts), eager, rtol=1e-6, atol=1e-6)


def test_scene_sdf_grad_flows_to_params():
    spec, data = make_scene()
    p = jnp.asarray([0.0, 0.0, 3.5], jnp.float32)

    def loss(radius):
        d2 = jax.tree.map(lambda x: x, data)
        d2.prims["sphere"]["radius"] = \
            d2.prims["sphere"]["radius"].at[0].set(radius)
        return scene_sdf(spec, d2, p)

    g = jax.grad(loss)(jnp.float32(1.0))
    assert np.isclose(g, -1.0, atol=1e-5)  # d(dist)/d(radius) = -1 at sphere
