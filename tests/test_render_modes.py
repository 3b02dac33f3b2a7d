"""Tests for alternate render modes: direct-only, MC one-bounce, path
tracer, and indirect-specular modes 1/3."""
import jax
import jax.numpy as jnp
import numpy as np

from madarch_tpu.core.config import (NO_VOLUMETRICS, ProbeSettings,
                                     ShadeConfig)
from madarch_tpu.render import pathtrace
from madarch_tpu.render.camera import camera_rays, pixel_grid
from madarch_tpu.render.pipeline import Camera, initial_state, \
    render_frame_impl
from madarch_tpu.scene import lights as L
from madarch_tpu.scene import primitives as P
from madarch_tpu.scene.scene import SceneBuilder, SceneSpec

PROBES = ProbeSettings(radiance_resolution=8, irradiance_resolution=4,
                       probe_count=(4, 2), grid_dimensions=(2, 2, 2),
                       grid_spacing=(4.0, 4.0, 4.0))
W = H = 12


def build():
    spec = SceneSpec(prims=((P.Sphere, 2), (P.Plane, 2)),
                     lights=((L.PointLight, 1),))
    b = SceneBuilder(spec)
    b.add_material((0.8, 0.4, 0.2), 0.1, 0.5)
    b.add_primitive(P.Sphere, center=(0.0, 0.0, 4.0), radius=1.0,
                    material_id=0)
    b.add_primitive(P.Plane, normal=(0.0, 1.0, 0.0), offset=2.0,
                    material_id=0)
    b.add_light(L.PointLight, position=(1.0, 4.0, 1.0),
                color=(0.9, 0.9, 0.9))
    return spec, b.device_data()


def rays():
    frag = pixel_grid(W, H)
    o, d = camera_rays(frag, jnp.zeros(3), jnp.eye(3))
    return o.reshape(-1, 3), d.reshape(-1, 3)


def _finite(x):
    assert bool(jnp.all(jnp.isfinite(x)))
    return np.asarray(x)


def test_pixel_color_direct():
    spec, data = build()
    o, d = rays()
    out = jax.jit(lambda data: pathtrace.pixel_color_direct(
        spec, data, o, d, max_steps=48))(data)
    arr = _finite(out)
    # sky components can be slightly negative pre-tonemap (reference
    # behavior: 0.30 - 0.7·dir.y clamps only at the tonemap)
    assert arr.min() > -0.5
    assert arr.std() > 1e-4


def test_pixel_color_many():
    spec, data = build()
    o, d = rays()
    key = jax.random.PRNGKey(0)
    out = jax.jit(lambda data, key: pathtrace.pixel_color_many(
        spec, data, o, d, key, gi_samples=4, max_steps=32))(data, key)
    arr = _finite(out)
    # MC GI adds energy over the direct-only image
    direct = np.asarray(pathtrace.pixel_color_direct(
        spec, data, o, d, ao_steps=0, max_steps=32))
    assert arr.sum() >= direct.sum() - 1e-3


def test_pixel_color_path():
    spec, data = build()
    o, d = rays()
    key = jax.random.PRNGKey(1)
    out = jax.jit(lambda data, key: pathtrace.pixel_color_path(
        spec, data, o, d, key, gi_bounces=2, max_steps=32))(data, key)
    _finite(out)


def test_sampling_distributions():
    from madarch_tpu.render import sampling
    key = jax.random.PRNGKey(2)
    v = sampling.random_sphere_point(key, (2048,))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0,
                               atol=1e-5)
    assert np.abs(np.asarray(v).mean(axis=0)).max() < 0.1  # centered

    n = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (2048, 1))
    h = sampling.random_hemisphere_point(key, n)
    assert np.all(np.asarray(h)[:, 1] >= 0.0)

    c = sampling.cosine_direction(key, n)
    arr = np.asarray(c)
    assert np.all(arr[:, 1] >= -1e-5)
    # cosine weighting biases toward the normal: mean y well above uniform
    assert arr[:, 1].mean() > 0.6


def test_indirect_specular_modes_1_and_3():
    spec, data = build()
    state = initial_state(PROBES, NO_VOLUMETRICS)
    cam = Camera(position=jnp.zeros(3), orientation=jnp.eye(3))
    for mode in (1, 3):
        cfg = ShadeConfig(direct_specular=True, indirect_specular_mode=mode,
                          add_indirect_specular=False,
                          ambient_occlusion_steps=0,
                          render_volumetrics=False, max_march_steps=32)
        img, _ = jax.jit(lambda d, c, s, cfg=cfg: render_frame_impl(
            spec, PROBES, NO_VOLUMETRICS, W, H, d, c, s, screen_cfg=cfg,
            probe_cfg=cfg))(data, cam, state)
        _finite(img)
