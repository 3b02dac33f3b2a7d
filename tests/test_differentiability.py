"""End-to-end pixel-gradient tests: dL/d(scene param) through the renderer.

The north-star check (BASELINE.md): pixel gradients w.r.t. primitive,
material, and light parameters, validated against finite differences — the
autodiff replacement for the reference's symbolic derivative layer.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madarch_tpu.core.config import (NO_VOLUMETRICS, ProbeSettings,
                                     ShadeConfig)
from madarch_tpu.render.pipeline import Camera, initial_state, \
    render_frame_impl
from madarch_tpu.scene import lights as L
from madarch_tpu.scene import primitives as P
from madarch_tpu.scene.scene import SceneBuilder, SceneSpec

PROBES = ProbeSettings(radiance_resolution=4, irradiance_resolution=2,
                       probe_count=(2, 1), grid_dimensions=(2, 1, 1),
                       grid_spacing=(4.0, 4.0, 4.0))
CFG = ShadeConfig(direct_specular=True, indirect_specular_mode=0,
                  add_indirect_specular=False, ambient_occlusion_steps=0,
                  render_volumetrics=False, max_march_steps=64,
                  differentiable=True)
W = H = 16


def build():
    spec = SceneSpec(prims=((P.Sphere, 2), (P.Plane, 2)),
                     lights=((L.PointLight, 1),))
    b = SceneBuilder(spec)
    b.add_material((0.8, 0.4, 0.2), 0.0, 0.5)
    b.add_primitive(P.Sphere, center=(0.0, 0.0, 4.0), radius=1.0,
                    material_id=0)
    b.add_primitive(P.Plane, normal=(0.0, 1.0, 0.0), offset=2.0,
                    material_id=0)
    b.add_light(L.PointLight, position=(1.0, 4.0, 1.0),
                color=(0.9, 0.9, 0.9))
    return spec, b.device_data()


SPEC, DATA = build()


def render_loss(data, cam_z=jnp.float32(0.0), interior_only=False):
    cam = Camera(position=jnp.stack([jnp.float32(0.0), jnp.float32(0.0),
                                     cam_z]),
                 orientation=jnp.eye(3, dtype=jnp.float32))
    state = initial_state(PROBES, NO_VOLUMETRICS)
    img, _ = render_frame_impl(SPEC, PROBES, NO_VOLUMETRICS, W, H, data,
                               cam, state, screen_cfg=CFG, probe_cfg=CFG)
    if interior_only:
        # central pixels, strictly inside the sphere silhouette: autodiff
        # captures hit-point motion + shading but not the silhouette
        # (occlusion-boundary) term, so geometry-parameter checks must
        # exclude edge pixels (classic differentiable-rendering caveat).
        c = W // 2
        img = img[c - 2:c + 2, c - 2:c + 2]
    return jnp.mean(img)


def _set(data, path, value):
    d = dataclasses.replace(data)
    if path[0] == "prims":
        d.prims = dict(d.prims)
        d.prims[path[1]] = dict(d.prims[path[1]])
        d.prims[path[1]][path[2]] = value
    elif path[0] == "lights":
        d.lights = dict(d.lights)
        d.lights[path[1]] = dict(d.lights[path[1]])
        d.lights[path[1]][path[2]] = value
    elif path[0] == "materials":
        d.materials = dict(d.materials)
        d.materials[path[1]] = value
    return d


def _fd_check(loss_of, value, eps, rtol):
    loss_of = jax.jit(loss_of)
    g = jax.grad(loss_of)(jnp.float32(value))
    fd = (loss_of(jnp.float32(value + eps))
          - loss_of(jnp.float32(value - eps))) / (2 * eps)
    assert np.isfinite(g), "gradient is not finite"
    assert np.abs(fd) > 1e-7, "finite difference is degenerate"
    np.testing.assert_allclose(g, fd, rtol=rtol)
    return g


def test_grad_wrt_sphere_radius():
    def loss_of(v):
        radius = DATA.prims["sphere"]["radius"].at[0].set(v)
        return render_loss(_set(DATA, ("prims", "sphere", "radius"), radius),
                           interior_only=True)

    _fd_check(loss_of, 1.0, 2e-3, 0.25)


def test_grad_wrt_albedo():
    def loss_of(v):
        albedo = DATA.materials["albedo"].at[0, 0].set(v)
        return render_loss(_set(DATA, ("materials", "albedo"), albedo))

    _fd_check(loss_of, 0.8, 1e-3, 0.05)


def test_grad_wrt_light_height():
    def loss_of(v):
        pos = DATA.lights["point_light"]["position"].at[0, 1].set(v)
        return render_loss(
            _set(DATA, ("lights", "point_light", "position"), pos))

    _fd_check(loss_of, 4.0, 2e-3, 0.15)


def test_grad_wrt_camera_position():
    def loss_of(v):
        return render_loss(DATA, cam_z=v)

    _fd_check(loss_of, -0.5, 2e-3, 0.2)
