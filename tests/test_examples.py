"""End-to-end smoke tests: every reference example scene renders a finite
frame at tiny resolution, and the ball_game physics loop runs.

These are the framework's integration tests — the reference's examples were
its only tests (SURVEY.md §4); here each one renders headlessly and is
checked for finiteness and basic structure.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madarch_tpu.core.config import (ProbeSettings, ShadeConfig,
                                     VolumetricsSettings,
                                     screen_shade_config)
from madarch_tpu.examples import scenes

TINY_PROBES = ProbeSettings(radiance_resolution=8, irradiance_resolution=4,
                            probe_count=(4, 2), grid_dimensions=(2, 2, 2),
                            grid_spacing=(4.0, 4.0, 4.0))
FAST_CFG = screen_shade_config(False, max_march_steps=48)


def check_image(img, w, h):
    arr = np.asarray(img)
    assert arr.shape == (h, w, 3)
    assert np.all(np.isfinite(arr))
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    assert arr.std() > 1e-4  # not a constant image


def test_simple_scene():
    r = scenes.simple_scene(width=24, height=24, probes=TINY_PROBES)
    r.screen_cfg = FAST_CFG
    check_image(r.render(), 24, 24)


def test_global_illumination_feedback():
    # time=0: the spot cone hits the blue wall (colored albedo), so probe
    # radiance is nonzero and the feedback is observable.  (At times where
    # the cone only hits black-albedo walls, GI is legitimately zero.)
    r = scenes.global_illumination(width=24, height=24, probes=TINY_PROBES,
                                   time=0.0)
    r.screen_cfg = FAST_CFG
    img1 = r.render()
    img2 = r.render()
    check_image(img2, 24, 24)
    # the GI feedback accumulates: second frame differs from first
    assert not np.allclose(np.asarray(img1), np.asarray(img2))


def test_light_shafts_volumetrics():
    vol = VolumetricsSettings(enabled=True,
                              visibility_resolution=(8, 8, 8),
                              visibility_step_size=0.5,
                              scattering_resolution=(12, 12),
                              scattering_step_size=0.5)
    r = scenes.light_shafts(width=24, height=24, probes=TINY_PROBES,
                            volumetrics=vol)
    r.screen_cfg = screen_shade_config(True, max_march_steps=48)
    img = r.render()
    check_image(img, 24, 24)
    assert r.state.scattering.shape == (12, 12, 4)
    assert bool(jnp.all(jnp.isfinite(r.state.scattering)))


def test_obj_mesh_grid():
    r = scenes.obj_mesh(width=16, height=16, probes=TINY_PROBES,
                        triangle_capacity=1000)
    r.screen_cfg = ShadeConfig(direct_specular=True,
                               indirect_specular_mode=0,
                               add_indirect_specular=False,
                               ambient_occlusion_steps=0,
                               render_volumetrics=False, max_march_steps=48)
    assert r.scene_data.grid is not None
    check_image(r.render(), 16, 16)


def test_bvh_scene():
    r = scenes.bvh_test(width=16, height=16, probes=TINY_PROBES,
                        n_spheres=8)
    r.screen_cfg = FAST_CFG
    check_image(r.render(), 16, 16)


def test_ball_game_physics():
    r, step_physics, throw_ball = scenes.ball_game(width=16, height=16,
                                                   probes=TINY_PROBES)
    r.screen_cfg = FAST_CFG
    throw_ball(origin=(2.0, 3.0, 2.0), velocity=(0.0, 0.0, 1.0))
    ys = []
    for _ in range(60):
        step_physics(dt=0.05)
        ys.append(float(r.builder._prims["sphere"]["center"][0, 1]))
    # ball fell under gravity and bounced off the floor (y=-1) at least once
    assert min(ys) > -1.05
    went_down = any(ys[i + 1] < ys[i] for i in range(len(ys) - 1))
    went_up = any(ys[i + 1] > ys[i] + 1e-4 for i in range(20, len(ys) - 1))
    assert went_down and went_up
    check_image(r.render(), 16, 16)
