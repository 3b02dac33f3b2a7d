"""Tests for profiling and checkpoint utilities."""
import os

import jax.numpy as jnp
import numpy as np

from madarch_tpu.core.config import (NO_VOLUMETRICS, ProbeSettings,
                                     VolumetricsSettings,
                                     screen_shade_config)
from madarch_tpu.utils import checkpoint, profiling


def test_frame_timer():
    t = profiling.FrameTimer()
    dt, out = t.time_fn(lambda x: x * 2.0, jnp.ones((64, 64)), iters=2)
    assert dt > 0
    np.testing.assert_allclose(out, 2.0)


def test_rays_per_frame_accounting():
    cfg = screen_shade_config(False)
    probes = ProbeSettings()
    n = profiling.rays_per_frame(800, 800, probes, 1, cfg)
    # screen: 23/pixel (1+1+8+3 + 1+8 + 1); probes: 36·1024·10
    assert n == 800 * 800 * 23 + 36 * 1024 * 10

    vol = VolumetricsSettings()
    n2 = profiling.rays_per_frame(800, 800, probes, 1, cfg, vol)
    assert n2 == n + 100 * 100 * 100 + 250 * 250


def test_checkpoint_roundtrip(tmp_path):
    from madarch_tpu.examples.scenes import global_illumination
    from madarch_tpu.render.pipeline import initial_state

    probes = ProbeSettings(radiance_resolution=8, irradiance_resolution=4,
                           probe_count=(4, 2), grid_dimensions=(2, 2, 2),
                           grid_spacing=(4.0, 4.0, 4.0))
    r = global_illumination(width=8, height=8, probes=probes)
    data = r.scene_data
    state = initial_state(probes, NO_VOLUMETRICS)
    state.radiance = state.radiance + 0.5

    path = os.path.join(tmp_path, "ckpt.npz")
    checkpoint.save(path, scene=data, state=state)

    restored = checkpoint.load(path, scene=r.spec.empty_data(),
                               state=initial_state(probes, NO_VOLUMETRICS))
    np.testing.assert_allclose(
        np.asarray(restored["scene"].prims["sphere"]["center"]),
        np.asarray(data.prims["sphere"]["center"]))
    np.testing.assert_allclose(np.asarray(restored["state"].radiance), 0.5)
    assert int(restored["scene"].prim_counts["plane"]) == 6
