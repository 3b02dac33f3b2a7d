"""core/resample: dense static-map resampling == jnp.take semantics."""
import numpy as np
import jax.numpy as jnp

from madarch_tpu.core.resample import (floor_map, resample_axis,
                                       shift_clamped, take_static)


def test_take_static_periodic_upsample():
    x = np.arange(250 * 7, dtype=np.float32).reshape(250, 7)
    idx = floor_map(800, 250)
    out = np.asarray(take_static(jnp.asarray(x), idx, axis=0))
    np.testing.assert_array_equal(out, x[idx])


def test_take_static_periodic_downsample():
    x = np.arange(100 * 3, dtype=np.float32).reshape(100, 3)
    idx = floor_map(250, 100, offset=0.0)
    out = np.asarray(take_static(jnp.asarray(x), idx, axis=0))
    np.testing.assert_array_equal(out, x[idx])


def test_take_static_aperiodic_falls_back():
    x = np.arange(40, dtype=np.float32)
    idx = np.array([0, 5, 1, 17, 3, 3, 39, 2])
    out = np.asarray(take_static(jnp.asarray(x), idx, axis=0))
    np.testing.assert_array_equal(out, x[idx])


def test_take_static_inner_axis():
    x = np.arange(6 * 100, dtype=np.float32).reshape(6, 100)
    idx = floor_map(250, 100, offset=0.0)
    out = np.asarray(take_static(jnp.asarray(x), idx, axis=1))
    np.testing.assert_array_equal(out, x[:, idx])


def test_resample_axis_identity():
    x = jnp.arange(16.0).reshape(4, 4)
    assert resample_axis(x, 0, 4) is x


def test_shift_clamped_matches_clip_indexing():
    x = np.arange(10 * 3, dtype=np.float32).reshape(10, 3)
    for d in (-2, -1, 0, 1, 2):
        ref = x[np.clip(np.arange(10) + d, 0, 9)]
        out = np.asarray(shift_clamped(jnp.asarray(x), 0, d))
        np.testing.assert_array_equal(out, ref, err_msg=f"delta={d}")


def test_composite_matches_gather_reference():
    """New dense composite == the original per-pixel gather formulation."""
    from madarch_tpu.core.config import VolumetricsSettings
    from madarch_tpu.render.volumetrics import TAU_SCATTERING, composite
    from madarch_tpu.render.camera import pixel_grid

    vol = VolumetricsSettings(scattering_resolution=(25, 25))
    rng = np.random.RandomState(0)
    H = W = 33
    scattering = rng.rand(25, 25, 4).astype(np.float32) * 5.0
    color = rng.rand(H * W, 3).astype(np.float32)
    ray_len = (rng.rand(H * W).astype(np.float32)) * 10.0
    max_dist = 20.0

    got = np.asarray(composite(vol, jnp.asarray(scattering),
                               jnp.asarray(color), jnp.asarray(ray_len),
                               W, H, max_dist))

    # original formulation
    frag = np.asarray(pixel_grid(W, H)).reshape(-1, 2)
    tex = (frag + 1.0) * 0.5
    ix = np.round(tex[:, 0] * 25 - 0.5).astype(int)
    iy = np.round(tex[:, 1] * 25 - 0.5).astype(int)
    closest = np.full(H * W, max_dist, np.float32)
    fog = np.zeros((H * W, 3), np.float32)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            datum = scattering[np.clip(iy + dy, 0, 24),
                               np.clip(ix + dx, 0, 24)]
            dist = np.abs(datum[:, 3] - ray_len)
            better = dist < closest
            fog = np.where(better[:, None], datum[:, :3], fog)
            closest = np.minimum(closest, dist)
    ref = color * np.exp(-ray_len * TAU_SCATTERING)[:, None] + fog
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)
