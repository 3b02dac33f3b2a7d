"""Tests for octahedral mapping, probe addressing, irradiance integration."""
import jax
import jax.numpy as jnp
import numpy as np

from madarch_tpu.core.config import ProbeSettings
from madarch_tpu.render import probes as pb


SETTINGS = ProbeSettings(radiance_resolution=8, irradiance_resolution=4,
                         probe_count=(4, 2), grid_dimensions=(2, 2, 2),
                         grid_spacing=(2.0, 3.0, 3.0))


def test_octahedral_roundtrip():
    rng = np.random.RandomState(0)
    v = rng.randn(256, 3).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    v = jnp.asarray(v)
    back = pb.oct_to_dir(pb.dir_to_oct(v))
    np.testing.assert_allclose(back, v, atol=1e-5)


def test_texel_directions_unit_and_distinct():
    dirs = np.asarray(pb.texel_directions(8))
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=1), 1.0, atol=1e-5)
    # octahedral texel grid covers both hemispheres
    assert (dirs[:, 2] > 0).any() and (dirs[:, 2] < 0).any()


def test_probe_id_grid_roundtrip():
    pid = jnp.arange(SETTINGS.num_probes)
    gp = pb.probe_id_to_grid_position(SETTINGS, pid)
    back = pb.grid_position_to_probe_id(SETTINGS, gp)
    np.testing.assert_array_equal(back, pid)


def test_probe_world_positions():
    pos = np.asarray(pb.probe_world_positions(SETTINGS))
    np.testing.assert_allclose(pos[0], [0.0, 0.0, 0.0])
    # probe id 1 = grid (1,0,0) -> (2,0,0) with spacing (2,3,3)
    np.testing.assert_allclose(pos[1], [2.0, 0.0, 0.0])
    np.testing.assert_allclose(pos[-1], [2.0, 3.0, 3.0])


def test_tiles_atlas_roundtrip():
    rng = np.random.RandomState(1)
    atlas = jnp.asarray(rng.rand(2 * 8, 4 * 8, 3).astype(np.float32))
    tiles = pb.atlas_to_tiles(SETTINGS, atlas, 8)
    back = pb.tiles_to_atlas(SETTINGS, tiles, 8)
    np.testing.assert_allclose(back, atlas)


def test_sample_tile_bilinear_exact_texel_center():
    rng = np.random.RandomState(2)
    atlas = jnp.asarray(rng.rand(2 * 4, 4 * 4, 3).astype(np.float32))
    # texel (1, 2) of tile (1, 1): ray_id at its center
    ray_id = jnp.asarray([[(1 + 0.5) / 4, (2 + 0.5) / 4]], jnp.float32)
    out = pb.sample_tile_bilinear(atlas, jnp.asarray([1]), jnp.asarray([1]),
                                  ray_id, 4)
    np.testing.assert_allclose(out[0], atlas[1 * 4 + 2, 1 * 4 + 1], atol=1e-6)


def test_integrate_irradiance_uniform():
    """Uniform radiance L in all directions -> irradiance == L everywhere
    (the weights normalize to 1)."""
    atlas = jnp.full(SETTINGS.radiance_atlas_shape, 0.7, jnp.float32)
    irr = pb.integrate_irradiance(SETTINGS, atlas)
    assert irr.shape == SETTINGS.irradiance_atlas_shape
    np.testing.assert_allclose(irr, 0.7, atol=1e-5)


def test_integrate_irradiance_hemisphere():
    """Radiance only from +z directions: irradiance for the +z texel should
    be much larger than for the -z texel."""
    rr = SETTINGS.radiance_resolution
    dirs = np.asarray(pb.texel_directions(rr))
    tile = (dirs[:, 2] > 0).astype(np.float32)[:, None] * np.ones(3)
    tiles = np.tile(tile[None], (8, 1, 1)).astype(np.float32)
    atlas = pb.tiles_to_atlas(SETTINGS, jnp.asarray(tiles), rr)
    irr_atlas = pb.integrate_irradiance(SETTINGS, atlas)
    irr_tiles = pb.atlas_to_tiles(SETTINGS, irr_atlas,
                                  SETTINGS.irradiance_resolution)
    irr_dirs = np.asarray(pb.texel_directions(SETTINGS.irradiance_resolution))
    up = np.asarray(irr_tiles[0, :, 0])[irr_dirs[:, 2] > 0.8]
    down = np.asarray(irr_tiles[0, :, 0])[irr_dirs[:, 2] < -0.8]
    assert up.mean() > 4 * down.mean()


def test_radiance_mip1():
    atlas = jnp.arange(8 * 8, dtype=jnp.float32).reshape(8, 8, 1)
    atlas = jnp.tile(atlas, (1, 1, 3))
    mip = pb.radiance_mip1(SETTINGS, atlas)
    assert mip.shape == (4, 4, 3)
    np.testing.assert_allclose(mip[0, 0, 0], (0 + 1 + 8 + 9) / 4.0)


def test_sample_irradiance_open_scene():
    """No geometry: all probes visible; constant atlas -> constant result."""
    floor = lambda p: jnp.full(p.shape[:-1], 1e6, jnp.float32)  # empty scene
    irr_atlas = jnp.full(SETTINGS.irradiance_atlas_shape, 0.36, jnp.float32)
    pos = jnp.asarray([[1.0, 1.5, 1.5], [0.5, 0.2, 2.0]], jnp.float32)
    normal = jnp.asarray([[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]], jnp.float32)
    out = jax.jit(lambda p, n: pb.sample_irradiance(
        SETTINGS, floor, irr_atlas, p, n))(pos, normal)
    np.testing.assert_allclose(out, 0.36, atol=1e-5)


def test_matmul_atlas_sampling_matches_gather():
    """The MXU one-hot-matmul atlas path must match the texture-shaped
    gather path bit-for-bit-ish (both are f32 bilinear)."""
    rng = np.random.RandomState(7)
    s = SETTINGS
    atlas = jnp.asarray(
        rng.rand(*s.irradiance_atlas_shape).astype(np.float32))
    n = 200
    pid = jnp.asarray(rng.randint(0, s.num_probes, (n,)), jnp.int32)
    rid = jnp.asarray(rng.rand(n, 2), jnp.float32)
    tx, ty = pb.probe_id_to_tile(s, pid)
    ref = pb.sample_tile_bilinear(atlas, tx, ty, rid,
                                  s.irradiance_resolution)
    vals = pb.sample_all_tiles_bilinear(s, atlas, rid,
                                        s.irradiance_resolution)
    px, py = s.probe_count
    out = pb.probe_one_hot_combine(px * py, pid[None],
                                   jnp.ones((1, n), jnp.float32), vals)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_sample_irradiance_matmul_matches_gather():
    rng = np.random.RandomState(8)
    s = SETTINGS
    atlas = jnp.asarray(
        rng.rand(*s.irradiance_atlas_shape).astype(np.float32))
    n = 100
    pos = jnp.asarray(rng.uniform(0.0, 3.0, (n, 3)), jnp.float32)
    nrm = jnp.asarray(rng.randn(n, 3), jnp.float32)
    nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
    sdf_b = lambda p: jnp.full(p.shape[:-1], 10.0)  # empty scene

    a = pb.sample_irradiance(s, sdf_b, atlas, pos, nrm, method="matmul")
    b = pb.sample_irradiance(s, sdf_b, atlas, pos, nrm, method="gather")
    np.testing.assert_allclose(a, b, atol=1e-5)
