"""Tests for uniform-grid partitioning: build rules and grid-aware closest."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from madarch_tpu.core.config import PartitioningSettings
from madarch_tpu.scene import lights as L
from madarch_tpu.scene import primitives as P
from madarch_tpu.scene.partitioning import (build_grid, cell_id,
                                            grid_closest)
from madarch_tpu.scene.scene import SceneBuilder, SceneSpec, scene_sdf

SETTINGS = PartitioningSettings(index_count=8, border_behavior="clamp",
                                grid_dimensions=(4, 4, 4),
                                grid_spacing=(1.0, 1.0, 1.0),
                                grid_offset=(0.0, 0.0, 0.0))


def build_scene(border="clamp"):
    settings = PartitioningSettings(
        index_count=8, border_behavior=border, grid_dimensions=(4, 4, 4),
        grid_spacing=(1.0, 1.0, 1.0), grid_offset=(0.0, 0.0, 0.0))
    spec = SceneSpec(prims=((P.Sphere, 8), (P.Plane, 2)),
                     lights=((L.PointLight, 1),), partitioning=settings)
    b = SceneBuilder(spec)
    b.add_material((0.5, 0.5, 0.5), 0.0, 0.5)
    b.add_primitive(P.Sphere, center=(0.5, 0.5, 0.5), radius=0.3,
                    material_id=0)
    b.add_primitive(P.Sphere, center=(3.5, 3.5, 3.5), radius=0.3,
                    material_id=0)
    b.add_primitive(P.Plane, normal=(0.0, 1.0, 0.0), offset=0.0,
                    material_id=0)
    b.add_light(L.PointLight, position=(2.0, 3.0, 2.0), color=(1.0,) * 3)
    return spec, settings, b.device_data()


@pytest.mark.parametrize("method", ["gpu_fast", "cpu_fast", "cpu_best"])
def test_build_grid_candidates(method):
    spec, settings, data = build_scene()
    grid = build_grid(spec, settings, data, method=method)
    assert grid.cells.shape == (64, 8)
    assert grid.counts.shape == (64,)
    # the cell containing sphere 0 must list it
    cid = int(cell_id(SETTINGS, jnp.asarray([0, 0, 0])))
    cands = np.asarray(grid.cells[cid])[:int(grid.counts[cid])]
    assert 0 in cands
    # the far-corner cell must list sphere 1 (global index 1)
    cid2 = int(cell_id(SETTINGS, jnp.asarray([3, 3, 3])))
    cands2 = np.asarray(grid.cells[cid2])[:int(grid.counts[cid2])]
    assert 1 in cands2
    # sphere 1 must NOT pollute the origin cell under cpu_best
    if method == "cpu_best":
        assert 1 not in cands


@pytest.mark.parametrize("method", ["gpu_fast", "cpu_best"])
def test_grid_closest_matches_full_scene_inside(method):
    spec, settings, data = build_scene()
    grid = build_grid(spec, settings, data, method=method)
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(0.05, 3.95, (128, 3)), jnp.float32)
    g = jax.jit(jax.vmap(
        lambda p: grid_closest(spec, settings, data, grid, p)))(pts)
    f = jax.jit(jax.vmap(lambda p: scene_sdf(spec, data, p)))(pts)
    # the conservative candidate rule guarantees the true closest primitive
    # is in every cell's list for points inside that cell
    np.testing.assert_allclose(g, f, atol=1e-5)


def test_grid_border_fallback():
    spec, settings, data = build_scene(border="fallback")
    grid = build_grid(spec, settings, data, method="gpu_fast")
    p = jnp.asarray([10.0, 5.0, 10.0], jnp.float32)  # far outside grid
    g = grid_closest(spec, settings, data, grid, p)
    f = scene_sdf(spec, data, p)
    assert np.isclose(float(g), float(f), atol=1e-5)


def test_renderer_update_partitioning_and_march():
    """obj_mesh-style: tiny mesh + grid; rendered march uses candidates."""
    from madarch_tpu.render.renderer import Renderer
    from madarch_tpu.render.context import SceneCtx
    from madarch_tpu.render.raymarch import raycast

    spec, settings, data = build_scene()
    r = Renderer(spec, 8, 8)
    r.builder._prims = {k: {f: np.asarray(v) for f, v in d.items()}
                        for k, d in jax.tree.map(
                            np.asarray, data.prims).items()}
    r.builder._prim_counts = {k: int(v) for k, v in data.prim_counts.items()}
    r.builder._lights = jax.tree.map(np.asarray, data.lights)
    r.builder._light_counts = {k: int(v)
                               for k, v in data.light_counts.items()}
    r.update_partitioning("gpu_fast")
    d2 = r.scene_data
    assert d2.grid is not None

    ctx = SceneCtx(spec, d2)
    origins = jnp.asarray([[0.5, 3.0, 0.5]], jnp.float32)
    dirs = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    t, hit, pos = raycast(ctx, origins, dirs, spec.max_dist)
    assert bool(hit[0])
    # hits the sphere top at y = 0.8
    assert np.isclose(float(pos[0, 1]), 0.8, atol=5e-3)
