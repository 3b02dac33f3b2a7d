"""Tests for the mesh subsystem: OBJ loading, voxelization, SDF baking."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from madarch_tpu.scene.mesh import (Mesh, bake_distance_map, load_obj,
                                    voxelize)

SUZANNE = "/root/reference/media/suzanne.obj"


def make_quad_mesh():
    """Unit quad in the z=0 plane (two triangles)."""
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                       np.float32)
    tris = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return Mesh(vertices=verts, normals=np.zeros((0, 3), np.float32),
                triangles=tris, tri_normals=np.zeros_like(tris))


@pytest.mark.skipif(not os.path.exists(SUZANNE), reason="asset missing")
def test_load_suzanne():
    mesh = load_obj(SUZANNE)
    assert len(mesh.vertices) == 507
    assert mesh.num_triangles == 967  # 967 triangle faces in the file
    lo, hi = mesh.bounding_box()
    assert np.all(lo < hi)
    assert np.all(np.abs(lo) < 2.0) and np.all(np.abs(hi) < 2.0)


def test_bounding_box():
    mesh = make_quad_mesh()
    lo, hi = mesh.bounding_box()
    np.testing.assert_allclose(lo, [0, 0, 0])
    np.testing.assert_allclose(hi, [1, 1, 0])


def test_voxelize_quad():
    mesh = make_quad_mesh()
    grid = voxelize(mesh, (4, 4, 1), lo=(0, 0, -0.5), hi=(1, 1, 0.5))
    assert grid.shape == (4, 4, 1)
    assert grid[0, 0, 0] and grid[3, 3, 0]
    assert grid.sum() >= 3


def test_bake_distance_map_quad():
    mesh = make_quad_mesh()
    dist, normal = bake_distance_map(mesh, (5, 5, 3), lo=(0, 0, -1),
                                     hi=(1, 1, 1))
    assert dist.shape == (5, 5, 3)
    # grid z values are -1, 0, 1; the quad lives at z=0
    # at z=0 exactly on the surface
    np.testing.assert_allclose(dist[2, 2, 1], 0.0, atol=1e-4)
    # one unit in front (z=+1): distance 1 (normal +z or -z by winding)
    assert np.isclose(dist[2, 2, 2], 1.0, atol=1e-4) or \
        np.isclose(dist[2, 2, 2], 0.0, atol=1e-4)  # back side -> inside=0
    # normals are unit length
    np.testing.assert_allclose(
        np.linalg.norm(normal[2, 2], axis=-1), 1.0, atol=1e-4)


def test_triangle_capacity_scene_roundtrip():
    """Mesh triangles register as Triangle primitives with live counts."""
    from madarch_tpu.render.renderer import Renderer
    from madarch_tpu.scene import primitives as P
    from madarch_tpu.scene import lights as L
    from madarch_tpu.scene.scene import SceneSpec
    from madarch_tpu.scene.mesh import add_mesh_to_renderer

    spec = SceneSpec(prims=((P.Triangle, 4),), lights=((L.PointLight, 1),))
    r = Renderer(spec, 8, 8)
    m = r.add_material((0.5, 0.5, 0.5), 0.0, 0.5)
    n = add_mesh_to_renderer(r, make_quad_mesh(), m)
    assert n == 2
    data = r.scene_data
    assert int(data.prim_counts["triangle"]) == 2
    # distance from above quad center ~ 0.5
    d, normal = r.eval_distance_to((0.5, 0.5, 0.5))
    assert np.isclose(d, 0.5, atol=1e-4)
    np.testing.assert_allclose(np.abs(normal), [0, 0, 1], atol=1e-3)
