"""Tests for baked-SDF primitives (distance-map rendering)."""
import jax
import jax.numpy as jnp
import numpy as np

from madarch_tpu.scene.baked_sdf import (make_baked_sdf_primitive,
                                         trilinear_sample)


def sphere_grid(n=33, r=1.0, extent=2.0):
    xs = np.linspace(-extent, extent, n, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    d = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - r
    return d.astype(np.float32), (-extent,) * 3, (extent,) * 3


def test_trilinear_exact_at_nodes():
    grid, lo, hi = sphere_grid()
    p = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]], jnp.float32)
    v = trilinear_sample(jnp.asarray(grid), jnp.asarray(lo),
                         jnp.asarray(hi), p)
    np.testing.assert_allclose(v, [-1.0, 1.0], atol=1e-5)


def test_baked_primitive_matches_analytic():
    grid, lo, hi = sphere_grid(n=65)
    ptype = make_baked_sdf_primitive("baked_sphere", grid, lo, hi)
    params = {"position": jnp.asarray([1.0, 2.0, 3.0]),
              "material_id": jnp.int32(0)}
    rng = np.random.RandomState(0)
    pts = jnp.asarray(rng.uniform(-1.5, 1.5, (64, 3)).astype(np.float32)
                      + np.asarray([1.0, 2.0, 3.0], np.float32))
    d = jax.vmap(lambda p: ptype.sdf(params, p))(pts)
    exact = jnp.linalg.norm(pts - jnp.asarray([1.0, 2.0, 3.0]),
                            axis=-1) - 1.0
    np.testing.assert_allclose(d, exact, atol=5e-3)


def test_baked_primitive_marches():
    from madarch_tpu.render.raymarch import raycast
    grid, lo, hi = sphere_grid(n=65)
    ptype = make_baked_sdf_primitive("baked_sphere", grid, lo, hi)
    params = {"position": jnp.zeros(3), "material_id": jnp.int32(0)}
    sdf_b = jax.vmap(lambda p: ptype.sdf(params, p))
    origins = jnp.asarray([[0.0, 0.0, -6.0]], jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t, hit, pos = raycast(sdf_b, origins, dirs, 30.0)
    assert bool(hit[0])
    np.testing.assert_allclose(pos[0, 2], -1.0, atol=1e-2)
    n = ptype.analytic_or_grad_normal(params, jnp.asarray([0.0, 0.0, -1.0]))
    # trilinear-field gradients carry O(cell) discretization error
    np.testing.assert_allclose(n, [0.0, 0.0, -1.0], atol=5e-2)


def test_baked_from_mesh():
    """End-to-end: bake suzanne-like quad mesh, march against it."""
    from madarch_tpu.scene.mesh import Mesh, bake_distance_map
    from madarch_tpu.render.raymarch import raycast

    verts = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                       np.float32)
    tris = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    mesh = Mesh(vertices=verts, normals=np.zeros((0, 3), np.float32),
                triangles=tris, tri_normals=np.zeros_like(tris))
    dist, _ = bake_distance_map(mesh, (17, 17, 17), lo=(-0.5, -0.5, -1),
                                hi=(1.5, 1.5, 1))
    ptype = make_baked_sdf_primitive("baked_quad", dist, (-0.5, -0.5, -1),
                                     (1.5, 1.5, 1))
    params = {"position": jnp.zeros(3), "material_id": jnp.int32(0)}
    sdf_b = jax.vmap(lambda p: ptype.sdf(params, p))
    origins = jnp.asarray([[0.5, 0.5, -4.0]], jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t, hit, pos = raycast(sdf_b, origins, dirs, 30.0, eps=5e-3)
    assert bool(hit[0])
    assert abs(float(pos[0, 2])) < 0.1  # quad at z=0
