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


def test_obj_mesh_baked_mode_renders_suzanne():
    """End-to-end baked-distance-map mesh rendering (the reference's
    scene_custom.glsl experiment as a first-class mode): the baked suzanne
    silhouette must appear and roughly agree with the exact-triangle mode
    at the same camera."""
    from madarch_tpu.examples.scenes import obj_mesh
    from madarch_tpu.scene.scene import scene_sdf
    import jax

    size = 48
    r_b = obj_mesh(width=size, height=size, mode="baked",
                   bake_dims=(32, 32, 32))
    r_e = obj_mesh(width=size, height=size)
    img_b = np.asarray(r_b.converge(frames=1))
    img_e = np.asarray(r_e.converge(frames=1))
    assert np.isfinite(img_b).all()

    # silhouette = pixels darker than the sky gradient
    def silhouette(img):
        return img.std(axis=-1) > 0.02  # sky is grey-blue gradient

    sb, se = silhouette(img_b), silhouette(img_e)
    assert sb.sum() > 20, "baked suzanne not visible"
    inter = (sb & se).sum()
    union = (sb | se).sum()
    assert inter / union > 0.5, f"silhouette IoU {inter / union:.2f}"

    # The baked field can only *underestimate* the exact unsigned triangle
    # distance (plus interpolation error): interior AND back-facing-closest
    # points are zeroed by the reference's rule
    # (meshes-distance_maps.adb:158-301; suzanne is not watertight, so
    # back-face zeroing also fires outside near the eyes).  One-sided
    # bound near the mesh:
    pts = jnp.asarray(np.random.RandomState(0).uniform(
        0.5, 2.5, (64, 3)), jnp.float32)
    d_b = jax.vmap(lambda p: scene_sdf(r_b.spec, r_b.scene_data, p))(pts)
    d_e = jax.vmap(lambda p: scene_sdf(r_e.spec, r_e.scene_data, p))(pts)
    cell = float(np.linalg.norm((np.asarray([2.9, 2.9, 2.9]) / 32)))
    mask = np.asarray(d_e) < 1.0
    over = (np.asarray(d_b) - np.asarray(d_e))[mask]
    assert over.max() < 4 * cell, f"baked exceeds exact by {over.max():.3f}"
