"""Tests for the SAH BVH and the BVH-compiled scene SDF."""
import jax
import jax.numpy as jnp
import numpy as np

from madarch_tpu.scene import bvh as B


def sphere_boxes(centers, radius):
    return [(np.asarray(c) - radius, np.asarray(c) + radius)
            for c in centers]


CENTERS = [(0.0, 0.0, 0.0), (4.0, 0.0, 0.0), (0.0, 4.0, 0.0),
           (4.0, 4.0, 0.0), (2.0, 2.0, 5.0), (6.0, 1.0, 2.0),
           (1.0, 6.0, 3.0), (5.0, 5.0, 4.0)]
R = 0.5


def leaf_sdfs():
    fns = []
    for c in CENTERS:
        cc = jnp.asarray(c, jnp.float32)
        fns.append(lambda p, cc=cc: jnp.linalg.norm(p - cc, axis=-1) - R)
    return fns


def test_build_structure():
    tree = B.build_bvh(sphere_boxes(CENTERS, R))
    # every index appears exactly once in the leaves
    seen = []
    B.visit(tree, lambda n: seen.extend(n.indices), lambda n, l, r: None)
    assert sorted(seen) == list(range(len(CENTERS)))
    # root bounds contain everything
    np.testing.assert_array_equal(tree.lo, np.asarray([-0.5, -0.5, -0.5]))
    np.testing.assert_array_equal(tree.hi, np.asarray([6.5, 6.5, 5.5]))


def test_aabb_sdf():
    lo = np.asarray([0.0, 0.0, 0.0])
    hi = np.asarray([2.0, 2.0, 2.0])
    p = jnp.asarray([[1.0, 1.0, 5.0]])
    # NOTE reference semantics: BB_Side is the FULL extent used as the box
    # half-extent in the expression (bvh_test/main.adb:96-97) — the box test
    # is deliberately conservative (2x loose).
    d = B.aabb_sdf(lo, hi, p)
    assert float(d[0]) == 2.0  # center (1,1,1), side 2 -> |5-1| - 2 = 2


def test_bvh_sdf_near_matches_exact():
    tree = B.build_bvh(sphere_boxes(CENTERS, R))
    f = B.bvh_sdf(tree, leaf_sdfs())
    f = jax.jit(f)
    pts = jnp.asarray([[0.0, 0.0, 0.6], [4.0, 0.0, 0.8], [2.0, 2.0, 4.3]],
                      jnp.float32)
    exact = jnp.min(jnp.stack(
        [jnp.linalg.norm(pts - jnp.asarray(c), axis=-1) - R
         for c in CENTERS]), axis=0)
    # near the surface (inside the 0.2 threshold shells) the traversal is
    # exact
    np.testing.assert_allclose(f(pts), exact, atol=1e-5)


def test_bvh_sdf_is_conservative_far():
    tree = B.build_bvh(sphere_boxes(CENTERS, R))
    f = jax.jit(B.bvh_sdf(tree, leaf_sdfs()))
    pts = jnp.asarray(np.random.RandomState(0).uniform(-8, 12, (64, 3)),
                      jnp.float32)
    exact = jnp.min(jnp.stack(
        [jnp.linalg.norm(pts - jnp.asarray(c), axis=-1) - R
         for c in CENTERS]), axis=0)
    vals = f(pts)
    # a sphere-tracing bound must never exceed the true distance
    assert np.all(np.asarray(vals) <= np.asarray(exact) + 1e-5)


def test_bvh_primitive_renders():
    """Sphere-trace against the compiled BVH primitive."""
    from madarch_tpu.render.raymarch import raycast
    tree = B.build_bvh(sphere_boxes(CENTERS, R))
    ptype = B.make_bvh_primitive("bvh_scene", tree, leaf_sdfs())
    params = {"position": jnp.zeros(3), "material_id": jnp.int32(0)}

    sdf_b = jax.vmap(lambda p: ptype.sdf(params, p))
    origins = jnp.asarray([[0.0, 0.0, -5.0]], jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t, hit, pos = raycast(sdf_b, origins, dirs, 30.0)
    assert bool(hit[0])
    np.testing.assert_allclose(pos[0], [0.0, 0.0, -0.5], atol=5e-3)

    n = ptype.analytic_or_grad_normal(params, jnp.asarray([0.0, 0.0, -0.5]))
    np.testing.assert_allclose(n, [0.0, 0.0, -1.0], atol=1e-4)
