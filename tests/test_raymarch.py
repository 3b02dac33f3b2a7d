"""Tests for the sphere-tracing loops and the IFT gradient reattachment."""
import jax
import jax.numpy as jnp
import numpy as np

from madarch_tpu.render.raymarch import (ambient_occlusion,
                                         attach_hit_gradient, raycast,
                                         raycast_visibility, scene_normal,
                                         softshadows)


def sphere_floor_sdf(p):
    """Unit sphere at (0,0,5) + floor plane y=-1."""
    sph = jnp.linalg.norm(p - jnp.asarray([0.0, 0.0, 5.0]), axis=-1) - 1.0
    floor = p[..., 1] + 1.0
    return jnp.minimum(sph, floor)


def test_raycast_hits_sphere():
    origins = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    t, hit, pos = jax.jit(lambda o, d: raycast(sphere_floor_sdf, o, d, 20.0))(
        origins, dirs)
    assert bool(hit[0])
    assert np.isclose(t[0], 4.0, atol=5e-3)
    np.testing.assert_allclose(pos[0], [0.0, 0.0, 4.0], atol=5e-3)


def test_raycast_miss():
    origins = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    dirs = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)  # up: nothing there
    t, hit, _ = jax.jit(lambda o, d: raycast(sphere_floor_sdf, o, d, 20.0))(
        origins, dirs)
    assert not bool(hit[0])
    assert float(t[0]) >= 20.0


def test_raycast_batch_divergent():
    n = 16
    origins = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32), (n, 1))
    angles = jnp.linspace(-0.15, 0.15, n)
    dirs = jnp.stack([jnp.sin(angles), jnp.zeros(n), jnp.cos(angles)],
                     axis=-1)
    t, hit, _ = jax.jit(lambda o, d: raycast(sphere_floor_sdf, o, d, 20.0))(
        origins, dirs)
    assert bool(jnp.all(hit))  # all rays hit the sphere at these angles
    assert float(jnp.max(t)) > float(jnp.min(t))  # divergent path lengths


def test_raycast_enabled_mask():
    origins = jnp.zeros((2, 3), jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)
    enabled = jnp.asarray([True, False])
    _, hit, _ = jax.jit(lambda o, d, e: raycast(
        sphere_floor_sdf, o, d, 20.0, enabled=e))(origins, dirs, enabled)
    assert bool(hit[0]) and not bool(hit[1])


def test_visibility():
    origins = jnp.asarray([[0.0, 0.0, 0.0], [3.0, 0.0, 0.0]], jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]], jnp.float32)
    vis = jax.jit(lambda o, d: raycast_visibility(
        sphere_floor_sdf, o, d, jnp.asarray([10.0, 10.0])))(origins, dirs)
    np.testing.assert_allclose(vis, [0.0, 1.0])


def test_visibility_negative_budget_is_visible():
    # reference behavior: loop never entered when max_dist <= 0 -> visible
    origins = jnp.zeros((1, 3), jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    vis = raycast_visibility(sphere_floor_sdf, origins, dirs,
                             jnp.asarray([-0.5]))
    assert float(vis[0]) == 1.0


def test_softshadows_blocked_and_clear():
    f = jax.jit(lambda o, d, mx: softshadows(
        sphere_floor_sdf, o, d, jnp.zeros(o.shape[0]), mx, 64.0))
    # from below the sphere straight up through it
    o = jnp.asarray([[0.0, -0.9, 5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    assert float(f(o, d, jnp.asarray([10.0]))[0]) == 0.0
    # far away: clear
    o2 = jnp.asarray([[8.0, -0.9, 0.0]], jnp.float32)
    assert float(f(o2, d, jnp.asarray([10.0]))[0]) == 1.0


def test_softshadows_penumbra_between():
    # ray passing near the sphere: partial shadow in (0, 1)
    f = jax.jit(lambda o, d, mx: softshadows(
        sphere_floor_sdf, o, d, jnp.zeros(o.shape[0]), mx, 8.0))
    o = jnp.asarray([[1.12, -0.9, 5.0]], jnp.float32)
    d = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    s = float(f(o, d, jnp.asarray([10.0]))[0])
    assert 0.0 < s < 1.0


def test_ambient_occlusion_open_plane():
    # on a bare floor, sdf(p + n·h) == h  =>  ao == 1.0
    floor = lambda p: p[..., 1] + 1.0
    pos = jnp.asarray([[0.0, -1.0, 0.0]], jnp.float32)
    normal = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    ao = ambient_occlusion(floor, pos, normal, steps=3)
    np.testing.assert_allclose(ao, [1.0], atol=1e-6)


def test_ambient_occlusion_occluded():
    # sphere hovering 0.5 above the floor occludes the probes beneath it
    def sdf(p):
        sph = jnp.linalg.norm(p - jnp.asarray([0.0, 0.5, 5.0]),
                              axis=-1) - 1.0
        return jnp.minimum(sph, p[..., 1] + 1.0)

    pos = jnp.asarray([[0.0, -1.0, 5.0]], jnp.float32)
    normal = jnp.asarray([[0.0, 1.0, 0.0]], jnp.float32)
    ao = ambient_occlusion(sdf, pos, normal, steps=3)
    assert 0.6 <= float(ao[0]) < 0.999


def test_scene_normal():
    pos = jnp.asarray([[0.0, 0.0, 4.0]], jnp.float32)  # front of sphere
    n = scene_normal(sphere_floor_sdf, pos)
    np.testing.assert_allclose(n[0], [0.0, 0.0, -1.0], atol=1e-5)


def test_attach_hit_gradient_matches_finite_difference():
    """dt/d(radius) via IFT vs finite differences of the full march."""
    origins = jnp.asarray([[0.0, 0.0, 0.0]], jnp.float32)
    dirs = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)

    def march_t(radius):
        sdf = lambda p: (jnp.linalg.norm(
            p - jnp.asarray([0.0, 0.0, 5.0]), axis=-1) - radius)
        t, _, _ = raycast(lambda p: jax.lax.stop_gradient(sdf(p)),
                          origins, dirs, 20.0, eps=1e-5)
        t = attach_hit_gradient(sdf, origins, dirs, t)
        return t[0]

    g = jax.grad(march_t)(jnp.float32(1.0))
    # head-on hit: t = 5 - r  =>  dt/dr = -1
    assert np.isclose(g, -1.0, atol=1e-3)

    # oblique ray: compare against finite differences
    dirs_o = jnp.asarray([[0.6, 0.0, 0.8]], jnp.float32)

    def march_t_oblique(radius):
        sdf = lambda p: (jnp.linalg.norm(
            p - jnp.asarray([2.0, 0.0, 5.0]), axis=-1) - radius)
        t, _, _ = raycast(lambda p: jax.lax.stop_gradient(sdf(p)),
                          origins, dirs_o, 20.0, eps=1e-6)
        t = attach_hit_gradient(sdf, origins, dirs_o, t)
        return t[0]

    g = jax.grad(march_t_oblique)(jnp.float32(1.5))
    eps = 1e-3
    fd = (march_t_oblique(jnp.float32(1.5 + eps))
          - march_t_oblique(jnp.float32(1.5 - eps))) / (2 * eps)
    assert np.isclose(g, fd, rtol=5e-2)
