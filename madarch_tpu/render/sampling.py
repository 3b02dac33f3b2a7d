"""Random direction sampling for the Monte-Carlo render modes.

Counterpart of /root/reference/madarch/glsl/random.glsl:5-48.  The
reference uses fragile sin-hash tricks; here directions come from
``jax.random`` (threefry) — a deliberate upgrade, the sampled distributions
(uniform sphere/hemisphere, cosine-weighted) are identical.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from madarch_tpu.core.vecmath import PI_2, dot, normalize


def random_sphere_point(key, shape=()):
    """Uniform on S² (random.glsl:13-22)."""
    k1, k2 = jax.random.split(key)
    ang = jax.random.uniform(k1, shape) * PI_2
    u = jax.random.uniform(k2, shape) * 2.0 - 1.0
    s = jnp.sqrt(jnp.maximum(1.0 - u * u, 0.0))
    return jnp.stack([s * jnp.cos(ang), s * jnp.sin(ang), u], axis=-1)


def random_hemisphere_point(key, normal):
    """Uniform on the hemisphere around ``normal`` (random.glsl:24-27):
    sphere sample mirrored to the normal's side."""
    v = random_sphere_point(key, normal.shape[:-1])
    s = jnp.sign(dot(v, normal))
    s = jnp.where(s == 0.0, 1.0, s)
    return v * s[..., None]


def cosine_direction(key, normal):
    """Cosine-weighted hemisphere sample around ``normal``
    (random.glsl:29-41, the iq branchless-basis construction)."""
    nor = normal
    z = nor[..., 2]
    denom = 1.0 + jnp.where(jnp.abs(1.0 + z) < 1e-6, 1e-6, z)
    tc_x = 1.0 + z - nor[..., 0] * nor[..., 0] / denom
    tc_y = 1.0 + z - nor[..., 1] * nor[..., 1] / denom
    tc_z = -nor[..., 0] * nor[..., 1] / denom
    uu = jnp.stack([tc_x, tc_z, -nor[..., 0]], axis=-1)
    vv = jnp.stack([tc_z, tc_y, -nor[..., 1]], axis=-1)

    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, normal.shape[:-1])
    v = jax.random.uniform(k2, normal.shape[:-1])
    a = PI_2 * v
    d = (jnp.sqrt(u)[..., None]
         * (jnp.cos(a)[..., None] * uu + jnp.sin(a)[..., None] * vv)
         + jnp.sqrt(1.0 - u)[..., None] * nor)
    return normalize(d)


def uniform_vector(key, shape=()):
    """random.glsl:43-48 — NOTE the reference's version is *not* uniform on
    the sphere (it samples angles uniformly); it is used as a perturbation
    vector only, so a true uniform sphere sample is the faithful
    replacement."""
    return random_sphere_point(key, shape)
