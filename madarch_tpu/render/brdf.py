"""Cook-Torrance BRDF (reference cook_torrance_brdf.glsl:1-53).

All functions broadcast over leading batch dimensions.
"""
from __future__ import annotations

import jax.numpy as jnp

from madarch_tpu.core.vecmath import PI, dot, mix, normalize


def fresnel_schlick(cos_theta, f0):
    # pow(1.001 - cosTheta, 5) — the 1.001 bias is reference behavior
    return f0 + (1.0 - f0) * ((1.001 - cos_theta) ** 5.0)[..., None]


def distribution_ggx(n, h, roughness):
    a = roughness * roughness
    a2 = a * a
    ndoth = jnp.maximum(dot(n, h), 0.0)
    denom = ndoth * ndoth * (a2 - 1.0) + 1.0
    return a2 / (PI * denom * denom)


def geometry_schlick_ggx(ndotv, roughness):
    r = roughness + 1.0
    k = (r * r) / 8.0
    return ndotv / (ndotv * (1.0 - k) + k)


def geometry_smith(ndotv, ndotl, roughness):
    return (geometry_schlick_ggx(ndotv, roughness)
            * geometry_schlick_ggx(ndotl, roughness))


def cook_torrance_coefficients(n, v, l, ndotl, albedo, metallic, roughness):
    """Returns (kD, kS) exactly as cook_torrance_brdf.glsl:35-53."""
    h = normalize(v + l)
    ndotv = jnp.maximum(dot(n, v), 0.0)

    f0 = mix(jnp.full_like(albedo, 0.04), albedo, metallic[..., None])
    ndf = distribution_ggx(n, h, roughness)
    g = geometry_smith(ndotv, ndotl, roughness)
    f = fresnel_schlick(jnp.maximum(dot(h, v), 0.0), f0)

    numerator = (ndf * g)[..., None] * f
    denominator = 4.0 * ndotv * ndotl

    kd = (1.0 - f) * (1.0 - metallic)[..., None]
    ks = jnp.minimum(numerator / jnp.maximum(denominator, 1e-3)[..., None],
                     1.0)
    return kd, ks
