"""Alternate render modes: direct-only, N-sample one-bounce MC GI, and a
bounded path tracer.

Counterparts of /root/reference/madarch/glsl/render_direct.glsl,
render_many.glsl (100-sample one-bounce estimator), and render_path.glsl
(3-bounce path tracer with albedo throughput mask and roughness-driven BRDF
sampling).  Everything operates on flat ray batches; bounce loops are static
Python unrolls (fixed counts, reference semantics), sample loops fold over a
split PRNG key.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from madarch_tpu.core.vecmath import dot, normalize, reflect
from madarch_tpu.render import sampling
from madarch_tpu.render.context import SceneCtx
from madarch_tpu.render.lighting import direct_lighting
from madarch_tpu.render.raymarch import (SURFACE_OFFSET, ambient_occlusion,
                                         attach_hit_gradient, raycast,
                                         scene_normal)
from madarch_tpu.render.shading import sky_color
from madarch_tpu.scene.scene import (material_lookup, primitive_info,
                                     scene_sdf_info)


def _surface_query(spec, data, ctx, origins, dirs, max_steps):
    t, hit, _ = raycast(ctx, origins, dirs, spec.max_dist,
                        max_steps=max_steps)
    t = attach_hit_gradient(ctx.sdf_b_diff, origins, dirs, t)
    pos = origins + t[:, None] * dirs
    normal = scene_normal(ctx.sdf_b_diff, pos)
    data_sg = jax.tree.map(lax.stop_gradient, data)
    _, idx = jax.vmap(lambda p: scene_sdf_info(spec, data_sg, p))(pos)
    _, mid = jax.vmap(lambda i, p: primitive_info(spec, data, i, p))(idx,
                                                                     pos)
    albedo, metallic, roughness = material_lookup(data, mid)
    return hit, pos, normal, albedo, metallic, roughness


def pixel_color_direct(spec, data, origins, dirs, *, ao_steps=3,
                       compute_specular=True, max_steps=300, ctx=None):
    """render_direct.glsl: primary hit -> AO × direct PBR, sky on miss."""
    if ctx is None:
        ctx = SceneCtx(spec, data)
    hit, pos, normal, albedo, metallic, roughness = _surface_query(
        spec, data, ctx, origins, dirs, max_steps)
    direct = direct_lighting(spec, data, ctx, pos, normal, dirs, albedo,
                             metallic, roughness,
                             compute_specular=compute_specular,
                             enabled=hit, max_steps=max_steps)
    ao = ambient_occlusion(ctx, pos, normal, steps=ao_steps)
    lit = ao[..., None] * direct
    return jnp.where(hit[..., None], lit, sky_color(dirs))


def pixel_color_many(spec, data, origins, dirs, key, *, gi_samples=100,
                     max_steps=300):
    """render_many.glsl: direct + (1/S)·Σ direct(one sampled bounce)·|n·d|.

    BRDF sampling per the reference: with probability ``roughness`` a uniform
    hemisphere direction, else the mirror direction perturbed by
    roughness·uniform_vector.
    """
    ctx = SceneCtx(spec, data)
    hit, pos, normal, albedo, metallic, roughness = _surface_query(
        spec, data, ctx, origins, dirs, max_steps)
    direct = direct_lighting(spec, data, ctx, pos, normal, dirs, albedo,
                             metallic, roughness, compute_specular=True,
                             enabled=hit, max_steps=max_steps)

    from_ = pos + normal * SURFACE_OFFSET
    reflected = reflect(dirs, normal)
    acc = jnp.zeros_like(direct)
    for s in range(gi_samples):
        key, k1, k2, k3 = jax.random.split(key, 4)
        u = jax.random.uniform(k1, hit.shape)
        d_diff = sampling.random_hemisphere_point(k2, normal)
        d_spec = normalize(reflected + sampling.uniform_vector(
            k3, hit.shape) * roughness[..., None])
        d = jnp.where((u < roughness)[..., None], d_diff, d_spec)
        sample = pixel_color_direct(spec, data, from_, d, ao_steps=0,
                                    max_steps=max_steps, ctx=ctx)
        acc = acc + sample * jnp.abs(dot(d, normal))[..., None]

    out = direct + acc / gi_samples
    return jnp.where(hit[..., None], out, sky_color(dirs))


def pixel_color_path(spec, data, origins, dirs, key, *, gi_bounces=3,
                     max_steps=300):
    """render_path.glsl: (bounces+1)-segment path tracer with albedo
    throughput; every miss adds mask-free sky (reference behavior: the sky
    is added unmasked, render_path.glsl:36-38)."""
    ctx = SceneCtx(spec, data)
    n = origins.shape[0]
    result = jnp.zeros((n, 3), jnp.float32)
    mask = jnp.ones((n, 3), jnp.float32)
    alive = jnp.ones((n,), bool)
    from_, d = origins, dirs

    for bounce in range(gi_bounces + 1):
        hit, pos, normal, albedo, metallic, roughness = _surface_query(
            spec, data, ctx, from_, d, max_steps)
        hit = hit & alive
        direct = direct_lighting(spec, data, ctx, pos, normal, d, albedo,
                                 metallic, roughness, compute_specular=True,
                                 enabled=hit, max_steps=max_steps)
        result = result + jnp.where(hit[..., None], mask * direct, 0.0)
        # reference: a missing segment adds the sky once, then keeps looping
        # (and keeps adding sky each remaining bounce — faithful to the GLSL)
        result = result + jnp.where((alive & ~hit)[..., None],
                                    sky_color(d), 0.0)
        mask = jnp.where(hit[..., None], mask * albedo, mask)

        key, k1, k2, k3 = jax.random.split(key, 4)
        u = jax.random.uniform(k1, hit.shape)
        d_diff = sampling.cosine_direction(k2, normal)
        d_spec = normalize(reflect(d, normal) + sampling.uniform_vector(
            k3, hit.shape) * roughness[..., None])
        new_d = jnp.where((u < roughness)[..., None], d_diff, d_spec)
        d = jnp.where(hit[..., None], new_d, d)
        from_ = jnp.where(hit[..., None], pos, from_)
    return result
