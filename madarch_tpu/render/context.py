"""SceneCtx: one object bundling everything the marches need.

Carries both the generic batched-SDF closure (works for any primitive type,
differentiable) and the packed planar-scene representation consumed by the
fused Pallas kernels.  March entry points accept either a bare callable
(generic path) or a SceneCtx (kernel fast path when available).
"""
from __future__ import annotations

import os

import jax
from jax import lax

from madarch_tpu.ops import march as march_ops
from madarch_tpu.scene.scene import SceneData, SceneSpec, scene_sdf

def _kernels_enabled() -> bool:
    """Kernels run on TPU by default; CPU uses the XLA fallback (interpret
    mode is for parity tests only, via MADARCH_FORCE_PALLAS=1)."""
    if os.environ.get("MADARCH_NO_PALLAS", "") == "1":
        return False
    if os.environ.get("MADARCH_FORCE_PALLAS", "") == "1":
        return True
    return jax.default_backend() == "tpu"


class SceneCtx:
    def __init__(self, spec: SceneSpec, data: SceneData):
        self.spec = spec
        data_sg = jax.tree.map(lax.stop_gradient, data)
        self.data = data
        self.sdf_b_diff = jax.vmap(lambda p: scene_sdf(spec, data, p))
        self.max_dist = spec.max_dist

        if spec.partitioning is not None and data.grid is not None:
            # marches use the grid candidate lists (partitioning_closest);
            # the differentiable/info paths stay full-scene.
            from madarch_tpu.scene.partitioning import grid_closest
            settings = spec.partitioning
            self.sdf_b = jax.vmap(lambda p: grid_closest(
                spec, settings, data_sg, data_sg.grid, p))
        else:
            self.sdf_b = jax.vmap(lambda p: scene_sdf(spec, data_sg, p))

        self.plan = march_ops.build_plan(spec) if _kernels_enabled() else None
        if (self.plan is not None and self.plan.total_capacity <= 128
                and data.grid is None):
            self.params_vec, self.counts = march_ops.pack_params(
                self.plan, data_sg)
            self.lpos_vec, self.n_light_slots = \
                march_ops.pack_light_positions(spec, data_sg)
        else:
            # large scenes march through the grid; the grid-aware Pallas
            # kernel is future work — XLA path meanwhile
            self.plan = None
            self.lpos_vec, self.n_light_slots = None, 0

    @property
    def use_kernel(self) -> bool:
        return self.plan is not None

    @property
    def fused_available(self) -> bool:
        """True when the fused geometry kernel can serve this scene: kernel
        path on and every live light has a vec3 'position' field (the
        shadow-ray target)."""
        return self.plan is not None and self.lpos_vec is not None

    def geometry(self, origins, dirs, probes, cfg, enabled=None):
        """Run the fused march+classify+shadow+probe-visibility kernel."""
        from madarch_tpu.render.raymarch import SURFACE_OFFSET
        return march_ops.pallas_geometry(
            self.plan, self.params_vec, self.counts, self.lpos_vec,
            self.n_light_slots, origins, dirs, self.max_dist,
            probe_spacing=probes.grid_spacing,
            probe_dims=probes.grid_dimensions,
            surface_offset=SURFACE_OFFSET,
            ao_steps=cfg.ambient_occlusion_steps,
            max_steps=cfg.max_march_steps, enabled=enabled)
