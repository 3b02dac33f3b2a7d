"""SPMD scaling over a device mesh.

The reference is a single-GPU engine with no distribution
(SURVEY.md §5); the TPU rebuild's scaling design maps rendering onto SPMD:

- **rays** (screen pixels and probe-radiance texels) shard across the mesh's
  'rays' axis — the data-parallel axis;
- **scene data and probe atlases replicate**; the irradiance integration and
  any parameter gradients become cross-chip psums inserted by XLA from the
  sharding annotations (collectives ride ICI);
- the training step (differentiable render + grad) all-reduces parameter
  gradients automatically through jit's partitioner.

Use ``jax.distributed.initialize()`` before building the mesh for multi-host
pods; single-host multi-chip works as-is.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from madarch_tpu.core.config import (PROBE_SHADE_CONFIG, ProbeSettings,
                                     ShadeConfig, VolumetricsSettings,
                                     screen_shade_config)
from madarch_tpu.render.pipeline import (Camera, FrameState,
                                         render_frame_impl)
from madarch_tpu.scene.scene import SceneData, SceneSpec


def make_mesh(n_devices: int = None, axis: str = "rays") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def ray_sharder(mesh: Mesh, axis: str = "rays"):
    """Returns a callable constraining flat ray arrays to shard over the
    mesh axis (leading, batch, dimension)."""
    def shard(arr):
        spec = P(axis, *([None] * (arr.ndim - 1)))
        return lax.with_sharding_constraint(arr, NamedSharding(mesh, spec))
    return shard


def replicate(mesh: Mesh, tree):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def make_sharded_render(spec: SceneSpec, probes: ProbeSettings,
                        vol: VolumetricsSettings, width: int, height: int,
                        mesh: Mesh,
                        screen_cfg: ShadeConfig = None,
                        probe_cfg: ShadeConfig = PROBE_SHADE_CONFIG):
    """Jitted frame function with rays sharded over the mesh."""
    shard = ray_sharder(mesh)

    @jax.jit
    def run(data: SceneData, camera: Camera, state: FrameState):
        return render_frame_impl(spec, probes, vol, width, height, data,
                                 camera, state, screen_cfg=screen_cfg,
                                 probe_cfg=probe_cfg, shard=shard)

    return run


def make_train_step(spec: SceneSpec, probes: ProbeSettings,
                    vol: VolumetricsSettings, width: int, height: int,
                    mesh: Mesh, lr: float = 0.01,
                    screen_cfg: ShadeConfig = None,
                    probe_cfg: ShadeConfig = PROBE_SHADE_CONFIG):
    """Differentiable-rendering training step, sharded over the mesh.

    Loss = mean squared error between the rendered frame and a target image;
    gradients flow to every scene parameter (primitive fields, materials,
    lights, camera-independent) and are all-reduced across chips by XLA.
    Returns a jitted step: (data, camera, state, target) ->
    (loss, new_data, new_state).
    """
    import dataclasses

    # training renders on the differentiable path (IFT hit reattachment +
    # autodiff normals); plain rendering keeps the fused-kernel fast path.
    if screen_cfg is None:
        screen_cfg = screen_shade_config(vol.enabled)
    screen_cfg = dataclasses.replace(screen_cfg, differentiable=True)
    probe_cfg = dataclasses.replace(probe_cfg, differentiable=True)
    shard = ray_sharder(mesh)

    @jax.jit
    def step(data: SceneData, camera: Camera, state: FrameState, target):
        floats, aux = split_float_leaves(data)

        def loss_fn(floats):
            full = merge_float_leaves(aux, floats)
            image, new_state = render_frame_impl(
                spec, probes, vol, width, height, full, camera, state,
                screen_cfg=screen_cfg, probe_cfg=probe_cfg, shard=shard)
            loss = jnp.mean((image - target) ** 2)
            return loss, new_state

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(floats)
        new_floats = jax.tree.map(lambda p, g: p - lr * g, floats, grads)
        return loss, merge_float_leaves(aux, new_floats), new_state

    return step


def split_float_leaves(tree):
    """(float leaves, aux) — differentiate only real-valued scene params."""
    leaves, treedef = jax.tree.flatten(tree)
    is_f = [jnp.issubdtype(l.dtype, jnp.floating) for l in leaves]
    floats = [l for l, f in zip(leaves, is_f) if f]
    return floats, (treedef, leaves, tuple(is_f))


def merge_float_leaves(aux, floats):
    treedef, leaves, is_f = aux
    it = iter(floats)
    merged = [next(it) if f else l for l, f in zip(leaves, is_f)]
    return jax.tree.unflatten(treedef, merged)
