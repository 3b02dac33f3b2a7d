"""Benchmark: rays/s/chip across the five BASELINE.json configs.

Prints ONE JSON line on stdout (headline = the 800×800 global_illumination
scene, BASELINE.json's north-star metric) with per-config and per-pass
detail as extra keys; human-readable progress goes to stderr.

The reference publishes no numbers (BASELINE.md), so the baseline is
*established* here: vs_baseline is the ratio against BASELINE_RAYS_PER_S,
the first honest TPU measurement of this framework (round 1, pure-XLA path).
Ray accounting lives in madarch_tpu.utils.profiling.rays_per_frame (single
source; BASELINE.json's primary + shadow + AO + probe-visibility +
reflection convention).
"""
from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

# The denominator for vs_baseline: the first honest TPU v5e measurement of
# the complete pipeline (round 1, pure-XLA path before the Pallas march
# kernels; 800×800 GI frame at 2.60 s ≈ 5.8 M rays/s).
BASELINE_RAYS_PER_S = 5.8e6


def _sync(x):
    import jax
    jax.block_until_ready(x)
    # block_until_ready is unreliable over tunneled TPU transports; force a
    # scalar readback as the barrier.
    float(x.sum())


def bench_renderer(name, r, n_lights, frames=5, converge_frames=3):
    from madarch_tpu.utils.profiling import rays_per_frame

    t0 = time.time()
    img = r.converge(frames=converge_frames)
    _sync(img)
    compile_s = time.time() - t0

    t0 = time.time()
    for _ in range(frames):
        img = r.render()
    _sync(img)
    dt = (time.time() - t0) / frames

    rays = rays_per_frame(r.width, r.height, r.probes, n_lights,
                          r.screen_cfg, r.volumetrics)
    rays_per_s = rays / dt
    print(f"{name:24s} {dt * 1e3:8.1f} ms/frame  "
          f"{rays_per_s / 1e6:8.1f} M rays/s  (compile {compile_s:.1f}s)",
          file=sys.stderr)
    return {"frame_ms": round(dt * 1e3, 2),
            "rays_per_s": round(rays_per_s),
            "compile_s": round(compile_s, 1)}


def per_pass_breakdown(r):
    """ms per pipeline pass for the GI scene (VERDICT round-2 item 2)."""
    import jax
    from functools import partial
    from madarch_tpu.core.config import PROBE_SHADE_CONFIG
    from madarch_tpu.render import probes as probes_mod
    from madarch_tpu.render.pipeline import radiance_pass, screen_pass

    spec, data, cam, st = r.spec, r.scene_data, r.camera, r.state
    probes = r.probes

    f_rad = jax.jit(lambda d, irr, rad: radiance_pass(
        spec, d, probes, PROBE_SHADE_CONFIG, irr, rad))
    f_irr = jax.jit(partial(probes_mod.integrate_irradiance, probes))
    f_scr = jax.jit(lambda d, irr, rad, sc: screen_pass(
        spec, d, probes, r.volumetrics, r.screen_cfg, r.width, r.height,
        cam, irr, rad, sc))

    out = {}
    # 20 iterations per pass: single-dispatch wall time over the tunneled
    # TPU transport carries ~15 ms of fixed overhead that chained frames
    # absorb; more reps dilute it (still an upper bound per pass).
    iters = 20
    for name, fn, args in (
            ("radiance", f_rad, (data, st.irradiance, st.radiance)),
            ("irradiance_integrate", f_irr, (st.radiance,)),
            ("screen", f_scr, (data, st.irradiance, st.radiance,
                               st.scattering))):
        res = fn(*args)
        _sync(res)
        t0 = time.time()
        for _ in range(iters):
            res = fn(*args)
        _sync(res)
        out[name] = round((time.time() - t0) / iters * 1e3, 2)
    print(f"per-pass (GI): {out}", file=sys.stderr)
    return out


def main():
    import jax
    from madarch_tpu.core.config import ProbeSettings
    from madarch_tpu.examples import scenes

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          file=sys.stderr)
    size = 800
    configs = {}

    # 1. simple_scene: spheres/planes/boxes, point light, direct PBR
    r = scenes.simple_scene(width=size, height=size)
    configs["simple_scene"] = bench_renderer("simple_scene", r, n_lights=1)

    # 2. soft shadows + AO + reflections (room scene, spot light): the GI
    # room with minimal probe work so the screen-pass effects dominate
    tiny_probes = ProbeSettings(radiance_resolution=8,
                                irradiance_resolution=4,
                                probe_count=(6, 6),
                                grid_dimensions=(4, 3, 3),
                                grid_spacing=(2.0, 3.0, 3.0))
    r = scenes.global_illumination(width=size, height=size,
                                   probes=tiny_probes)
    configs["room_reflections"] = bench_renderer("room_reflections", r,
                                                 n_lights=1)

    # 3. DDGI global illumination (the headline config)
    r_gi = scenes.global_illumination(width=size, height=size)
    gi = bench_renderer("global_illumination", r_gi, n_lights=1)
    configs["global_illumination"] = gi
    passes = per_pass_breakdown(r_gi)

    # 4. volumetric light shafts
    r = scenes.light_shafts(width=size, height=size)
    configs["light_shafts"] = bench_renderer("light_shafts", r, n_lights=1)

    # 5. triangle mesh (suzanne.obj).  Meshes march through dense slot
    # evaluation (TPU gathers lose ~50× to brute force, see
    # render/context.py); still the slowest config by far — measured at a
    # reduced size until the tile-predicated chunk kernel lands (rays/s is
    # resolution-normalized anyway).
    tiny_probes = ProbeSettings(radiance_resolution=8,
                                irradiance_resolution=4,
                                probe_count=(6, 6),
                                grid_dimensions=(3, 3, 4),
                                grid_spacing=(2.0, 3.0, 3.0))
    r = scenes.obj_mesh(width=size // 4, height=size // 4,
                        probes=tiny_probes)
    configs["obj_mesh"] = bench_renderer("obj_mesh", r, n_lights=1,
                                         frames=1, converge_frames=1)

    rays_per_s = configs["global_illumination"]["rays_per_s"]
    vs = rays_per_s / BASELINE_RAYS_PER_S if BASELINE_RAYS_PER_S else 1.0
    print(json.dumps({
        "metric": "rays_per_s_per_chip_gi_800",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": round(vs, 3),
        "configs": configs,
        "per_pass_ms": passes,
    }))


if __name__ == "__main__":
    main()
