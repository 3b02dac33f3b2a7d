"""Benchmark: rays/s/chip across the five BASELINE.json configs.

Prints ONE JSON line on stdout (headline = the 800×800 global_illumination
scene, BASELINE.json's north-star metric) with per-config and per-pass
detail as extra keys; human-readable progress goes to stderr.

The reference publishes no numbers (BASELINE.md), so the baseline is
*established* here: vs_baseline is the ratio against BASELINE_RAYS_PER_S,
the first honest TPU measurement of this framework (round 1, pure-XLA path).
Per-config regressions are tracked against the previous round's floors
(PREV_ROUND): any config >20% slower prints a loud REGRESSION line to
stderr and sets "regressions" in the JSON.  Extra keys: scaling_efficiency
(8-device CPU-mesh measure_scaling in a subprocess — machinery validation;
BASELINE.json tracks ≥85% at 2 hosts on real ICI) and tpu_vs_golden
(TPU-rendered 128² stats against the CPU goldens, so Mosaic-path drift is
visible round over round).  Ray accounting lives in
madarch_tpu.utils.profiling.rays_per_frame (single source; BASELINE.json's
primary + shadow + AO + probe-visibility + reflection convention).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The denominator for vs_baseline: the first honest TPU v5e measurement of
# the complete pipeline (round 1, pure-XLA path before the Pallas march
# kernels; 800×800 GI frame at 2.60 s ≈ 5.8 M rays/s).
BASELINE_RAYS_PER_S = 5.8e6

# Round-2 per-config floors (BENCH_r02.json): regression tripwires.
# obj_mesh's round-2 number was measured at 200×200; it is renormalized to
# rays/s so the full-size run compares honestly.
PREV_ROUND = {
    "simple_scene": 88893254,
    "room_reflections": 232097785,
    "global_illumination": 233868093,
    "light_shafts": 96749984,
    "obj_mesh": 176785,
}
REGRESSION_TOLERANCE = 0.8  # fail loudly below 80% of last round


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
    """ms per pipeline pass for the GI scene."""
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


def tpu_vs_golden():
    """Render GI + simple_scene at 128² ON THE TPU (kernel path) and
    compare statistics against the CPU goldens — the Mosaic-path drift
    alarm (VERDICT r2 item 3b).  Returns {} when goldens are absent."""
    import numpy as np

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tests", "goldens", "images.npz")
    if not os.path.exists(path):
        return {}
    goldens = np.load(path)
    from madarch_tpu.examples import scenes

    frames = {"global_illumination": 4, "simple_scene": 2}
    out = {}
    for name in ("global_illumination", "simple_scene"):
        if name not in goldens.files:
            continue
        r = getattr(scenes, name)(width=128, height=128)
        img = np.asarray(r.converge(frames=frames[name]))
        ref = goldens[name]
        diff = np.abs(img - ref)
        out[name] = {
            "mean_tpu": round(float(img.mean()), 5),
            "mean_golden": round(float(ref.mean()), 5),
            "max_absdiff": round(float(diff.max()), 5),
            "mean_absdiff": round(float(diff.mean()), 6),
        }
        print(f"tpu-vs-golden {name}: {out[name]}", file=sys.stderr)
    return out


def scaling_efficiency():
    """measure_scaling on an 8-device CPU mesh, in a subprocess (this
    process owns the TPU backend).  Validates the SPMD machinery; real-ICI
    efficiency needs a multi-chip slice (BASELINE.json ≥85% @ 2 hosts)."""
    code = (
        "import os, json\n"
        "os.environ['XLA_FLAGS'] = os.environ.get('XLA_FLAGS','') + "
        "' --xla_force_host_platform_device_count=8'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys; sys.path.insert(0, %r)\n"
        "from madarch_tpu.parallel.spmd import measure_scaling\n"
        "print('SCALING=' + json.dumps(measure_scaling(width=96, "
        "height=96, frames=2)))\n"
    ) % os.path.dirname(os.path.abspath(__file__))
    try:
        res = subprocess.run([sys.executable, "-c", code], timeout=900,
                             capture_output=True, text=True)
        for line in res.stdout.splitlines():
            if line.startswith("SCALING="):
                out = json.loads(line[len("SCALING="):])
                print(f"scaling (8-dev CPU mesh): {out}", file=sys.stderr)
                return out
    except (subprocess.TimeoutExpired, OSError) as e:
        print(f"scaling measurement failed: {e}", file=sys.stderr)
    return {}


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

    # 5. triangle mesh (suzanne.obj), full resolution through the chunked
    # Pallas layout (968 triangles; lane-replicated VMEM rows + bounding
    # spheres, ops/march.py)
    tiny_probes = ProbeSettings(radiance_resolution=8,
                                irradiance_resolution=4,
                                probe_count=(6, 6),
                                grid_dimensions=(3, 3, 4),
                                grid_spacing=(2.0, 3.0, 3.0))
    r = scenes.obj_mesh(width=size, height=size, probes=tiny_probes)
    configs["obj_mesh"] = bench_renderer("obj_mesh", r, n_lights=1,
                                         frames=2, converge_frames=1)

    regressions = {}
    for name, cfg in configs.items():
        prev = PREV_ROUND.get(name)
        if not prev:
            continue
        ratio = cfg["rays_per_s"] / prev
        cfg["vs_prev_round"] = round(ratio, 3)
        if ratio < REGRESSION_TOLERANCE:
            regressions[name] = round(ratio, 3)
            print(f"*** REGRESSION: {name} at {ratio:.2f}x of round-2 "
                  f"rays/s ({cfg['rays_per_s']:,} vs {prev:,}) ***",
                  file=sys.stderr)

    golden_stats = tpu_vs_golden()
    scaling = scaling_efficiency()

    rays_per_s = configs["global_illumination"]["rays_per_s"]
    vs = rays_per_s / BASELINE_RAYS_PER_S if BASELINE_RAYS_PER_S else 1.0
    print(json.dumps({
        "metric": "rays_per_s_per_chip_gi_800",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": round(vs, 3),
        "configs": configs,
        "per_pass_ms": passes,
        "regressions": regressions,
        "tpu_vs_golden": golden_stats,
        "scaling_efficiency": scaling,
    }))


if __name__ == "__main__":
    main()
