"""Headline benchmark: rays/s/chip on the 800×800 global_illumination scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so the baseline is
*established* here: vs_baseline is the ratio against BASELINE_RAYS_PER_S,
the first recorded TPU measurement of this framework (round 1).  Ray
accounting follows BASELINE.json: primary + shadow + AO + probe-visibility +
reflection rays for both the screen pass and the probe radiance pass.
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


def rays_per_frame(width, height, probes, n_lights, cfg_screen, cfg_probe):
    """Count marched rays per frame for the GI configuration."""
    wh = width * height
    # screen pass per pixel: primary + L shadow + 8 irradiance-visibility
    # + AO probes + (mode 2): 1 reflection + 8 visibility + L highlight shadow
    per_pixel = 1 + n_lights + 8 + cfg_screen.ambient_occlusion_steps
    if cfg_screen.indirect_specular_mode == 2:
        per_pixel += 1 + 8
        if cfg_screen.add_indirect_specular:
            per_pixel += n_lights
    screen = wh * per_pixel

    # radiance pass per texel: primary + L shadow + 8 visibility
    texels = probes.num_probes * probes.radiance_resolution ** 2
    probe = texels * (1 + n_lights + 8)
    return screen + probe


def main():
    import jax
    import jax.numpy as jnp
    from madarch_tpu.core.config import (PROBE_SHADE_CONFIG, ProbeSettings,
                                         screen_shade_config)
    from madarch_tpu.examples.scenes import global_illumination

    width = height = 800
    probes = ProbeSettings()
    r = global_illumination(width=width, height=height, probes=probes)
    cfg = screen_shade_config(False)
    r.screen_cfg = cfg

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}",
          file=sys.stderr)

    # warm up + converge GI feedback (also compiles).  Note: block_until_ready
    # is unreliable over the axon tunnel — force a scalar readback to sync.
    t0 = time.time()
    img = r.converge(frames=3)
    float(img.sum())
    print(f"compile+converge: {time.time() - t0:.1f}s", file=sys.stderr)

    # steady-state timing; frames chain through the probe feedback state, so
    # one readback at the end syncs the whole sequence.
    n_frames = 5
    t0 = time.time()
    for _ in range(n_frames):
        img = r.render()
    float(img.sum())
    dt = (time.time() - t0) / n_frames
    print(f"frame time: {dt * 1e3:.1f} ms", file=sys.stderr)

    rays = rays_per_frame(width, height, probes, n_lights=1,
                          cfg_screen=cfg, cfg_probe=PROBE_SHADE_CONFIG)
    rays_per_s = rays / dt
    vs = (rays_per_s / BASELINE_RAYS_PER_S) if BASELINE_RAYS_PER_S else 1.0
    print(json.dumps({
        "metric": "rays_per_s_per_chip_gi_800",
        "value": round(rays_per_s),
        "unit": "rays/s",
        "vs_baseline": round(vs, 3),
    }))


if __name__ == "__main__":
    main()
