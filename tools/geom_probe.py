"""Time pallas_geometry on a config's screen rays with march groups
toggled, to attribute where the kernel time goes.

Usage: python tools/geom_probe.py [config] [size]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "obj_mesh"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    import jax
    from functools import partial
    from madarch_tpu.examples import scenes
    from madarch_tpu.core.config import ProbeSettings
    from madarch_tpu.render.camera import camera_rays, pixel_grid
    from madarch_tpu.render.context import SceneCtx
    from madarch_tpu.render.pipeline import _to_blocks

    kwargs = {}
    if name == "obj_mesh":
        kwargs["probes"] = ProbeSettings(
            radiance_resolution=8, irradiance_resolution=4,
            probe_count=(6, 6), grid_dimensions=(3, 3, 4),
            grid_spacing=(2.0, 3.0, 3.0))
    r = scenes.__dict__[name](width=size, height=size, **kwargs)
    frag = pixel_grid(size, size)
    origins, dirs = camera_rays(frag, r.camera.position,
                                r.camera.orientation)
    o = _to_blocks(origins.reshape(-1, 3), size, size)
    d = _to_blocks(dirs.reshape(-1, 3), size, size)
    ctx = SceneCtx(r.spec, r.scene_data)
    print(f"backend={jax.default_backend()} plan entries="
          f"{[(e.ptype.name, e.kind, e.n, e.n_chunks) for e in ctx.plan.entries]}",
          file=sys.stderr)

    def timeit(label, **flags):
        f = jax.jit(partial(
            lambda oo, dd: ctx.geometry(oo, dd, r.probes, r.screen_cfg,
                                        **flags)))
        out = f(o, d)
        jax.block_until_ready(out)
        float(out["t"].sum())
        t0 = time.time()
        reps = 3
        for _ in range(reps):
            out = f(o, d)
        float(out["t"].sum())
        dt = (time.time() - t0) / reps * 1e3
        print(f"{label:34s} {dt:8.1f} ms", file=sys.stderr)
        return dt

    timeit("full (ao+shadows+vis)")
    if os.environ.get("GEOM_ONLY", "") == "1":
        return
    timeit("no vis", want_vis=False)
    timeit("no vis, no shadows", want_vis=False, want_shadows=False)
    timeit("no vis/shadows/ao", want_vis=False, want_shadows=False,
           want_ao=False)


if __name__ == "__main__":
    main()
