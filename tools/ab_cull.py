"""Same-process alternating A/B of march-culling knob settings on one
config's fused screen-geometry kernel.

Each variant monkeypatches the knob module globals, rebuilds the
ScenePlan (the knobs are captured as plan fields, so every variant gets
its own jit cache entry), and compiles its own geometry closure; timing
then alternates across the pre-compiled variants so machine-speed drift
hits all variants equally (the ±13% window problem — see README).

Usage: python tools/ab_cull.py [config] [size] [reps]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    # name -> attrs set on madarch_tpu.ops.march before plan build
    "base":    {"S_CULL": False},
    "ladder":  {"S_CULL": True},
    "cand":    {"S_CULL": True, "SEG_CAND": True},
    "dense":   {"S_CULL": True, "SEG_DENSE": True},
    "dense4":  {"S_CULL": True, "SEG_DENSE": True, "CHUNK_S": 4},
    "cand4":   {"S_CULL": True, "SEG_CAND": True, "CHUNK_S": 4},
    "dense2":  {"S_CULL": True, "SEG_DENSE": True, "CHUNK_S": 2},
    "dense1":  {"S_CULL": True, "SEG_DENSE": True, "CHUNK_S": 1},
}
DEFAULTS = {"S_CULL": False, "SEG_CAND": False, "SEG_DENSE": False,
            "CHUNK_S": 8}


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "simple_scene"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    which = os.environ.get("AB_VARIANTS", "base,ladder,cand,dense,dense4")

    import jax
    from functools import partial
    from madarch_tpu.examples import scenes
    from madarch_tpu.ops import march as M
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
    origins, dirs = camera_rays(frag, r.camera.position, r.camera.orientation)
    o = _to_blocks(origins.reshape(-1, 3), size, size)
    d = _to_blocks(dirs.reshape(-1, 3), size, size)
    print(f"backend={jax.default_backend()}", file=sys.stderr)

    fns = {}
    ref_out = None
    for vname in which.split(","):
        attrs = dict(DEFAULTS)
        attrs.update(VARIANTS[vname])
        for k, v in attrs.items():
            setattr(M, k, v)
        ctx = SceneCtx(r.spec, r.scene_data)
        print(f"{vname}: plan="
              f"{[(e.ptype.name, e.kind, e.n, e.n_chunks) for e in ctx.plan.entries]}"
              f" seg={[e.seg for e in ctx.plan.entries]} margin={ctx.plan.margin}",
              file=sys.stderr)
        refl = os.environ.get("AB_REFL", "") == "1"
        f = jax.jit(partial(
            lambda c, oo, dd: c.geometry(oo, dd, r.probes, r.screen_cfg,
                                         want_reflection=refl),
            ctx))
        t0 = time.time()
        out = f(o, d)
        jax.block_until_ready(out)
        print(f"{vname}: compiled in {time.time()-t0:.1f}s", file=sys.stderr)
        # cross-variant sanity: culled variants must agree with base on t
        if ref_out is None:
            ref_out = out
        else:
            import numpy as np
            hitm = np.asarray(ref_out["hit"]).astype(bool) \
                & np.asarray(out["hit"]).astype(bool)
            dt_max = float((np.abs(np.asarray(out["t"])
                                   - np.asarray(ref_out["t"]))
                            * hitm).max())
            hit_diff = float((np.asarray(out["hit"])
                              != np.asarray(ref_out["hit"])).sum())
            print(f"{vname}: vs base  max|dt|={dt_max:.2e} "
                  f"hit-flips={hit_diff:.0f}", file=sys.stderr)
        fns[vname] = f
    for k, v in DEFAULTS.items():
        setattr(M, k, v)

    times = {v: [] for v in fns}
    for rep in range(reps):
        for vname, f in fns.items():
            t0 = time.time()
            out = f(o, d)
            jax.block_until_ready(out)
            times[vname].append((time.time() - t0) * 1e3)
    summary = {}
    for vname, ts in times.items():
        ts = sorted(ts)
        med = ts[len(ts) // 2]
        summary[vname] = round(med, 1)
        print(f"{vname:8s} median {med:7.1f} ms   runs "
              f"{[round(t, 1) for t in ts]}", file=sys.stderr)
    print(json.dumps({"config": name, "size": size, "geom_ms": summary}))


if __name__ == "__main__":
    main()
