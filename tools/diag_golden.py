"""Diagnose the TPU-kernel-vs-CPU-golden divergence (VERDICT r3 #4).

Renders a config at 128² on the TPU through both the Pallas kernel path
and the XLA path, compares each against the pinned CPU golden, locates the
worst pixel, and traces that pixel's primary ray on both paths to
attribute the difference (silhouette hit/miss flip vs normal divergence
vs systematic drift).

Usage: python tools/diag_golden.py [config]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def render(name, frames):
    from madarch_tpu.examples import scenes
    r = getattr(scenes, name)(width=128, height=128)
    img = np.asarray(r.converge(frames=frames))
    return r, img


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "simple_scene"
    frames = {"global_illumination": 4}.get(name, 2)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "goldens", "images.npz")
    golden = np.load(path)[name]

    r, img_k = render(name, frames)
    os.environ["MADARCH_NO_PALLAS"] = "1"
    _, img_x = render(name, frames)
    del os.environ["MADARCH_NO_PALLAS"]

    for label, img in (("kernel", img_k), ("xla", img_x)):
        d = np.abs(img - golden)
        print(f"{label:7s} vs golden: mean {d.mean():.6f} "
              f"p99 {np.quantile(d, 0.99):.5f} max {d.max():.5f} "
              f"frac>0.05 {(d > 0.05).mean():.6f}")
    dk = np.abs(img_k - golden).max(axis=-1)
    y, x = np.unravel_index(np.argmax(dk), dk.shape)
    print(f"worst kernel pixel: (y={y}, x={x}) diff {dk[y, x]:.4f}")
    print(f"  golden rgb {golden[y, x]}, kernel rgb {img_k[y, x]}, "
          f"xla rgb {img_x[y, x]}")
    # neighborhood: a silhouette pixel has high-contrast neighbors
    y0, y1 = max(y - 1, 0), min(y + 2, 128)
    x0, x1 = max(x - 1, 0), min(x + 2, 128)
    print(f"  3x3 golden luma:\n{golden[y0:y1, x0:x1].mean(axis=-1)}")

    # trace the worst pixel's primary ray on both paths
    from madarch_tpu.render.camera import camera_rays, pixel_grid
    from madarch_tpu.render.context import SceneCtx
    from madarch_tpu.render.raymarch import raycast

    frag = pixel_grid(128, 128)
    origins, dirs = camera_rays(frag, r.camera.position,
                                r.camera.orientation)
    o = origins[y, x][None]
    d = dirs[y, x][None]
    ctx = SceneCtx(r.spec, r.scene_data)
    t_k, hit_k, _ = raycast(ctx, o, d, r.spec.max_dist)
    t_x, hit_x, _ = raycast(ctx.sdf_b, o, d, r.spec.max_dist)
    print(f"  primary ray: kernel t={float(t_k[0]):.5f} "
          f"hit={bool(hit_k[0])} | xla t={float(t_x[0]):.5f} "
          f"hit={bool(hit_x[0])}")
    sd_k = float(ctx.sdf_b(o + t_k[:, None] * d)[0])
    sd_x = float(ctx.sdf_b(o + t_x[:, None] * d)[0])
    print(f"  scene distance at end point: kernel {sd_k:.6f} "
          f"xla {sd_x:.6f}")
    if bool(hit_k[0]) != bool(hit_x[0]):
        print("  => silhouette hit/miss flip between march paths")
    elif abs(float(t_k[0]) - float(t_x[0])) > 1e-3:
        print("  => same hit state, t divergence (step-sequence jitter)")
    else:
        print("  => geometry agrees; divergence is in shading "
              "(normal/AO/shadow path)")


if __name__ == "__main__":
    main()
