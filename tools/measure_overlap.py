"""Tile-overlap / depth-complexity statistics of the synthetic scenes.

VERDICT r2 weak #6: ``outdoor_scene``'s claim of capture-like overlap
statistics was never validated.  This measures, for each scene at the
bench camera, the per-splat tile-rect size distribution (the pair
multiplier driver) and per-tile pair depth complexity, so the bench's
pair budgets trace to recorded numbers (docs/architecture.md).

Run: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/measure_overlap.py [n]
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.ops.binning import tile_grid, tile_rects
from unitygaussiansplatting_tpu.ops.projection import project_splats
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils import synthetic


def stats(name, raw, cam, config):
    g = raw.activate()
    proj = jax.jit(lambda g: project_splats(g, cam, RenderSettings(sh_order=0)))(g)
    x0, y0, nx, ny, counts, valid = jax.jit(
        lambda p: tile_rects(p, cam.width, cam.height, config)
    )(proj)
    c = np.asarray(counts)
    v = np.asarray(valid) & (c > 0)
    c = c[v]
    n = raw.num_splats
    hist = np.bincount(np.clip(c, 0, 16), minlength=17)
    print(
        f"{name}: visible {v.mean():.3f}, pairs/splat mean {c.sum()/n:.2f} "
        f"(visible-only {c.mean():.2f}), p50 {np.percentile(c, 50):.0f} "
        f"p95 {np.percentile(c, 95):.0f} p99 {np.percentile(c, 99):.0f} "
        f"max {c.max()}"
    )
    print(f"  rect-size histogram (1..16+): {(hist[1:] / max(c.size,1)).round(3)}")
    # Per-tile depth complexity: pairs per tile from the rect coverage.
    tiles_x, tiles_y = tile_grid(cam.width, cam.height, config)
    x0v, y0v = np.asarray(x0)[v], np.asarray(y0)[v]
    nxv, nyv = np.asarray(nx)[v], np.asarray(ny)[v]
    grid = np.zeros((tiles_y + 1, tiles_x + 1), np.int64)
    np.add.at(grid, (y0v, x0v), 1)
    np.add.at(grid, (y0v + nyv, x0v), -1)
    np.add.at(grid, (y0v, x0v + nxv), -1)
    np.add.at(grid, (y0v + nyv, x0v + nxv), 1)
    per_tile = np.cumsum(np.cumsum(grid, axis=0), axis=1)[:tiles_y, :tiles_x]
    print(
        f"  per-tile pairs: mean {per_tile.mean():.0f} p50 "
        f"{np.percentile(per_tile, 50):.0f} p95 {np.percentile(per_tile, 95):.0f} "
        f"max {per_tile.max()}"
    )


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    config = RasterizeConfig()
    W, H = 1200, 797
    cam_sphere = Camera.look_at(
        eye=[0, 0.6, -3.0], target=[0, 0, 0], up=[0, 1, 0],
        fov_y_deg=47.0, width=W, height=H,
    )
    cam_out = Camera.look_at(
        eye=[0, 0.4, -5.0], target=[0, -0.2, 0], up=[0, 1, 0],
        fov_y_deg=47.0, width=W, height=H,
    )
    cam_cap = Camera.look_at(
        eye=[6.5, 2.2, -8.0], target=[0, 0.3, 0], up=[0, 1, 0],
        fov_y_deg=47.0, width=W, height=H,
    )
    stats("sphere_scene ", synthetic.sphere_scene(n=n, seed=0), cam_sphere, config)
    stats("outdoor_scene", synthetic.outdoor_scene(n=n, seed=1), cam_out, config)
    stats("captured_scene", synthetic.captured_scene(n=n, seed=3), cam_cap, config)


if __name__ == "__main__":
    main()
