"""r5 perf probes: pair budget 4.0, composite chunk_size 256, bwd bisect.

Each probe is a full fused frame (or bwd) at bench config with ONE knob
changed, so results translate directly to bench.py deltas.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("unitygaussiansplatting_tpu"):
        sys.modules.pop(m)

import jax
import jax.numpy as jnp

from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.models.renderer import render
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene_device

W, H = 1200, 797
N = 6_100_000
base = dict(pack_axes_f16=True, pack_grads_bf16=True,
            pack_center_u32=True, pack_color_rgba8=True)
cam = Camera.look_at(eye=[0, 0.6, -3], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=W, height=H)
scene = sphere_scene_device(n=N, seed=0).activate()
jax.block_until_ready(scene)


def t(fn, *args, reps=4):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3


def frame_fns(cfg):
    @jax.jit
    def fwd(g, s):
        return render(g, cam, RenderSettings(sh_order=3, opacity_scale=s),
                      cfg, backend="pallas")

    @jax.jit
    def fwdbwd(g, s):
        def loss(gg):
            return jnp.mean(render(
                gg, cam, RenderSettings(sh_order=3, opacity_scale=s),
                cfg, backend="pallas"))
        return jax.grad(loss)(g)

    return fwd, fwdbwd


for name, cfg in [
    ("baseline mult=4.25 chunk=128", RasterizeConfig(pair_multiplier=4.25, **base)),
    ("mult=4.0", RasterizeConfig(pair_multiplier=4.0, **base)),
    ("mult=4.0 chunk=256", RasterizeConfig(pair_multiplier=4.0, chunk_size=256, **base)),
    ("mult=4.25 chunk=256", RasterizeConfig(pair_multiplier=4.25, chunk_size=256, **base)),
]:
    fwd, fwdbwd = frame_fns(cfg)
    ms_f = t(fwd, scene, jnp.float32(1.0))
    ms_fb = t(fwdbwd, scene, jnp.float32(1.0))
    print(f"{name}: fwd {ms_f:.1f} ms, fwd+bwd {ms_fb:.1f} ms", flush=True)

# Overflow check at mult=4.0: true demand vs budget across the opacity range
# the bench sweeps (1.0 .. 1.007).
from unitygaussiansplatting_tpu.models.renderer import render_with_stats

cfg40 = RasterizeConfig(pair_multiplier=4.0, **base)

@jax.jit
def demand(g, s):
    _, stats = render_with_stats(
        g, cam, RenderSettings(sh_order=3, opacity_scale=s), cfg40,
        backend="pallas")
    return stats.num_pairs

for s in (1.0, 1.007, 1.05):
    d = int(demand(scene, jnp.float32(s)))
    print(f"demand @opacity {s}: {d} vs budget {int(N * 4.0)} "
          f"({d / (N * 4.0):.3f})", flush=True)

# bwd sub-phase bisect at bench config (what does the 420 ms bwd consist of)
from unitygaussiansplatting_tpu.ops import rasterize_pallas as rp
from unitygaussiansplatting_tpu.ops.pair_expand import bin_and_prepare
from unitygaussiansplatting_tpu.ops.projection import project_splats
from unitygaussiansplatting_tpu.ops.rasterize_pallas_bwd import (
    composite_pallas_bwd, pair_gradients_to_splats, steps_to_pair_gradients,
)
from unitygaussiansplatting_tpu.ops.binning import tile_grid

cfg = RasterizeConfig(pair_multiplier=4.25, **base)
tiles_x, tiles_y = tile_grid(W, H, cfg)
num_tiles = tiles_x * tiles_y
proj = jax.jit(lambda g: project_splats(g, cam, RenderSettings(sh_order=3)))(scene)
binning, fields, _ = jax.jit(lambda p: bin_and_prepare(p, W, H, cfg))(proj)
schedule = jax.jit(lambda b: rp.build_schedule(b, num_tiles, cfg.chunk_size))(binning)
_, raw = jax.jit(lambda f, s: rp.composite_pallas(
    f, s, W, H, cfg, return_raw=True))(fields, schedule)
dout = jnp.ones((H, W, 4), jnp.float32) / (H * W)
dout_raw = jax.jit(lambda g: rp.tile_layout(g, W, H, cfg))(dout)
jax.block_until_ready((raw, dout_raw))

ms = t(jax.jit(lambda g: rp.tile_layout(g, W, H, cfg)), dout)
print(f"bwd tile_layout: {ms:.1f} ms", flush=True)
bwd_kernel = jax.jit(lambda f, s, r, d: composite_pallas_bwd(f, s, r, d, W, H, cfg))
ms = t(bwd_kernel, fields, schedule, raw, dout_raw)
print(f"bwd composite kernel: {ms:.1f} ms", flush=True)
dsteps = bwd_kernel(fields, schedule, raw, dout_raw)
s2p = jax.jit(lambda d: steps_to_pair_gradients(d, binning, num_tiles, cfg.chunk_size))
ms = t(s2p, dsteps)
print(f"bwd steps_to_pair_gradients: {ms:.1f} ms", flush=True)
dpairs = s2p(dsteps)
p2s = jax.jit(lambda d, pr, rc: pair_gradients_to_splats(
    d, binning._replace(pair_rank=pr), rc, N, identity_order=True,
    pack_bf16=True))
ms = t(p2s, dpairs, binning.pair_rank, binning.rank_counts)
print(f"bwd pair_gradients_to_splats (sort+reduce): {ms:.1f} ms", flush=True)
