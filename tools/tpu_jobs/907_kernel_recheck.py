import gc, time, sys
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.models.renderer import render
from unitygaussiansplatting_tpu.ops.projection import project_splats
from unitygaussiansplatting_tpu.ops.pair_expand import bin_and_prepare
from unitygaussiansplatting_tpu.ops import rasterize_pallas as rp
from unitygaussiansplatting_tpu.ops.binning import tile_grid
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene_device

# 905 follow-up: kernel-only measured 0.1 ms, which cannot dispatch a
# 205k-step grid — either block_until_ready under-syncs on the tunneled
# backend for repeated identical dispatches, or the 124 ms phase number
# was an artifact.  Control: the full fused frame (known ~425 ms from the
# r4 rehearsal), then composite-only with varied inputs + forced fetch.

N, W, H = 6_100_000, 1200, 797
scene = sphere_scene_device(n=N, seed=0).activate()
jax.block_until_ready(scene)
cam = Camera.look_at(eye=[0, 0.6, -3.0], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=W, height=H)
config = RasterizeConfig(pair_multiplier=4.25, pack_axes_f16=True,
                         pack_grads_bf16=True, pack_center_u32=True,
                         pack_color_rgba8=True)
settings = RenderSettings(sh_order=3)
tiles_x, tiles_y = tile_grid(W, H, config)
num_tiles = tiles_x * tiles_y

# Control: full fused frame, opacity varied per rep (bench.py's pattern).
frame = jax.jit(lambda g, s: render(
    g, cam, RenderSettings(sh_order=3, opacity_scale=s), config,
    backend="pallas"))
img = jax.block_until_ready(frame(scene, jnp.float32(1.0)))
t0 = time.perf_counter()
for i in range(4):
    img = frame(scene, jnp.float32(1.0 + 0.001 * i))
jax.block_until_ready(img)
print(f"full fused frame: {(time.perf_counter() - t0) / 4 * 1e3:.1f} ms",
      flush=True)

proj = jax.jit(lambda g: project_splats(g, cam, settings))(scene)
binning, fields, _ = jax.jit(lambda p: bin_and_prepare(p, W, H, config))(proj)
schedule = jax.jit(
    lambda b: rp.build_schedule(b, num_tiles, config.chunk_size))(binning)
jax.block_until_ready((fields, schedule))

# Composite-only, but perturb fields per rep (scale opacity row bits? too
# invasive) — instead pass a varying dummy added to a zero lane so XLA sees
# distinct inputs, and fetch a scalar from the result each rep.
comp = jax.jit(lambda f, s: rp.composite_pallas(f, s, W, H, config,
                                                return_raw=True)[1])
raw = jax.block_until_ready(comp(fields, schedule))
t0 = time.perf_counter()
for i in range(4):
    raw = comp(fields, schedule)
    _ = float(jnp.sum(raw[0]))  # force full completion + fetch
print(f"composite kernel only (fetch-synced): "
      f"{(time.perf_counter() - t0) / 4 * 1e3:.1f} ms", flush=True)
print("raw mean:", float(jnp.mean(raw[: num_tiles])), flush=True)

# Same but with block_until_ready (905's sync) for comparison.
t0 = time.perf_counter()
for i in range(4):
    raw = comp(fields, schedule)
jax.block_until_ready(raw)
print(f"composite kernel only (block_until_ready): "
      f"{(time.perf_counter() - t0) / 4 * 1e3:.1f} ms", flush=True)

# Untile isolated, fetch-synced.
def untile_current(out):
    img = out[:num_tiles].reshape(tiles_y, tiles_x, 4, config.tile_h, config.tile_w)
    img = img.transpose(0, 3, 1, 4, 2).reshape(
        tiles_y * config.tile_h, tiles_x * config.tile_w, 4)
    return img[:H, :W]
u = jax.jit(untile_current)
x = jax.block_until_ready(u(raw))
t0 = time.perf_counter()
for i in range(4):
    x = u(raw)
    _ = float(jnp.sum(x[0]))
print(f"untile current (fetch-synced): "
      f"{(time.perf_counter() - t0) / 4 * 1e3:.1f} ms", flush=True)

del raw, x, img, fields, schedule, binning, proj, scene
gc.collect(); jax.clear_caches(); gc.collect()
print("907 done", flush=True)
