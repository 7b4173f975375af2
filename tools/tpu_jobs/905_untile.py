import gc, time, sys
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.ops.projection import project_splats
from unitygaussiansplatting_tpu.ops.pair_expand import bin_and_prepare
from unitygaussiansplatting_tpu.ops import rasterize_pallas as rp
from unitygaussiansplatting_tpu.ops.binning import tile_grid
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene_device

# VERDICT r3 item 2a: how much of the 124 ms "kernel_untile" phase is the
# untile transpose vs the composite kernel itself, and does a planar
# per-channel untile (CLAUDE.md one-stack law) beat the 5-D transpose
# whose output minor dim is 4 (32x lane pad)?

N, W, H = 6_100_000, 1200, 797
scene = sphere_scene_device(n=N, seed=0).activate()
jax.block_until_ready(scene)
cam = Camera.look_at(eye=[0, 0.6, -3.0], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=W, height=H)
config = RasterizeConfig(pair_multiplier=4.25, pack_axes_f16=True,
                         pack_grads_bf16=True, pack_center_u32=True,
                         pack_color_rgba8=True)
settings = RenderSettings(sh_order=3)
th, tw = config.tile_h, config.tile_w
tiles_x, tiles_y = tile_grid(W, H, config)
num_tiles = tiles_x * tiles_y

proj = jax.jit(lambda g: project_splats(g, cam, settings))(scene)
jax.block_until_ready(proj)
binning, fields, _ = jax.jit(
    lambda p: bin_and_prepare(p, W, H, config))(proj)
schedule = jax.jit(
    lambda b: rp.build_schedule(b, num_tiles, config.chunk_size))(binning)
jax.block_until_ready((fields, schedule))


def bench(name, fn, *args, reps=6):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:.1f} ms", flush=True)
    return out, ms


def untile_planar(out):
    t = out[:num_tiles]  # (T, 4, P)
    chans = []
    for ch in range(4):
        x = t[:, ch, :].reshape(tiles_y, tiles_x, th, tw)
        x = x.transpose(0, 2, 1, 3).reshape(tiles_y * th, tiles_x * tw)
        chans.append(x)
    return jnp.stack(chans, axis=-1)[:H, :W]


def untile_current(out):
    img = out[:num_tiles].reshape(tiles_y, tiles_x, 4, th, tw)
    img = img.transpose(0, 3, 1, 4, 2).reshape(tiles_y * th, tiles_x * tw, 4)
    return img[:H, :W]


kernel_only = jax.jit(lambda f, s: rp.composite_pallas(
    f, s, W, H, config, return_raw=True)[1])
raw, ms_k = bench("kernel only (raw out, untile DCEd)", kernel_only, fields, schedule)

cur = jax.jit(lambda f, s: rp.composite_pallas(f, s, W, H, config))
img_cur, ms_cur = bench("kernel + current untile", cur, fields, schedule)

pla = jax.jit(lambda f, s: untile_planar(
    rp.composite_pallas(f, s, W, H, config, return_raw=True)[1]))
img_pla, ms_pla = bench("kernel + planar untile", pla, fields, schedule)

print("image agreement:", float(jnp.abs(img_cur - img_pla).max()), flush=True)

# Isolated untile on a materialized raw buffer.
bench("untile current (isolated)", jax.jit(untile_current), raw)
bench("untile planar (isolated)", jax.jit(untile_planar), raw)

# The backward's inverse (tile_layout) + a planar variant.
g = jnp.ones((H, W, 4), jnp.float32) / (H * W)
bench("tile_layout current (isolated)",
      jax.jit(lambda x: rp.tile_layout(x, W, H, config)), g)


def tile_layout_planar(img):
    pad_y = tiles_y * th - H
    pad_x = tiles_x * tw - W
    padded = jnp.pad(img, ((0, pad_y), (0, pad_x), (0, 0)))
    chans = []
    for ch in range(4):
        x = padded[:, :, ch].reshape(tiles_y, th, tiles_x, tw)
        x = x.transpose(0, 2, 1, 3).reshape(num_tiles, th * tw)
        chans.append(x)
    t = jnp.stack(chans, axis=1)  # (T, 4, P)
    return jnp.concatenate([t, jnp.zeros((1, 4, th * tw), img.dtype)], axis=0)


tl_cur = jax.block_until_ready(jax.jit(lambda x: rp.tile_layout(x, W, H, config))(g))
tl_pla = jax.block_until_ready(jax.jit(tile_layout_planar)(g))
print("tile_layout agreement:", float(jnp.abs(tl_cur - tl_pla).max()), flush=True)
bench("tile_layout planar (isolated)", jax.jit(tile_layout_planar), g)

del raw, img_cur, img_pla, tl_cur, tl_pla, fields, schedule, binning, proj, scene
gc.collect(); jax.clear_caches(); gc.collect()
print("905 done", flush=True)
