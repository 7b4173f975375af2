import gc, time, sys
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.ops import rasterize_pallas as rp
from unitygaussiansplatting_tpu.ops.binning import bin_splats, tile_grid
from unitygaussiansplatting_tpu.ops.pair_expand import bin_and_prepare
from unitygaussiansplatting_tpu.ops.projection import project_splats
from unitygaussiansplatting_tpu.ops.rasterize_tiles import rasterize_tiles_jax
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene_device

# tpu_check found pallas-vs-xla max |diff| 2.3e-2 ON CHIP in the exact
# config (CPU tests enforce bit-agreement).  Bisect: which backend moved,
# and which STAGE (expansion kernel vs composite kernel vs XLA tile path)?
N = 100_000
W, H = 640, 400
cfg = RasterizeConfig(pair_multiplier=6.0, pack_axes_f16=True)
scene = sphere_scene_device(n=N, seed=11).activate()
cam = Camera.look_at(eye=[0, 0.6, -3.0], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=W, height=H)
proj = jax.jit(lambda g: project_splats(g, cam, RenderSettings(sh_order=3)))(scene)
proj = jax.tree_util.tree_map(lambda x: np.asarray(x), proj)
tiles_x, tiles_y = tile_grid(W, H, cfg)

def mx(a, b):
    return float(np.abs(np.asarray(a) - np.asarray(b)).max())

# On-TPU XLA tile path and fused pallas path.
p_tpu = jax.device_put(proj)
img_x_tpu = jax.jit(lambda p: rasterize_tiles_jax(
    p, bin_splats(p, W, H, cfg), W, H, cfg))(p_tpu)
img_p_tpu = jax.jit(lambda p: rp.rasterize_tiles_pallas(p, W, H, cfg))(p_tpu)
jax.block_until_ready((img_x_tpu, img_p_tpu))

# Same inputs on the CPU backend (ground truth: tests pin agreement there).
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    p_cpu = jax.device_put(proj, cpu)
    img_x_cpu = jax.jit(lambda p: rasterize_tiles_jax(
        p, bin_splats(p, W, H, cfg), W, H, cfg))(p_cpu)
    img_p_int = jax.jit(lambda p: rp.rasterize_tiles_pallas(
        p, W, H, cfg, interpret=True))(p_cpu)
    jax.block_until_ready((img_x_cpu, img_p_int))

print(f"xla_tpu  vs xla_cpu : {mx(img_x_tpu, img_x_cpu):.3e}", flush=True)
print(f"pal_tpu  vs xla_cpu : {mx(img_p_tpu, img_x_cpu):.3e}", flush=True)
print(f"pal_int  vs xla_cpu : {mx(img_p_int, img_x_cpu):.3e}", flush=True)
print(f"pal_tpu  vs pal_int : {mx(img_p_tpu, img_p_int):.3e}", flush=True)
print(f"pal_tpu  vs xla_tpu : {mx(img_p_tpu, img_x_tpu):.3e}", flush=True)

# Stage bisect: expansion kernel outputs, TPU vs interpret.
b_tpu, f_tpu, nr_tpu = jax.jit(lambda p: bin_and_prepare(p, W, H, cfg))(p_tpu)
with jax.default_device(cpu):
    b_int, f_int, nr_int = jax.jit(lambda p: bin_and_prepare(
        p, W, H, cfg, interpret=True))(jax.device_put(proj, cpu))
print(f"expansion: keys equal {bool((np.asarray(b_tpu.pair_tile) == np.asarray(b_int.pair_tile)).all())}, "
      f"ranks equal {bool((np.asarray(b_tpu.pair_rank) == np.asarray(b_int.pair_rank)).all())}, "
      f"fields max|d| {mx(f_tpu, f_int):.3e}, "
      f"tile_starts equal {bool((np.asarray(b_tpu.tile_starts) == np.asarray(b_int.tile_starts)).all())}",
      flush=True)

# Composite stage: feed the SAME (TPU-produced) fields+schedule to both.
num_tiles = tiles_x * tiles_y
sched = jax.jit(lambda b: rp.build_schedule(b, num_tiles, cfg.chunk_size))(b_tpu)
img_c_tpu = jax.jit(lambda f, s: rp.composite_pallas(f, s, W, H, cfg))(f_tpu, sched)
fields_np = np.asarray(f_tpu)
sched_np = jax.tree_util.tree_map(lambda x: np.asarray(x), sched)
with jax.default_device(cpu):
    img_c_int = jax.jit(lambda f, s: rp.composite_pallas(
        f, s, W, H, cfg, interpret=True))(jax.device_put(fields_np, cpu),
                                          jax.device_put(sched_np, cpu))
print(f"composite (same inputs): tpu vs interpret {mx(img_c_tpu, img_c_int):.3e}", flush=True)

del scene, proj, p_tpu, img_x_tpu, img_p_tpu, b_tpu, f_tpu, sched
gc.collect(); jax.clear_caches(); gc.collect()
print("481 done", flush=True)
