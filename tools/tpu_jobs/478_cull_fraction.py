import gc, time, sys
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.ops import pair_expand as pe
from unitygaussiansplatting_tpu.ops.binning import depth_key_bits, pair_budget, tile_grid
from unitygaussiansplatting_tpu.ops.projection import project_splats
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene_device, outdoor_scene

# How much of the static pair budget K is wasted at bicycle scale?
#   real      = slots of live rect cells that SURVIVE the ellipse cull
#   culled    = enumerated rect cells the in-kernel ellipse cull sentinels
#   padding   = budget slots beyond demand + dead-splat sentinels
# A row-tight (per-tile-row x-range) enumeration could remove `culled`
# from every pair-sized stage; this measures the ceiling of that idea.
W, H = 1200, 797
cam = Camera.look_at(eye=[0, 0.6, -3.0], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=W, height=H)
cam2 = Camera.look_at(eye=[0.0, 0.4, -5.0], target=[0.0, -0.2, 0.0], up=[0, 1, 0],
                      fov_y_deg=47.0, width=W, height=H)
config = RasterizeConfig(pair_multiplier=4.25, pack_axes_f16=True,
                         pack_center_u32=True, pack_color_rgba8=True)
tiles_x, tiles_y = tile_grid(W, H, config)
num_tiles = tiles_x * tiles_y
db = depth_key_bits(num_tiles)

def stats(scene, camera, mult):
    cfg = RasterizeConfig(pair_multiplier=mult, pack_axes_f16=True,
                          pack_center_u32=True, pack_color_rgba8=True)
    n = scene.means.shape[0]
    k = pair_budget(n, cfg)
    @jax.jit
    def go(g):
        proj = project_splats(g, camera, RenderSettings(sh_order=3))
        binning, fields, num_real = pe.bin_and_prepare(proj, W, H, cfg)
        key = binning.pair_tile  # (K,) tile ids, num_tiles = sentinel
        surviving = jnp.sum((key < num_tiles).astype(jnp.int32))
        return binning.num_pairs, num_real, surviving
    slots, real, surv = go(scene)
    slots, real, surv = int(slots), int(real), int(surv)
    print(f"  budget K={k}  slot_demand={slots}  rect_cells={real}  "
          f"survive_cull={surv}  culled={real - surv} "
          f"({(real - surv) / max(real,1) * 100:.1f}% of rect cells; "
          f"{(k - surv) / k * 100:.1f}% of K is waste)", flush=True)

N = 6_100_000
print("sphere scene:", flush=True)
s = sphere_scene_device(n=N, seed=0).activate()
jax.block_until_ready(s)
stats(s, cam, 4.25)
del s; gc.collect()
print("outdoor scene:", flush=True)
o = jax.device_put(outdoor_scene(n=N, seed=1).activate())
jax.block_until_ready(o)
stats(o, cam2, 2.5)
del o; gc.collect(); jax.clear_caches(); gc.collect()
print("478 done", flush=True)
