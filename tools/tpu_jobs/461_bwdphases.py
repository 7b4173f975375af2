import gc, time, sys
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
import unitygaussiansplatting_tpu.ops.rasterize_pallas as rp
from unitygaussiansplatting_tpu.ops.rasterize_pallas_bwd import (
    composite_pallas_bwd, pair_gradients_to_splats, steps_to_pair_gradients,
)
from unitygaussiansplatting_tpu.ops.pair_expand import bin_and_prepare
from unitygaussiansplatting_tpu.ops.projection import project_splats
from unitygaussiansplatting_tpu.ops.binning import tile_grid
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

# Backward phase breakdown at bicycle scale (bench config + pack_center):
# where do the fwd+bwd-minus-fwd 577 ms live?
N = 6_100_000
W, H = 1200, 797
cfg = RasterizeConfig(pair_multiplier=4.25, pack_axes_f16=True,
                      pack_grads_bf16=True, pack_center_u32=True)
scene = jax.device_put(sphere_scene(n=N, seed=0).activate())
jax.block_until_ready(scene)
cam = Camera.look_at(eye=[0, 0.6, -3.0], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=W, height=H)
tiles_x, tiles_y = tile_grid(W, H, cfg)
num_tiles = tiles_x * tiles_y

def timeit(name, fn, *args, reps=3):
    f = jax.jit(fn)
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)
    r = o
    del o; gc.collect()
    return r

settings = RenderSettings(sh_order=3)
proj = timeit("project", lambda g: project_splats(g, cam, settings), scene)
binning, fields, _nr = timeit(
    "bin_and_prepare WITH ids (train fwd)",
    lambda p: bin_and_prepare(p, W, H, cfg, need_splat_ids=True), proj)
timeit("bin_and_prepare no ids (infer fwd)",
       lambda p: bin_and_prepare(p, W, H, cfg, need_splat_ids=False)[1], proj)
schedule = timeit("schedule", lambda b: rp.build_schedule(b, num_tiles, cfg.chunk_size), binning)
img_raw = timeit("composite fwd (raw)",
                 lambda f, s: rp.composite_pallas(f, s, W, H, cfg, return_raw=True)[1],
                 fields, schedule)
dout = jnp.ones_like(img_raw)
dsteps = timeit("composite bwd kernel",
                lambda f, s, r, d: composite_pallas_bwd(f, s, r, d, W, H, cfg),
                fields, schedule, img_raw, dout)
dpairs = timeit("steps_to_pair_gradients",
                lambda ds, b: steps_to_pair_gradients(ds, b, num_tiles, cfg.chunk_size),
                dsteps, binning)
timeit("pair_gradients_to_splats (sort+run-reduce)",
       lambda dp, b: pair_gradients_to_splats(
           dp, b, b.rank_counts, N, identity_order=True, pack_bf16=True),
       dpairs, binning)

# Param-chain remainder: full grad minus rasterize pieces.
import unitygaussiansplatting_tpu.models.renderer as ren_mod
def loss(g, s):
    return jnp.mean(ren_mod.render(g, cam, RenderSettings(sh_order=3, opacity_scale=s), cfg, backend="pallas"))
timeit("full fwd+bwd", lambda g, s: jax.grad(loss)(g, s), scene, jnp.float32(1.0))
del proj, binning, fields, schedule, img_raw, dout, dsteps, dpairs, scene
gc.collect(); jax.clear_caches(); gc.collect()
print("461 done", flush=True)
