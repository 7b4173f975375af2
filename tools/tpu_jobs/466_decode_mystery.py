import gc, time, sys
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
import unitygaussiansplatting_tpu.models.renderer as ren_mod
from unitygaussiansplatting_tpu.io.asset import encode_asset
from unitygaussiansplatting_tpu.io.bridge import gaussians_to_input_splats
from unitygaussiansplatting_tpu.io.device_asset import decode_device, device_asset_from_asset
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

# 464 measured decode_device at 352 ms; 465 at 0.5 ms.  Replicate 464's
# exact sequence and inspect leaf placement to find the difference.
N = 6_100_000
W, H = 1200, 797
scene = jax.device_put(sphere_scene(n=N, seed=0).activate())
jax.block_until_ready(scene)
cam = Camera.look_at(eye=[0, 0.6, -3.0], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=W, height=H)
asset = encode_asset(gaussians_to_input_splats(scene))
da = device_asset_from_asset(asset)
jax.block_until_ready(da.pos_q)
import jax.tree_util as jtu
for path, leaf in jtu.tree_flatten_with_path(da)[0]:
    kind = type(leaf).__name__
    dev = getattr(leaf, "devices", lambda: "host")()
    print(f"  leaf {jtu.keystr(path)}: {kind} {getattr(leaf, 'shape', None)} {dev}", flush=True)

def timeit(name, fn, *args, reps=4):
    f = jax.jit(fn)
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)
    del o; gc.collect()

timeit("decode_device (scene alive)", decode_device, da)
del scene; gc.collect()
timeit("decode_device (scene freed)", decode_device, da)
cfg = RasterizeConfig(pair_multiplier=4.25, pack_axes_f16=True,
                      pack_grads_bf16=True, pack_center_u32=True,
                      pack_color_rgba8=True)
timeit("DA fwd render", lambda a, s: ren_mod.render(
    a, cam, RenderSettings(sh_order=3, opacity_scale=s), cfg, backend="pallas"),
    da, jnp.float32(1.0))
del da, asset; gc.collect(); jax.clear_caches(); gc.collect()
print("466 done", flush=True)
