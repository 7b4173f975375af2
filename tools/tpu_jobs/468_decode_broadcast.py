import gc, time, sys
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
from unitygaussiansplatting_tpu.io.asset import encode_asset
from unitygaussiansplatting_tpu.io.bridge import gaussians_to_input_splats
from unitygaussiansplatting_tpu.io import device_asset as DA
import unitygaussiansplatting_tpu.models.renderer as ren_mod
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.ops.quaternion import unpack_smallest3
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

# After the broadcast-bitfield rewrite: decode bisect again + stack-vs-
# broadcast microbench + unpack_smallest3 isolation.
N = 6_100_000
scene = sphere_scene(n=N, seed=0).activate()
asset = encode_asset(gaussians_to_input_splats(scene))
del scene; gc.collect()
da = DA.device_asset_from_asset(asset)
jax.block_until_ready(da.pos_q)

def timeit(name, fn, *args, reps=6):
    f = jax.jit(fn)
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)
    del o; gc.collect()

def stack_norm11(u):
    u = u.astype(jnp.uint32)
    return jnp.stack([(u & 2047).astype(jnp.float32) / 2047.0,
                      ((u >> 11) & 1023).astype(jnp.float32) / 1023.0,
                      ((u >> 21) & 2047).astype(jnp.float32) / 2047.0], axis=-1)

timeit("micro: stack norm11 (N,3)", lambda q: jnp.sum(stack_norm11(q)), da.pos_q)
timeit("micro: broadcast norm11 (N,3)", lambda q: jnp.sum(DA._dec_norm11_j(q)), da.pos_q)
timeit("micro: broadcast norm11 MATERIALIZED", DA._dec_norm11_j, da.pos_q)
timeit("micro: unpack_smallest3", lambda q: jnp.sum(unpack_smallest3(
    DA._dec_bitfields_j(q, (0, 10, 20, 30), (1023, 1023, 1023, 3)))), da.rot_q)

def reduce_of(*fields):
    def fn(d):
        g = DA.decode_device(d)
        return sum(jnp.sum(getattr(g, f)) for f in fields)
    return fn

timeit("decode -> sum(means)", reduce_of("means"), da)
timeit("decode -> sum(+scales)", reduce_of("means", "scales"), da)
timeit("decode -> sum(+rot)", reduce_of("means", "scales", "rotations"), da)
timeit("decode -> sum(+color+op)", reduce_of("means", "scales", "rotations", "base_color", "opacities"), da)
timeit("decode full", DA.decode_device, da)
cam = Camera.look_at(eye=[0, 0.6, -3.0], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=1200, height=797)
cfg = RasterizeConfig(pair_multiplier=4.25, pack_axes_f16=True,
                      pack_grads_bf16=True, pack_center_u32=True,
                      pack_color_rgba8=True)
timeit("DA fwd render", lambda a, s: ren_mod.render(
    a, cam, RenderSettings(sh_order=3, opacity_scale=s), cfg, backend="pallas"),
    da, jnp.float32(1.0))
del da, asset; gc.collect(); jax.clear_caches(); gc.collect()
print("468 done", flush=True)
