import gc, time, sys
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
from unitygaussiansplatting_tpu.io.asset import encode_asset
from unitygaussiansplatting_tpu.io.bridge import gaussians_to_input_splats
from unitygaussiansplatting_tpu.io import device_asset as DA
from unitygaussiansplatting_tpu.io import formats as F
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

# Bisect the 352 ms decode_device: cumulative output subsets of the SAME
# jitted function, so dead pieces are DCE'd.  Sums are forced through a
# scalar reduce to defeat lazy-output illusions.
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

def reduce_of(*fields):
    def fn(d):
        g = DA.decode_device(d)
        return sum(jnp.sum(getattr(g, f)) for f in fields)
    return fn

timeit("decode -> sum(means)", reduce_of("means"), da)
timeit("decode -> sum(means, scales)", reduce_of("means", "scales"), da)
timeit("decode -> sum(+rotations)", reduce_of("means", "scales", "rotations"), da)
timeit("decode -> sum(+color+op)", reduce_of("means", "scales", "rotations", "base_color", "opacities"), da)
timeit("decode -> sum(ALL incl sh)", reduce_of("means", "scales", "rotations", "base_color", "opacities", "sh"), da)
timeit("decode full outputs", DA.decode_device, da)
timeit("decode full outputs (again)", DA.decode_device, da)
del da, asset; gc.collect(); jax.clear_caches(); gc.collect()
print("467 done", flush=True)
