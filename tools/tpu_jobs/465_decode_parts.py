import gc, time, sys
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
from unitygaussiansplatting_tpu.io.asset import encode_asset
from unitygaussiansplatting_tpu.io.bridge import gaussians_to_input_splats
from unitygaussiansplatting_tpu.io import device_asset as DA
from unitygaussiansplatting_tpu.io import formats as F
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

# Which part of decode_device costs 352 ms at 6.1M Medium?
N = 6_100_000
scene = jax.device_put(sphere_scene(n=N, seed=0).activate())
jax.block_until_ready(scene)
asset = encode_asset(gaussians_to_input_splats(scene))
da = DA.device_asset_from_asset(asset)
jax.block_until_ready(da.pos_q)
del scene; gc.collect()

def timeit(name, fn, *args, reps=4):
    f = jax.jit(fn)
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)
    del o; gc.collect()

timeit("pos norm11", lambda q: DA._dec_vector_j(q, da.pos_format), da.pos_q)
timeit("scale norm11", lambda q: DA._dec_vector_j(q, da.scale_format), da.scale_q)
timeit("rot unpack", lambda q: jnp.stack(
    [(q & 1023).astype(jnp.float32) / 1023.0,
     ((q >> 10) & 1023).astype(jnp.float32) / 1023.0,
     ((q >> 20) & 1023).astype(jnp.float32) / 1023.0,
     ((q >> 30) & 3).astype(jnp.float32) / 3.0], axis=-1), da.rot_q)
timeit("color norm8", lambda u: jnp.stack(
    [(u & 0xFF).astype(jnp.float32), ((u >> 8) & 0xFF).astype(jnp.float32),
     ((u >> 16) & 0xFF).astype(jnp.float32), (u >> 24).astype(jnp.float32)],
    axis=-1) / 255.0, da.color_q)
timeit("sh norm6 decode", lambda q: DA._dec_norm565_j(q.reshape(-1)).reshape(N, 15, 3), da.sh_q)
timeit("full decode_device", DA.decode_device, da)

# Strawman: decode with sh SKIPPED (zeros) to isolate the sh share.
import dataclasses
def decode_no_sh(d):
    g = DA.decode_device(d)
    return g.means, g.scales, g.opacities
timeit("decode (means/scales/op outputs only)", decode_no_sh, da)
del da, asset; gc.collect(); jax.clear_caches(); gc.collect()
print("465 done", flush=True)
