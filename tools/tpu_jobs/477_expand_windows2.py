import gc, time, sys, dataclasses
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.models.renderer import render
from unitygaussiansplatting_tpu.ops import pair_expand as pe
from unitygaussiansplatting_tpu.ops.projection import project_splats
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene_device

# W-window expansion kernel: W=1/2/4/8 at bicycle scale, then the fused
# fwd + fwd_bwd frame at the winner.
N = 6_100_000
W, H = 1200, 797
scene = sphere_scene_device(n=N, seed=0).activate()
jax.block_until_ready(scene)
cam = Camera.look_at(eye=[0, 0.6, -3.0], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=W, height=H)
settings = RenderSettings(sh_order=3)

def timeit(name, f, *args, reps=6):
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)
    del o; gc.collect()

proj = jax.jit(lambda g: project_splats(g, cam, settings))(scene)
jax.block_until_ready(proj)

for wins in (1, 2, 4, 8):
    cfg = RasterizeConfig(pair_multiplier=4.25, pack_axes_f16=True,
                          pack_center_u32=True, pack_color_rgba8=True,
                          expand_windows=wins)
    k = int(6_100_000 * 4.25) // (512 * wins) * (512 * wins)
    try:
        f = jax.jit(lambda p, c=cfg: pe.bin_and_prepare(p, W, H, c))
        timeit(f"bin_and_prepare W={wins}", f, proj)
    except Exception as e:
        print(f"W={wins} FAILED: {type(e).__name__} {str(e)[:300]}", flush=True)
del proj; gc.collect()

# Fused frames at the best W (assume 4; compare against W=1 too).
for wins in (1, 4):
    cfg = RasterizeConfig(pair_multiplier=4.25, pack_axes_f16=True,
                          pack_grads_bf16=True, pack_center_u32=True,
                          pack_color_rgba8=True, expand_windows=wins)
    frame = jax.jit(lambda g, s, c=cfg: render(
        g, cam, RenderSettings(sh_order=3, opacity_scale=s), c, backend="pallas"))
    timeit(f"fused fwd W={wins}", frame, scene, jnp.float32(1.0))
    fb = jax.jit(lambda g, s, c=cfg: jax.grad(
        lambda gg: jnp.mean(render(gg, cam, RenderSettings(sh_order=3, opacity_scale=s), c, backend="pallas")))(g))
    timeit(f"fused fwd+bwd W={wins}", fb, scene, jnp.float32(1.0))
    del frame, fb; gc.collect()

del scene
gc.collect(); jax.clear_caches(); gc.collect()
print("477 done", flush=True)
