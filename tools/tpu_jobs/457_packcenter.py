import gc, time, sys
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
import unitygaussiansplatting_tpu.models.renderer as ren_mod
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

N = 6_100_000
W, H = 1200, 797
scene = jax.device_put(sphere_scene(n=N, seed=0).activate())
jax.block_until_ready(scene)
cam = Camera.look_at(eye=[0,0.6,-3.0], target=[0,0,0], up=[0,1,0], fov_y_deg=47.0, width=W, height=H)
for pc in (False, True):
    cfg = RasterizeConfig(pair_multiplier=4.25, pack_axes_f16=True,
                          pack_grads_bf16=True, pack_center_u32=pc)
    def frame(g, s, cfg=cfg):
        return ren_mod.render(g, cam, RenderSettings(sh_order=3, opacity_scale=s), cfg, backend="pallas")
    f_fwd = jax.jit(frame)
    x = jax.block_until_ready(f_fwd(scene, jnp.float32(1.0)))
    t0 = time.perf_counter()
    for i in range(6):
        x = f_fwd(scene, jnp.float32(1.0 + 0.001*i))
    jax.block_until_ready(x)
    print(f"fwd pack_center={pc}: {(time.perf_counter()-t0)/6*1e3:.1f} ms (mean {float(x.mean()):.4f})", flush=True)
    del x, f_fwd; gc.collect()
    def loss(g, s, cfg=cfg):
        return jnp.mean(ren_mod.render(g, cam, RenderSettings(sh_order=3, opacity_scale=s), cfg, backend="pallas"))
    fb = jax.jit(jax.grad(loss))
    g0 = jax.block_until_ready(fb(scene, jnp.float32(1.0)))
    t0 = time.perf_counter()
    for i in range(4):
        g0 = fb(scene, jnp.float32(1.0 + 0.001*i))
    jax.block_until_ready(g0)
    print(f"fwd+bwd pack_center={pc}: {(time.perf_counter()-t0)/4*1e3:.1f} ms", flush=True)
    leaves = jax.tree_util.tree_leaves(g0)
    print("  grad finite:", all(bool(jnp.isfinite(l).all()) for l in leaves), flush=True)
    del g0, fb; gc.collect(); jax.clear_caches(); gc.collect()
del scene; gc.collect(); jax.clear_caches(); gc.collect()
print("457 done", flush=True)
