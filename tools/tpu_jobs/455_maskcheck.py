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

# 1) defaults: fwd+bwd cost with the run-reduce validity mask (expect ~= 1076 ms)
cfg = RasterizeConfig(pair_multiplier=4.25, pack_axes_f16=True, pack_grads_bf16=True)
def loss(g, s, cfg=cfg):
    return jnp.mean(ren_mod.render(g, cam, RenderSettings(sh_order=3, opacity_scale=s), cfg, backend="pallas"))
fb = jax.jit(jax.grad(loss))
g0 = jax.block_until_ready(fb(scene, jnp.float32(1.0)))
t0 = time.perf_counter()
for i in range(4):
    g0 = fb(scene, jnp.float32(1.0 + 0.001*i))
jax.block_until_ready(g0)
print(f"fwd+bwd with mask (defaults): {(time.perf_counter()-t0)/4*1e3:.1f} ms", flush=True)
leaves = jax.tree_util.tree_leaves(g0)
print("grad finite:", all(bool(jnp.isfinite(l).all()) for l in leaves),
      "mean|g_means|:", float(jnp.abs(g0.means).mean()), flush=True)
del g0, fb; gc.collect()

# 2) deliberate overflow (budget < demand): truncated splats must come back
#    exact-zero, everything finite (pre-fix this read uninitialized HBM).
cfg2 = RasterizeConfig(pair_multiplier=3.2, pack_axes_f16=True, pack_grads_bf16=True)
def loss2(g, s):
    return jnp.mean(ren_mod.render(g, cam, RenderSettings(sh_order=3, opacity_scale=s), cfg2, backend="pallas"))
fb2 = jax.jit(jax.grad(loss2))
g2 = jax.block_until_ready(fb2(scene, jnp.float32(1.0)))
leaves = jax.tree_util.tree_leaves(g2)
fin = all(bool(jnp.isfinite(l).all()) for l in leaves)
nz = float(jnp.mean((jnp.abs(g2.means).sum(axis=1) == 0).astype(jnp.float32)))
print(f"overflow run: finite={fin} zero-grad splat fraction={nz:.4f} "
      f"mean|g_means|={float(jnp.abs(g2.means).mean()):.3e}", flush=True)
del g2, fb2, scene; gc.collect(); jax.clear_caches(); gc.collect()
print("455 done", flush=True)
