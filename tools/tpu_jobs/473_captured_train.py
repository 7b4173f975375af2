import gc, time, sys
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
import unitygaussiansplatting_tpu.models.renderer as ren_mod
from unitygaussiansplatting_tpu.models.trainer import photometric_loss
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.utils.synthetic import captured_scene

# Verified training-step cost on the capture-class scene (the actual
# training workload shape): full photometric loss (L1 + D-SSIM) grads
# w.r.t. raw params at 2M splats @1200x797.
N = 2_000_000
W, H = 1200, 797
raw = captured_scene(n=N, seed=3)
raw = jax.device_put(raw)
jax.block_until_ready(raw.means)
cam = Camera.look_at(eye=[6.5, 2.2, -8.0], target=[0.0, 0.3, 0.0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=W, height=H)
cfg = RasterizeConfig(pair_multiplier=3.0, pack_axes_f16=True,
                      pack_grads_bf16=True, pack_center_u32=True,
                      pack_color_rgba8=True)
target = jnp.zeros((H, W, 4), jnp.float32)

def loss_fn(r, tgt):
    img = ren_mod.render(r.activate(), cam, RenderSettings(sh_order=3), cfg, backend="pallas")
    return photometric_loss(img[..., :3], tgt[..., :3])

fb = jax.jit(jax.value_and_grad(loss_fn))
(l0, g0) = jax.block_until_ready(fb(raw, target))
t0 = time.perf_counter()
for _ in range(4):
    l, g = fb(raw, target)
jax.block_until_ready(g)
print(f"captured 2M train grad step (L1+DSSIM): {(time.perf_counter()-t0)/4*1e3:.1f} ms "
      f"(loss {float(l):.4f}, grads finite {bool(jnp.isfinite(g.means).all())})", flush=True)
del raw, fb, g, g0; gc.collect(); jax.clear_caches(); gc.collect()
print("473 done", flush=True)
