import gc, time, sys
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
import unitygaussiansplatting_tpu.models.renderer as ren_mod
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

# pack_color_rgba8 on/off at bench config (+pack_center): perf delta and
# the image PSNR cost of the 8-bit color lattice vs the f16 baseline.
N = 6_100_000
W, H = 1200, 797
scene = jax.device_put(sphere_scene(n=N, seed=0).activate())
jax.block_until_ready(scene)
cam = Camera.look_at(eye=[0, 0.6, -3.0], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=W, height=H)

imgs = {}
for rgba8 in (False, True):
    cfg = RasterizeConfig(pair_multiplier=4.25, pack_axes_f16=True,
                          pack_grads_bf16=True, pack_center_u32=True,
                          pack_color_rgba8=rgba8)
    f = jax.jit(lambda g, s, cfg=cfg: ren_mod.render(
        g, cam, RenderSettings(sh_order=3, opacity_scale=s), cfg, backend="pallas"))
    x = jax.block_until_ready(f(scene, jnp.float32(1.0)))
    imgs[rgba8] = np.asarray(x)
    t0 = time.perf_counter()
    for i in range(6):
        x = f(scene, jnp.float32(1.0 + 0.001 * i))
    jax.block_until_ready(x)
    print(f"fwd rgba8={rgba8}: {(time.perf_counter()-t0)/6*1e3:.1f} ms (mean {float(x.mean()):.4f})", flush=True)
    del f, x; gc.collect()

    def loss(g, s, cfg=cfg):
        return jnp.mean(ren_mod.render(g, cam, RenderSettings(sh_order=3, opacity_scale=s), cfg, backend="pallas"))
    fb = jax.jit(jax.grad(loss))
    gr = jax.block_until_ready(fb(scene, jnp.float32(1.0)))
    t0 = time.perf_counter()
    for i in range(4):
        gr = fb(scene, jnp.float32(1.0 + 0.001 * i))
    jax.block_until_ready(gr)
    print(f"fwd+bwd rgba8={rgba8}: {(time.perf_counter()-t0)/4*1e3:.1f} ms", flush=True)
    print(f"  grad finite: {bool(jnp.isfinite(gr.means).all())}", flush=True)
    del fb, gr; gc.collect()

a = np.clip(imgs[False][..., :3], 0, 1)
b = np.clip(imgs[True][..., :3], 0, 1)
mse = float(np.mean((a - b) ** 2))
print(f"rgba8-vs-f16 image PSNR: {10*np.log10(1.0/max(mse,1e-12)):.2f} dB", flush=True)
del imgs, scene, a, b; gc.collect(); jax.clear_caches(); gc.collect()
print("462 done", flush=True)
