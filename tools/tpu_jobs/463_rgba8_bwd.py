import gc, time, sys
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
import unitygaussiansplatting_tpu.models.renderer as ren_mod
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

# Clean re-measure of fwd+bwd with pack_color_rgba8 (462's 0.4 ms reading
# was bogus) + gradient-norm sanity vs the f16 path.
N = 6_100_000
W, H = 1200, 797
scene = jax.device_put(sphere_scene(n=N, seed=0).activate())
jax.block_until_ready(scene)
cam = Camera.look_at(eye=[0, 0.6, -3.0], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=W, height=H)

norms = {}
for rgba8 in (True, False):
    cfg = RasterizeConfig(pair_multiplier=4.25, pack_axes_f16=True,
                          pack_grads_bf16=True, pack_center_u32=True,
                          pack_color_rgba8=rgba8)
    def loss(g, s, cfg=cfg):
        return jnp.mean(ren_mod.render(g, cam, RenderSettings(sh_order=3, opacity_scale=s), cfg, backend="pallas"))
    fb = jax.jit(jax.grad(loss))
    gr = jax.block_until_ready(fb(scene, jnp.float32(1.0)))
    norms[rgba8] = (float(jnp.linalg.norm(gr.means)), float(jnp.linalg.norm(gr.base_color)))
    t0 = time.perf_counter()
    cnt = 0
    for i in range(4):
        gr = fb(scene, jnp.float32(1.0 + 0.001 * (i + 1)))
        cnt += 1
    jax.block_until_ready(gr)
    dt = (time.perf_counter() - t0) / cnt * 1e3
    print(f"fwd+bwd rgba8={rgba8}: {dt:.1f} ms (means-grad norm {norms[rgba8][0]:.3e})", flush=True)
    del fb, gr; gc.collect()

r8, rf = norms[True], norms[False]
print(f"grad norm ratios rgba8/f16: means {r8[0]/rf[0]:.4f} color {r8[1]/rf[1]:.4f}", flush=True)
del scene, norms; gc.collect(); jax.clear_caches(); gc.collect()
print("463 done", flush=True)
