import gc, time, sys, os
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
import unitygaussiansplatting_tpu.models.renderer as ren_mod
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.utils.synthetic import captured_scene
from unitygaussiansplatting_tpu.io.bridge import gaussians_to_input_splats, input_splats_to_gaussians
from unitygaussiansplatting_tpu.io.ply import write_ply, read_ply
from unitygaussiansplatting_tpu.io.creator import create_asset
from unitygaussiansplatting_tpu.io.asset import decode_asset
from unitygaussiansplatting_tpu.io.device_asset import device_asset_from_asset

# Captured-statistics scene through the FULL import path at bench scale:
# pair demand (calibrates BENCH_IMPORT_PAIR_MULT), fwd ms, and the
# end-to-end VeryLow render PSNR vs the reference's recorded 32.27 dB
# (GaussianSplatAssetCreator.cs:195).
N = 2_000_000
W, H = 1200, 797
raw = captured_scene(n=N, seed=3)
splats = gaussians_to_input_splats(raw.activate())
ply_path = "/tmp/captured_bench.ply"
write_ply(ply_path, splats)
t0 = time.time()
asset_med = create_asset(ply_path, quality="medium", import_cameras=False)
print(f"medium asset: {asset_med.total_bytes()/1e6:.1f} MB, encode {time.time()-t0:.0f}s", flush=True)

da = device_asset_from_asset(asset_med)
jax.block_until_ready(da.pos_q)
cam = Camera.look_at(eye=[6.5, 2.2, -8.0], target=[0.0, 0.3, 0.0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=W, height=H)

for mult in (3.0,):
    cfg = RasterizeConfig(pair_multiplier=mult, pack_axes_f16=True, pack_grads_bf16=True)
    f = jax.jit(lambda a, s: ren_mod.render(a, cam, RenderSettings(sh_order=3, opacity_scale=s), cfg, backend="pallas"))
    img, stats = jax.block_until_ready(jax.jit(lambda a: ren_mod.render_with_stats(a, cam, RenderSettings(sh_order=3), cfg, backend="pallas"))(da))
    print(f"mult={mult}: num_pairs={int(stats.num_pairs)} budget={int(stats.budget)} overflow={bool(stats.overflowed)}", flush=True)
    x = jax.block_until_ready(f(da, jnp.float32(1.0)))
    t0 = time.perf_counter()
    for i in range(4):
        x = f(da, jnp.float32(1.0 + 0.001 * i))
    jax.block_until_ready(x)
    print(f"imported fwd (Medium, mult={mult}): {(time.perf_counter()-t0)/4*1e3:.1f} ms (mean {float(x.mean()):.4f})", flush=True)
    del f, x; gc.collect()

# End-to-end preset PSNR ladder vs the float render (the reference's
# recorded points: VeryLow 32.27 / Low 35.17 / Medium 47.46 / High 57.77).
g_float = input_splats_to_gaussians(read_ply(ply_path))
jax.block_until_ready(g_float.means)
cfg = RasterizeConfig(pair_multiplier=3.0, pack_axes_f16=True)
rf = jax.jit(lambda g: ren_mod.render(g, cam, RenderSettings(sh_order=3), cfg, backend="pallas"))
ref_img = np.asarray(jax.block_until_ready(rf(g_float)))
for quality in ("medium", "low", "very_low"):
    t0 = time.time()
    a = create_asset(ply_path, quality=quality, import_cameras=False)
    g_q = input_splats_to_gaussians(decode_asset(a))
    img_q = np.asarray(jax.block_until_ready(rf(g_q)))
    mse = float(np.mean((np.clip(img_q[..., :3], 0, 1) - np.clip(ref_img[..., :3], 0, 1)) ** 2))
    psnr = 10.0 * np.log10(1.0 / max(mse, 1e-12))
    print(f"{quality}: {a.total_bytes()/1e6:.1f} MB ({N*248/a.total_bytes():.2f}x), render PSNR {psnr:.2f} dB, {time.time()-t0:.0f}s", flush=True)
    del a, g_q, img_q; gc.collect()

del g_float, da; gc.collect(); jax.clear_caches(); gc.collect()
print("460 done", flush=True)
