import jax
import jax.numpy as jnp
import gc, time, sys, dataclasses, json
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
from unitygaussiansplatting_tpu.io.device_asset import DeviceAsset, encode_device
from unitygaussiansplatting_tpu.io import formats as F
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.models.renderer import render_with_stats, suggest_pair_multiplier
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene_device

# VERDICT r3 item 4: demonstrate >8.6M splats (the reference's hard cap,
# GaussianSplatAsset.cs:16) on ONE chip.  31.5M splats are generated and
# Medium-encoded entirely on device (io/device_asset.encode_device), in 8
# chunk-aligned slices so peak HBM stays bounded, then rendered from the
# compressed DeviceAsset at the headline resolution.
SLICE = 15360 * 256  # 3,932,160 (256-aligned so chunk tables concatenate)
SLICES = 10
N = SLICE * SLICES  # 31,457,280
W, H = 1200, 797

t0 = time.perf_counter()
parts = []
for s in range(SLICES):
    raw = sphere_scene_device(n=SLICE, seed=100 + s)
    # More splats -> smaller splats (as a real capture at this density
    # would be): shift log-scales by log(0.4).
    raw = dataclasses.replace(raw, log_scales=raw.log_scales + jnp.log(0.28))
    g = raw.activate()
    del raw
    parts.append(encode_device(g))
    jax.block_until_ready(parts[-1].pos_q)
    del g; gc.collect()

da = DeviceAsset(
    pos_q=jnp.concatenate([p.pos_q for p in parts]),
    rot_q=jnp.concatenate([p.rot_q for p in parts]),
    scale_q=jnp.concatenate([p.scale_q for p in parts]),
    color_q=jnp.concatenate([p.color_q for p in parts]),
    sh_q=jnp.concatenate([p.sh_q for p in parts]),
    sh_idx=None,
    chunk_info=jnp.concatenate([p.chunk_info for p in parts]),
    splat_count=N,
    pos_format=parts[0].pos_format,
    scale_format=parts[0].scale_format,
    color_format=parts[0].color_format,
    sh_format=parts[0].sh_format,
)
jax.block_until_ready(da.pos_q)
del parts; gc.collect()
t_enc = time.perf_counter() - t0
print(f"generated+encoded {N} splats on device in {t_enc:.1f}s "
      f"({da.device_bytes()/1e9:.2f} GB quantized Medium)", flush=True)

cam = Camera.look_at(eye=[0, 0.6, -3.0], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=W, height=H)
mult, demand = suggest_pair_multiplier(da, [cam], RenderSettings(sh_order=3),
                                       RasterizeConfig(), slack=1.15)
print(f"pair demand {demand} ({demand/N:.2f}/splat); using mult {mult:.3f}",
      flush=True)
# chunk_size=256: at K~59M pairs the C=128 schedule (465k steps) exceeds
# the ~1 MB scalar-prefetch SMEM budget (build_schedule's own gate).
# decode_planar_sh: the interleaved (N, 15, 3) SH decode is materialized
# twice by XLA (12.7 GB at 31.5M) — planar holds one copy and fits.
config = RasterizeConfig(pair_multiplier=mult, pack_axes_u32=True,
                         pack_center_u32=True, pack_color_rgba8=True,
                         chunk_size=256, decode_planar_sh=True)

@jax.jit
def frame(a, s):
    img, stats = render_with_stats(
        a, cam, RenderSettings(sh_order=3, opacity_scale=s), config,
        backend="pallas")
    return img, stats.num_pairs, stats.overflowed

img, pairs, over = jax.block_until_ready(frame(da, jnp.float32(1.0)))
t0 = time.perf_counter()
for i in range(4):
    img, pairs, over = frame(da, jnp.float32(1.0 + 0.001 * i))
jax.block_until_ready(img)
ms = (time.perf_counter() - t0) / 4 * 1e3
record = {
    "metric": "fwd ms/frame, 39.3M-splat synthetic scene @1200x797 SH3 from "
              "Medium DeviceAsset (one v5e chip)",
    "value": round(ms, 1),
    "splats": N,
    "reference_cap": 8_600_000,
    "device_bytes_quantized": da.device_bytes(),
    "pairs": int(pairs), "overflow": bool(over),
    "img_mean": float(img.mean()),
    "encode_s_on_device": round(t_enc, 1),
    "provenance": "tools/tpu_jobs/931 run live on the v5e (r5); chunk_size=256 "
                  "+ decode_planar_sh + pack_axes_u32 are the at-scale knobs "
                  "(r4 value with f16 axes: 1185.5 ms, job 479)",
    "notes": "3.66x the reference's hard 8.6M-splat cap (GaussianSplatAsset"
             ".cs:16, 2 GB buffer limit)",
}
print(json.dumps(record), flush=True)
with open("/root/repo/docs/demo_40m.json", "w") as f:
    json.dump(record, f, indent=1)
del da, img; gc.collect(); jax.clear_caches(); gc.collect()
print("931 done", flush=True)
