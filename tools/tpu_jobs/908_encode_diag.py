import gc, sys
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
from unitygaussiansplatting_tpu.io.asset import encode_asset
from unitygaussiansplatting_tpu.io.bridge import gaussians_to_input_splats
from unitygaussiansplatting_tpu.io.device_asset import (
    device_asset_from_asset, encode_device)
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene_device

# 906 gate follow-up: encode_device vs host encoder mismatch rate 2.26% on
# chip (budget 0.5%).  Which field, and are mismatches one-step code
# jitter (chunk min/max reduction-order fp) or structural?

small = sphere_scene_device(n=20_000, seed=12).activate()
host_da = device_asset_from_asset(encode_asset(gaussians_to_input_splats(small)))
dev_da = encode_device(small)
for f in ("pos_q", "rot_q", "scale_q", "color_q", "sh_q", "chunk_info"):
    x = np.asarray(getattr(host_da, f))
    y = np.asarray(getattr(dev_da, f))
    rate = float((x != y).sum()) / x.size
    print(f"{f}: shape {x.shape} dtype {x.dtype} mismatch {rate:.4f}", flush=True)
    if rate > 0 and x.dtype != np.uint32:
        d = np.abs(x.astype(np.int64) - y.astype(np.int64))
        print(f"   max code delta {d.max()}, frac>1 {(d > 1).mean():.5f}", flush=True)
    elif rate > 0:
        # u32 packed fields: compare per-byte (codes are sub-fields).
        xb = x.view(np.uint8); yb = y.view(np.uint8)
        d = np.abs(xb.astype(np.int16) - yb.astype(np.int16))
        print(f"   per-byte mismatch {(xb != yb).mean():.4f}, max byte delta "
          f"{d.max()}, frac>1 {(d > 1).mean():.5f}", flush=True)
print("908 done", flush=True)
