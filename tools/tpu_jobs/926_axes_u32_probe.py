"""pack_axes_u32 on-chip probe: perf delta + quality vs the f16 axes pack.

One fewer sort operand should buy ~29 ms/frame (r3 sort law).  Also the
first real-TPU lowering check of the in-kernel cos/sin/exp2 axis decode.
"""
import os as _os
import jax as _jax
try:
    _os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    _jax.config.update("jax_enable_compilation_cache", True)
    _jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:
    pass

import sys, time
sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("unitygaussiansplatting_tpu"):
        sys.modules.pop(m)
import jax, jax.numpy as jnp
import numpy as np
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.models.renderer import render
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene_device

W, H, N = 1200, 797, 6_100_000
common = dict(pair_multiplier=4.0, chunk_size=256, pack_grads_bf16=True,
              pack_center_u32=True, pack_color_rgba8=True)
cfg_f16 = RasterizeConfig(pack_axes_f16=True, **common)
cfg_u32 = RasterizeConfig(pack_axes_u32=True, **common)
cam = Camera.look_at(eye=[0, 0.6, -3], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=W, height=H)
scene = sphere_scene_device(n=N, seed=0).activate()
jax.block_until_ready(scene)

def t(fn, *args, reps=4):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3

imgs = {}
for name, cfg in (("axes-f16", cfg_f16), ("axes-u32", cfg_u32)):
    fwd = jax.jit(lambda g, s, c=cfg: render(
        g, cam, RenderSettings(sh_order=3, opacity_scale=s), c, backend="pallas"))
    fwdbwd = jax.jit(lambda g, s, c=cfg: jax.grad(
        lambda gg: jnp.mean(render(gg, cam,
            RenderSettings(sh_order=3, opacity_scale=s), c, backend="pallas")))(g))
    try:
        ms_f = t(fwd, scene, jnp.float32(1.0))
        ms_fb = t(fwdbwd, scene, jnp.float32(1.0))
        imgs[name] = np.asarray(fwd(scene, jnp.float32(1.0)))
        print(f"{name}: fwd {ms_f:.1f} ms, fwd+bwd {ms_fb:.1f} ms", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:400]}", flush=True)

if len(imgs) == 2:
    a, b = imgs["axes-f16"][..., :3], imgs["axes-u32"][..., :3]
    mse = float(np.mean((np.clip(a, 0, 1) - np.clip(b, 0, 1)) ** 2))
    print(f"image PSNR u32-vs-f16 axes: {10*np.log10(1/max(mse,1e-12)):.2f} dB; "
          f"max abs {np.abs(a-b).max():.4f}", flush=True)

import gc as _gc
for _n in ("scene", "fwd", "fwdbwd", "imgs", "a", "b"):
    globals().pop(_n, None)
_gc.collect(); jax.clear_caches(); _gc.collect()
print("926 done", flush=True)
