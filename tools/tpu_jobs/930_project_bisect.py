"""Project-phase bisect at bench scale: where do the 38 ms go?

covariance3d / ewa_project / decompose / shade_sh timed separately (each
jitted standalone, so numbers include one materialization of their output
— the fused frame recovers some of that via fusion).
"""
import sys, time
sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("unitygaussiansplatting_tpu"):
        sys.modules.pop(m)
import jax, jax.numpy as jnp
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.ops.covariance import (
    covariance3d, decompose_covariance2d, ewa_project,
)
from unitygaussiansplatting_tpu.ops.projection import project_splats
from unitygaussiansplatting_tpu.ops.sh import shade_sh
from unitygaussiansplatting_tpu.utils.config import RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene_device

N = 6_100_000
cam = Camera.look_at(eye=[0, 0.6, -3], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=1200, height=797)
g = sphere_scene_device(n=N, seed=0).activate()
jax.block_until_ready(g)

def t(fn, *args, reps=6):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps * 1e3

hi = jax.lax.Precision.HIGHEST
mv = cam.view

ms = t(jax.jit(lambda g: jnp.dot(g.means, mv[:3, :3].T, precision=hi) + mv[:3, 3]), g)
print(f"view transform: {ms:.1f} ms", flush=True)
ms = t(jax.jit(lambda g: covariance3d(g.rotations, g.scales)), g)
print(f"covariance3d: {ms:.1f} ms", flush=True)
view_pos = jax.jit(lambda g: jnp.dot(g.means, mv[:3, :3].T, precision=hi) + mv[:3, 3])(g)
cov6 = jax.jit(lambda g: covariance3d(g.rotations, g.scales))(g)
ms = t(jax.jit(lambda vp, c6: ewa_project(vp, c6, mv[:3, :3], cam.focal,
                                          cam.tan_fovx, cam.tan_fovy)), view_pos, cov6)
print(f"ewa_project: {ms:.1f} ms", flush=True)
cov2d = jax.jit(lambda vp, c6: ewa_project(vp, c6, mv[:3, :3], cam.focal,
                                           cam.tan_fovx, cam.tan_fovy))(view_pos, cov6)
ms = t(jax.jit(decompose_covariance2d), cov2d)
print(f"decompose_covariance2d: {ms:.1f} ms", flush=True)
vd = jax.jit(lambda g: g.means / jnp.linalg.norm(g.means, axis=-1, keepdims=True))(g)
for order in (1, 3):
    ms = t(jax.jit(lambda g, v, o=order: shade_sh(g.base_color, g.sh, v, o, False)), g, vd)
    print(f"shade_sh order {order}: {ms:.1f} ms", flush=True)
ms = t(jax.jit(lambda g: project_splats(g, cam, RenderSettings(sh_order=3))), g)
print(f"project_splats total: {ms:.1f} ms", flush=True)

import gc as _gc
for _n in ("g", "view_pos", "cov6", "cov2d", "vd"):
    globals().pop(_n, None)
_gc.collect(); jax.clear_caches(); _gc.collect()
print("930 done", flush=True)
