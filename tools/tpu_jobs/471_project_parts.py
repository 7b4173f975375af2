import gc, time, sys
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
from unitygaussiansplatting_tpu.ops.covariance import (
    covariance3d, decompose_covariance2d, ewa_project,
)
from unitygaussiansplatting_tpu.ops.sh import shade_sh
from unitygaussiansplatting_tpu.ops.projection import project_splats
from unitygaussiansplatting_tpu.utils.config import RenderSettings
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

# Where do project_splats' 37.7 ms go at 6.1M?
N = 6_100_000
scene = jax.device_put(sphere_scene(n=N, seed=0).activate())
jax.block_until_ready(scene)
cam = Camera.look_at(eye=[0, 0.6, -3.0], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=1200, height=797)

def timeit(name, fn, *args, reps=6):
    f = jax.jit(fn)
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)
    del o; gc.collect()

hi = jax.lax.Precision.HIGHEST
mv = cam.view
timeit("view transform (HIGHEST dot)", lambda m: jnp.dot(m, mv[:3, :3].T, precision=hi) + mv[:3, 3], scene.means)
timeit("view transform (column FMA)", lambda m: jnp.stack(
    [m[:, 0] * mv[i, 0] + m[:, 1] * mv[i, 1] + m[:, 2] * mv[i, 2] + mv[i, 3]
     for i in range(3)], axis=-1), scene.means)
timeit("covariance3d", covariance3d, scene.rotations, scene.scales)
cov6 = jax.jit(covariance3d)(scene.rotations, scene.scales)
vp = jax.jit(lambda m: jnp.dot(m, mv[:3, :3].T, precision=hi) + mv[:3, 3])(scene.means)
jax.block_until_ready((cov6, vp))
timeit("ewa_project", lambda v, c: ewa_project(v, c, mv[:3, :3], cam.focal, cam.tan_fovx, cam.tan_fovy), vp, cov6)
cov2d = jax.jit(lambda v, c: ewa_project(v, c, mv[:3, :3], cam.focal, cam.tan_fovx, cam.tan_fovy))(vp, cov6)
jax.block_until_ready(cov2d)
timeit("decompose_covariance2d", decompose_covariance2d, cov2d)
timeit("shade_sh order3", lambda b, s, d: shade_sh(b, s, d, 3, False),
       scene.base_color, scene.sh, scene.means)
timeit("project_splats full", lambda g: project_splats(g, cam, RenderSettings(sh_order=3)), scene)
del scene, cov6, vp, cov2d; gc.collect(); jax.clear_caches(); gc.collect()
print("471 done", flush=True)
