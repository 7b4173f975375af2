import gc, time, sys, functools
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.ops import pair_expand as pe
from unitygaussiansplatting_tpu.ops.binning import (
    depth_key_bits, pair_budget, tile_grid, cdiv,
)
from unitygaussiansplatting_tpu.ops.projection import project_splats
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

# Is the expansion kernel (130 ms at K=26M, C=512, G=50.6k steps)
# grid/DMA-overhead bound?  (a) no-op kernel with identical grid+specs,
# (b) C=1024 (half the steps), (c) fewer outputs (DMA-count scaling).
N = 6_100_000
W, H = 1200, 797
scene = jax.device_put(sphere_scene(n=N, seed=0).activate())
jax.block_until_ready(scene)
cam = Camera.look_at(eye=[0, 0.6, -3.0], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=W, height=H)
config = RasterizeConfig(pair_multiplier=4.25, pack_axes_f16=True,
                         pack_center_u32=True, pack_color_rgba8=True)
proj = jax.jit(lambda g: project_splats(g, cam, RenderSettings(sh_order=3)))(scene)
jax.block_until_ready(proj)

tiles_x, tiles_y = tile_grid(W, H, config)
num_tiles = tiles_x * tiles_y
k = pair_budget(N, config)
db = depth_key_bits(num_tiles)

# Build prelude products once (reuse bin_and_prepare internals via one call
# at C=512 to get table/boundaries shapes right for each C).
from unitygaussiansplatting_tpu.ops.binning import quantize_depth, tile_rects
from unitygaussiansplatting_tpu.ops.tile_common import quantize_view_fp16

def prelude(p, c):
    p = quantize_view_fp16(p, config)
    n = p.depth.shape[0]
    x0, y0, nx, ny, counts, valid = tile_rects(p, W, H, config)
    qcap = jnp.maximum(jnp.log(jnp.maximum(p.opacity, 1e-30) / config.alpha_discard), 0.0)
    live = valid & (counts > 0)
    counts_slots = jnp.where(live, counts, 1)
    x0f = jnp.where(live, x0.astype(jnp.float32), jnp.float32(num_tiles))
    y0f = jnp.where(live, y0.astype(jnp.float32), 0.0)
    nxf = jnp.where(live, nx.astype(jnp.float32), 1.0)
    dq = quantize_depth(p.depth, db)
    dqf = jnp.where(live, dq, 0).astype(jnp.float32)
    boundaries_core = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts_slots, dtype=jnp.int32)])
    num_slots = boundaries_core[-1]
    npad = cdiv(n + 1, c) * c
    boundaries = jnp.full((npad + c,), jnp.iinfo(jnp.int32).max, jnp.int32)
    boundaries = jax.lax.dynamic_update_slice(boundaries, boundaries_core, (0,))
    zeros = jnp.zeros((n,), jnp.float32)
    table = jnp.stack([
        p.center[:, 0], p.center[:, 1], p.axis1[:, 0], p.axis1[:, 1],
        p.axis2[:, 0], p.axis2[:, 1], p.color[:, 0], p.color[:, 1],
        p.color[:, 2], jnp.where(live, p.opacity, 0.0), x0f, y0f, nxf, dqf,
        jnp.where(live, qcap, 1e30), zeros], axis=0)
    table = jnp.where(jnp.isfinite(table), table, 0.0)
    return jnp.pad(table, ((0, 0), (0, npad + c - n))), boundaries, num_slots

def timeit(name, f, *args, reps=6):
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)
    del o; gc.collect()

for c in (512, 1024):
    tt, bnd, ns = jax.jit(functools.partial(prelude, c=c))(proj)
    jax.block_until_ready((tt, bnd, ns))
    try:
        f = jax.jit(lambda tt, bnd, ns: pe.expand_operands(
            tt, bnd, ns, k, N, tiles_x, num_tiles, db, chunk=c,
            tile_w=config.tile_w, tile_h=config.tile_h,
            pack_axes=True, pack_color=True, quad_clip=True,
            pack_center=True, pack_rgba8=True))
        timeit(f"expansion C={c} (6 outs)", f, tt, bnd, ns)
    except Exception as e:
        print(f"expansion C={c} FAILED: {type(e).__name__} {str(e)[:200]}", flush=True)
    del tt, bnd, ns; gc.collect()

# (a) no-op kernel: same grid, same in/out block specs, zero compute.
c = 512
tt, bnd, ns = jax.jit(functools.partial(prelude, c=c))(proj)
jax.block_until_ready((tt, bnd, ns))
g = k // c
npad = tt.shape[1] - c

def noop_variant(n_outs):
    def kern(r0_ref, meta_ref, tbl_lo, tbl_hi, bnd_lo, bnd_hi, *refs):
        for r in refs:
            r[...] = jnp.zeros_like(r)
    def run(tt, bnd, ns):
        starts = jnp.arange(g, dtype=jnp.int32) * c
        r0 = jnp.clip(jnp.searchsorted(bnd, starts, side="right").astype(jnp.int32) - 1, 0, npad - 1)
        meta = jnp.asarray(ns, jnp.int32).reshape((1,))
        bnd2d = bnd.reshape(-1, 1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(g,),
            in_specs=[
                pl.BlockSpec((16, c), lambda i, r, m: (0, r[i] // c)),
                pl.BlockSpec((16, c), lambda i, r, m: (0, r[i] // c + 1)),
                pl.BlockSpec((c, 1), lambda i, r, m: (r[i] // c, 0)),
                pl.BlockSpec((c, 1), lambda i, r, m: (r[i] // c + 1, 0)),
            ],
            out_specs=tuple(pl.BlockSpec((1, 1, c), lambda i, r, m: (i, 0, 0))
                            for _ in range(n_outs)),
        )
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=tuple(jax.ShapeDtypeStruct((g, 1, c), jnp.uint32)
                            for _ in range(n_outs)),
        )(r0, meta, tt, tt, bnd2d, bnd2d)
    return jax.jit(run)

for n_outs in (6, 3, 1):
    timeit(f"no-op kernel, same grid, {n_outs} outs", noop_variant(n_outs), tt, bnd, ns)

# (c) single fused (1, 6, C) output block instead of 6 separate refs.
def noop_fused_out():
    def kern(r0_ref, meta_ref, tbl_lo, tbl_hi, bnd_lo, bnd_hi, out_ref):
        out_ref[...] = jnp.zeros_like(out_ref)
    def run(tt, bnd, ns):
        starts = jnp.arange(g, dtype=jnp.int32) * c
        r0 = jnp.clip(jnp.searchsorted(bnd, starts, side="right").astype(jnp.int32) - 1, 0, npad - 1)
        meta = jnp.asarray(ns, jnp.int32).reshape((1,))
        bnd2d = bnd.reshape(-1, 1)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(g,),
            in_specs=[
                pl.BlockSpec((16, c), lambda i, r, m: (0, r[i] // c)),
                pl.BlockSpec((16, c), lambda i, r, m: (0, r[i] // c + 1)),
                pl.BlockSpec((c, 1), lambda i, r, m: (r[i] // c, 0)),
                pl.BlockSpec((c, 1), lambda i, r, m: (r[i] // c + 1, 0)),
            ],
            out_specs=(pl.BlockSpec((1, 6, c), lambda i, r, m: (i, 0, 0)),),
        )
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((g, 6, c), jnp.uint32),),
        )(r0, meta, tt, tt, bnd2d, bnd2d)
    return jax.jit(run)

timeit("no-op kernel, ONE (1,6,C) out", noop_fused_out(), tt, bnd, ns)

del scene, proj, tt, bnd, ns
gc.collect(); jax.clear_caches(); gc.collect()
print("475 done", flush=True)
