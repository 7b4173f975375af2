import gc, time, sys
gc.collect(); jax.clear_caches(); gc.collect()
for m in [m for m in list(sys.modules) if m.startswith("unitygaussiansplatting_tpu")]:
    del sys.modules[m]
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.ops import pair_expand as pe
from unitygaussiansplatting_tpu.ops import rasterize_pallas as rp
from unitygaussiansplatting_tpu.ops.binning import (
    depth_key_bits, pair_budget, quantize_depth, tile_grid, tile_rects, cdiv,
)
from unitygaussiansplatting_tpu.ops.projection import project_splats
from unitygaussiansplatting_tpu.ops.tile_common import quantize_view_fp16
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

# Round-4 forward bisect at bicycle scale: where exactly do bin_prepare's
# ~300 ms and kernel_untile's ~120 ms go?
N = 6_100_000
W, H = 1200, 797

t0 = time.perf_counter()
raw = sphere_scene(n=N, seed=0)
t_gen = time.perf_counter() - t0
t0 = time.perf_counter()
scene = jax.device_put(raw.activate())
jax.block_until_ready(scene)
t_up = time.perf_counter() - t0
print(f"scene host-gen {t_gen:.1f}s, activate+device_put {t_up:.1f}s", flush=True)
del raw

cam = Camera.look_at(eye=[0, 0.6, -3.0], target=[0, 0, 0], up=[0, 1, 0],
                     fov_y_deg=47.0, width=W, height=H)
config = RasterizeConfig(pair_multiplier=4.25, pack_axes_f16=True,
                         pack_grads_bf16=True, pack_center_u32=True,
                         pack_color_rgba8=True)

def timeit(name, fn, *args, reps=6, static=()):
    f = jax.jit(fn, static_argnums=static) if not hasattr(fn, "lower") else fn
    o = jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {ms:.1f} ms", flush=True)
    res = o
    del o; gc.collect()
    return res

settings = RenderSettings(sh_order=3)
proj = timeit("project", lambda g: project_splats(g, cam, settings), scene)

tiles_x, tiles_y = tile_grid(W, H, config)
num_tiles = tiles_x * tiles_y
k = pair_budget(N, config)
db = depth_key_bits(num_tiles)
c = config.expand_chunk

# --- bin_prepare split -----------------------------------------------------
def prelude(p):
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
    table_t = jnp.pad(table, ((0, 0), (0, npad + c - n)))
    return table_t, boundaries, num_slots

table_t, boundaries, num_slots = timeit("  prelude (XLA N-sized)", prelude, proj)

def expand(tt, bnd, ns):
    return pe.expand_operands(
        tt, bnd, ns, k, N, tiles_x, num_tiles, db, chunk=c,
        tile_w=config.tile_w, tile_h=config.tile_h,
        pack_axes=True, pack_color=config.pack_color_f16,
        quad_clip=True, pack_center=True, pack_rgba8=True)

operands = timeit("  expansion kernel", expand, table_t, boundaries, num_slots)

sorted_ = timeit("  2-key unstable sort (6 operands)",
                 lambda ops: jax.lax.sort(ops, num_keys=2, is_stable=False), operands)

def postsort(sorted_):
    key_s, splat_s = sorted_[0], sorted_[1]
    rest = list(sorted_[2:])
    tile_bounds = (jnp.arange(num_tiles + 1, dtype=jnp.uint32) << db).astype(jnp.uint32)
    tile_starts = jnp.searchsorted(key_s, tile_bounds, side="left").astype(jnp.int32)
    def unh(u):
        return jax.lax.bitcast_convert_type(u.astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    cen_u = rest[0]
    au1, au2 = rest[1], rest[2]
    axis_rows = [unh(au1), unh(au1 >> 16), unh(au2), unh(au2 >> 16)]
    cu_s = rest[3]
    color_rows = [
        (cu_s & 0xFF).astype(jnp.float32) / 127.5,
        ((cu_s >> 8) & 0xFF).astype(jnp.float32) / 127.5,
        ((cu_s >> 16) & 0xFF).astype(jnp.float32) / 127.5,
        (cu_s >> 24).astype(jnp.float32) / 255.0,
    ]
    a1x_s, a1y_s, a2x_s, a2y_s = axis_rows
    op_s = color_rows[3]
    tile_s = (key_s >> db).astype(jnp.int32)
    n1 = jnp.sqrt(jnp.maximum(a1x_s * a1x_s + a1y_s * a1y_s, 1e-12))
    n2 = jnp.sqrt(jnp.maximum(a2x_s * a2x_s + a2y_s * a2y_s, 1e-12))
    u1x, u1y = a1x_s / n1, a1y_s / n1
    sg = jnp.where(a2y_s * u1x - a2x_s * u1y >= 0.0, 1.0, -1.0)
    u2x, u2y = -sg * u1y, sg * u1x
    qcap_s = jnp.maximum(jnp.log(jnp.maximum(op_s, 1e-30) / config.alpha_discard), 0.0)
    qb = jnp.minimum(jnp.sqrt(jnp.maximum(qcap_s * 1.0002 + 1e-3, 0.0)), 2.001)
    half1 = 0.5 * (jnp.abs(u1x) * config.tile_w + jnp.abs(u1y) * config.tile_h)
    half2 = 0.5 * (jnp.abs(u2x) * config.tile_w + jnp.abs(u2y) * config.tile_h)
    r1 = qb * n1 + half1 + 0.51
    r2 = qb * n2 + half2 + 0.51 + 0.002 * r1
    s1 = ((cen_u & 0xFFF).astype(jnp.float32) - 2048.0) * (r1 / 2047.0)
    s2 = ((cen_u >> 12).astype(jnp.float32) - 65536.0) * (r2 / 65535.0)
    tcx = (tile_s % tiles_x).astype(jnp.float32) * config.tile_w + 0.5 * config.tile_w
    tcy = (tile_s // tiles_x).astype(jnp.float32) * config.tile_h + 0.5 * config.tile_h
    cx_s = tcx + s1 * u1x + s2 * u2x
    cy_s = tcy + s1 * u1y + s2 * u2y
    field_rows = [cx_s, cy_s] + axis_rows + color_rows
    g2 = k // config.chunk_size
    fields = jnp.concatenate(
        [jnp.stack(field_rows, axis=0), jnp.zeros((6, k), jnp.float32)], axis=0
    ).reshape(16, g2, config.chunk_size).transpose(1, 0, 2)
    return fields, tile_starts

fields, tile_starts = timeit("  post-sort decode+assemble", postsort, sorted_)

# full fused bin_and_prepare for comparison
binning, fields2, num_real = timeit(
    "bin_and_prepare fused", lambda p: pe.bin_and_prepare(p, W, H, config), proj)

# --- composite/untile split ------------------------------------------------
schedule = timeit("schedule", lambda b: rp.build_schedule(b, num_tiles, config.chunk_size), binning)

raw_out = timeit("composite kernel only (raw)",
                 lambda f, s: rp.composite_pallas(f, s, W, H, config, return_raw=True)[1],
                 fields2, schedule)

timeit("composite kernel + untile",
       lambda f, s: rp.composite_pallas(f, s, W, H, config),
       fields2, schedule)

th, tw = config.tile_h, config.tile_w
def untile(out):
    img = out[:num_tiles].reshape(tiles_y, tiles_x, 4, th, tw)
    img = img.transpose(0, 3, 1, 4, 2).reshape(tiles_y * th, tiles_x * tw, 4)
    return img[:H, :W]
timeit("untile alone", untile, raw_out)

del scene, proj, table_t, boundaries, operands, sorted_, fields, fields2, binning, schedule, raw_out
gc.collect(); jax.clear_caches(); gc.collect()
print("474 done", flush=True)
