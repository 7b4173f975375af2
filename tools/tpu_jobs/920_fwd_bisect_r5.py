"""r5 forward bisect: sub-phases of bin_prepare at bench config.

Times project / table-build / expand kernel / sort / post-sort unpack /
schedule / composite separately, plus the fused frame, at the exact bench
configuration (6.1M sphere, 1200x797, SH3, pack knobs on).
"""
import importlib
import sys
import time

sys.path.insert(0, "/root/repo")
for m in list(sys.modules):
    if m.startswith("unitygaussiansplatting_tpu"):
        importlib.reload(sys.modules[m]) if False else sys.modules.pop(m)

import jax
import jax.numpy as jnp

from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.models.renderer import render
from unitygaussiansplatting_tpu.ops import rasterize_pallas as rp
from unitygaussiansplatting_tpu.ops.binning import (
    cdiv,
    depth_key_bits,
    pair_budget,
    quantize_depth,
    tile_grid,
    tile_rects,
)
from unitygaussiansplatting_tpu.ops.pair_expand import (
    _ROWS,
    bin_and_prepare,
    expand_operands,
)
from unitygaussiansplatting_tpu.ops.projection import project_splats
from unitygaussiansplatting_tpu.ops.tile_common import quantize_view_fp16
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene_device

W, H = 1200, 797
N = 6_100_000
cfg = RasterizeConfig(
    pair_multiplier=4.25, pack_axes_f16=True, pack_grads_bf16=True,
    pack_center_u32=True, pack_color_rgba8=True,
)
settings = RenderSettings(sh_order=3)
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
    return (time.perf_counter() - t0) / reps * 1e3, out


tiles_x, tiles_y = tile_grid(W, H, cfg)
num_tiles = tiles_x * tiles_y
db = depth_key_bits(num_tiles)
k = pair_budget(N, cfg)
c = cfg.expand_chunk

ms, proj = t(jax.jit(lambda g: project_splats(g, cam, settings)), scene)
print(f"project: {ms:.1f} ms")

def pre(proj):
    p = quantize_view_fp16(proj, cfg)
    n = p.depth.shape[0]
    x0, y0, nx, ny, counts, valid = tile_rects(p, W, H, cfg)
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
    table = jnp.stack([
        p.center[:, 0], p.center[:, 1], p.axis1[:, 0], p.axis1[:, 1],
        p.axis2[:, 0], p.axis2[:, 1], p.color[:, 0], p.color[:, 1],
        p.color[:, 2], jnp.where(live, p.opacity, 0.0), x0f, y0f, nxf, dqf,
    ], axis=0)
    table = jnp.where(jnp.isfinite(table), table, 0.0)
    table_t = jnp.concatenate([
        jnp.pad(table, ((0, 0), (0, npad + c - n))),
        (boundaries >> 12).astype(jnp.float32)[None, :],
        (boundaries & 4095).astype(jnp.float32)[None, :],
    ], axis=0)
    return table_t, boundaries, num_slots

ms, (table_t, boundaries, num_slots) = t(jax.jit(pre), proj)
print(f"pre (quantize+rects+table): {ms:.1f} ms")

expand = jax.jit(lambda tt, b, ns: expand_operands(
    tt, b, ns, k, N, tiles_x, num_tiles, db, chunk=c,
    tile_w=cfg.tile_w, tile_h=cfg.tile_h, pack_axes=True, pack_color=True,
    quad_clip=True, alpha_discard=cfg.alpha_discard, pack_center=True,
    pack_rgba8=True, windows=1))
ms, operands = t(expand, table_t, boundaries, num_slots)
print(f"expand kernel: {ms:.1f} ms ({len(operands)} operands, K={k})")

ms, sorted_ = t(jax.jit(lambda ops: jax.lax.sort(ops, num_keys=2, is_stable=False)), operands)
print(f"sort ({len(operands)} ops, 2-key unstable): {ms:.1f} ms")

# post-sort: unpack + fields + tile_starts (replicate bin_and_prepare tail)
def post(sorted_):
    key_s = sorted_[0]
    rest = list(sorted_[2:])
    tile_bounds = (jnp.arange(num_tiles + 1, dtype=jnp.uint32) << db).astype(jnp.uint32)
    tile_starts = jnp.searchsorted(key_s, tile_bounds, side="left").astype(jnp.int32)
    def unh(u):
        return jax.lax.bitcast_convert_type(u.astype(jnp.uint16), jnp.float16).astype(jnp.float32)
    cen_u = rest[0]; rest = rest[1:]
    au1, au2 = rest[:2]; rest = rest[2:]
    axis_rows = [unh(au1), unh(au1 >> 16), unh(au2), unh(au2 >> 16)]
    (cu_s,) = rest
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
    qcap_s = jnp.maximum(jnp.log(jnp.maximum(op_s, 1e-30) / cfg.alpha_discard), 0.0)
    qb = jnp.minimum(jnp.sqrt(jnp.maximum(qcap_s * 1.0002 + 1e-3, 0.0)), 2.001)
    half1 = 0.5 * (jnp.abs(u1x) * cfg.tile_w + jnp.abs(u1y) * cfg.tile_h)
    half2 = 0.5 * (jnp.abs(u2x) * cfg.tile_w + jnp.abs(u2y) * cfg.tile_h)
    r1 = qb * n1 + half1 + 0.51
    r2 = qb * n2 + half2 + 0.51 + 0.002 * r1
    s1 = ((cen_u & 0xFFF).astype(jnp.float32) - 2048.0) * (r1 / 2047.0)
    s2 = ((cen_u >> 12).astype(jnp.float32) - 65536.0) * (r2 / 65535.0)
    tcx = (tile_s % tiles_x).astype(jnp.float32) * cfg.tile_w + 0.5 * cfg.tile_w
    tcy = (tile_s // tiles_x).astype(jnp.float32) * cfg.tile_h + 0.5 * cfg.tile_h
    cx_s = tcx + s1 * u1x + s2 * u2x
    cy_s = tcy + s1 * u1y + s2 * u2y
    field_rows = [cx_s, cy_s] + axis_rows + color_rows
    g2 = k // cfg.chunk_size
    fields = jnp.concatenate(
        [jnp.stack(field_rows, axis=0), jnp.zeros((6, k), jnp.float32)], axis=0
    ).reshape(_ROWS, g2, cfg.chunk_size).transpose(1, 0, 2)
    return fields, tile_starts

ms, (fields, tile_starts) = t(jax.jit(post), sorted_)
print(f"post (unpack+fields+starts): {ms:.1f} ms")

# full bin_and_prepare for cross-check
ms, (binning, fields_bp, num_real) = t(
    jax.jit(lambda p: bin_and_prepare(p, W, H, cfg)), proj)
print(f"bin_and_prepare total: {ms:.1f} ms (num_pairs={int(binning.num_pairs)})")

ms, schedule = t(jax.jit(lambda b: rp.build_schedule(b, num_tiles, cfg.chunk_size)), binning)
print(f"schedule: {ms:.1f} ms")
ms, img = t(jax.jit(lambda f, s: rp.composite_pallas(f, s, W, H, cfg)), fields_bp, schedule)
print(f"kernel+untile: {ms:.1f} ms")

# fused frame
frame = jax.jit(lambda g, s: render(
    g, cam, RenderSettings(sh_order=3, opacity_scale=s), cfg, backend="pallas"))
ms, _ = t(frame, scene, jnp.float32(1.0))
print(f"fused fwd frame: {ms:.1f} ms")

# sort law re-check: synthetic operands at K, varying payload count
key = operands[0]
spl = operands[1]
pay = operands[2]
for nops in (2, 3, 4, 5, 6, 7):
    ops = (key, spl) + (pay,) * (nops - 2)
    ms, _ = t(jax.jit(lambda o: jax.lax.sort(o, num_keys=2, is_stable=False)), ops)
    print(f"sort law: {nops} operands -> {ms:.1f} ms")
