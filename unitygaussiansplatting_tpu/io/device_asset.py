"""Device-resident compressed assets: render directly from quantized blobs.

The reference keeps the *compressed* buffers on the GPU and decodes each
splat per frame inside the view-calc kernel (``LoadSplatData``,
GaussianSplatting.hlsl:428-608) — that is why it renders bicycle in 1.3 GB
of VRAM vs the official viewer's 4.8 GB (readme.md:83-84).  This module is
the TPU-native equivalent:

- :class:`DeviceAsset` holds the quantized fields as typed device arrays
  (uint words, not float expansions) plus the chunk table; formats and
  counts are static pytree metadata, so renderers specialize per format
  exactly like the reference's ``_SplatFormat`` shader word
  (GaussianSplatRenderer.cs:502-503).
- :func:`decode_device` is the jittable ``LoadSplatData`` analog: bitfield
  decode, chunk min/max lerp, scale^8, opacity inverse warp, smallest-three
  quaternion unpack, SH cluster indirection.  Jitted together with the
  renderer, XLA fuses the decode into the projection chain — persistent HBM
  holds only the compressed blobs.

Layout notes vs the reference: color texels are de-swizzled from the 16x16
Morton texture layout once at upload (the swizzle is a GPU-texture cache
optimization, GaussianSplatAssetCreator.cs:863-871; TPU HBM reads are
sequential either way), and per-splat words are kept splat-major.  BC7
color requires the host decoder first (io/bc7.py) — DeviceAsset stores its
decoded Norm8x4 equivalent.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import Gaussians
from ..ops.quaternion import pack_smallest3, unpack_smallest3
from . import formats as F
from .asset import GaussianSplatAssetData, morton_texel_index

_SQRT2 = float(np.sqrt(2.0))


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceAsset:
    """Quantized splat fields as device arrays (see module docstring).

    Dynamic fields are the blobs; formats/count are static so a jitted
    renderer specializes per format combination.
    """

    pos_q: jnp.ndarray  # Norm11: (N,) u32 | Norm16: (N, 3) u16 | Norm6: (N,) u16 | Float32: (N, 3) f32
    rot_q: jnp.ndarray  # (N,) u32, 10.10.10.2 smallest-three
    scale_q: jnp.ndarray  # like pos_q per scale_format
    color_q: jnp.ndarray  # Norm8x4: (N,) u32 rgba | Float16x4: (N, 2) u32 | Float32x4: (N, 4) f32
    sh_q: jnp.ndarray  # Norm11: (N, 15) u32 | Norm6: (N, 15) u16 | F16: (N, 24) u32 | F32: (N, 45) f32 | Cluster: (k, 24) u32 table
    sh_idx: jnp.ndarray | None  # (N,) i32 for cluster formats, else None
    chunk_info: jnp.ndarray | None  # (num_chunks, 16) u32, None when unchunked
    splat_count: int = dataclasses.field(metadata={"static": True})
    pos_format: F.VectorFormat = dataclasses.field(metadata={"static": True})
    scale_format: F.VectorFormat = dataclasses.field(metadata={"static": True})
    color_format: F.ColorFormat = dataclasses.field(metadata={"static": True})
    sh_format: F.SHFormat = dataclasses.field(metadata={"static": True})

    @property
    def num_splats(self) -> int:
        return self.splat_count

    def device_bytes(self) -> int:
        """Persistent HBM footprint (the reference's VRAM story)."""
        total = 0
        for f in (
            self.pos_q,
            self.rot_q,
            self.scale_q,
            self.color_q,
            self.sh_q,
            self.sh_idx,
            self.chunk_info,
        ):
            if f is not None:
                total += f.size * f.dtype.itemsize
        return int(total)


def device_asset_from_asset(asset: GaussianSplatAssetData) -> DeviceAsset:
    """Split the byte blobs into typed per-field arrays and upload them."""
    n = asset.splat_count
    pf, sf = asset.pos_format, asset.scale_format

    def vector_words(blob: bytes, fmt: F.VectorFormat, count: int, offset=0, stride=None):
        raw = np.frombuffer(blob, np.uint8)
        if stride is not None:
            raw = raw.reshape(count, stride)
        if fmt == F.VectorFormat.Float32:
            b = raw[:, offset : offset + 12] if stride else raw
            return b.reshape(count, 12).copy().view("<f4") if stride else np.frombuffer(
                blob, "<f4", count * 3
            ).reshape(count, 3)
        if fmt == F.VectorFormat.Norm16:
            b = raw[:, offset : offset + 6].copy() if stride else raw[: count * 6]
            return b.reshape(count, 6).view("<u2") if stride else np.frombuffer(
                blob, "<u2", count * 3
            ).reshape(count, 3)
        if fmt == F.VectorFormat.Norm11:
            if stride:
                return raw[:, offset : offset + 4].copy().reshape(count, 4).view("<u4")[:, 0]
            return np.frombuffer(blob, "<u4", count)
        if fmt == F.VectorFormat.Norm6:
            if stride:
                return raw[:, offset : offset + 2].copy().reshape(count, 2).view("<u2")[:, 0]
            return np.frombuffer(blob, "<u2", count)
        raise ValueError(fmt)

    pos_q = vector_words(asset.pos_blob, pf, n)

    stride = F.other_stride(sf, asset.has_sh_index)
    other = np.frombuffer(asset.other_blob, np.uint8, n * stride).reshape(n, stride)
    rot_q = other[:, 0:4].copy().view("<u4")[:, 0]
    ssz = F.VECTOR_SIZE[sf]
    scale_q = vector_words(other.tobytes(), sf, n, offset=4, stride=stride)
    sh_idx = None
    if asset.has_sh_index:
        sh_idx = (
            other[:, 4 + ssz : 6 + ssz].copy().view("<u2")[:, 0].astype(np.int32)
        )

    # Color: de-swizzle the Morton texture into splat order once.
    width, height = F.texture_size(n)
    tix = morton_texel_index(n)
    if asset.color_format == F.ColorFormat.Norm8x4:
        tex = np.frombuffer(asset.color_blob, np.uint8).reshape(width * height, 4)
        color_q = tex[tix].copy().view("<u4")[:, 0]
    elif asset.color_format == F.ColorFormat.Float16x4:
        tex = np.frombuffer(asset.color_blob, np.uint8).reshape(width * height, 8)
        color_q = tex[tix].copy().view("<u4")
    elif asset.color_format == F.ColorFormat.Float32x4:
        tex = np.frombuffer(asset.color_blob, "<f4").reshape(width * height, 4)
        color_q = tex[tix].astype(np.float32)
    elif asset.color_format == F.ColorFormat.BC7:
        # No BC hardware on TPU: decode blocks on the host once; device
        # holds the Norm8x4-equivalent words (same 4 B/splat as Norm8x4 --
        # BC7's size win is an on-disk property here).
        from .bc7 import decode_bc7

        tex = decode_bc7(asset.color_blob, width, height).reshape(width * height, 4)
        color_q = tex[tix].copy().view("<u4")[:, 0]
    else:
        raise NotImplementedError(asset.color_format)

    fmt = asset.sh_format
    if F.is_cluster_format(fmt):
        sh_q = np.frombuffer(asset.sh_blob, np.uint8).reshape(-1, 96).copy().view("<u4")
    elif fmt == F.SHFormat.Float32:
        sh_q = np.frombuffer(asset.sh_blob, "<f4").reshape(n, 48)[:, :45].copy()
    elif fmt == F.SHFormat.Float16:
        sh_q = np.frombuffer(asset.sh_blob, np.uint8).reshape(n, 96).copy().view("<u4")[:, :24]
    elif fmt == F.SHFormat.Norm11:
        sh_q = np.frombuffer(asset.sh_blob, "<u4").reshape(n, 15).copy()
    elif fmt == F.SHFormat.Norm6:
        sh_q = np.frombuffer(asset.sh_blob, "<u2").reshape(n, 16)[:, :15].copy()
    else:
        raise ValueError(fmt)

    chunk_info = None
    if asset.has_chunks:
        chunk_info = np.frombuffer(asset.chunk_blob, "<u4").reshape(-1, 16).copy()

    dev = jax.device_put
    return DeviceAsset(
        pos_q=dev(pos_q),
        rot_q=dev(rot_q),
        scale_q=dev(scale_q),
        color_q=dev(color_q),
        sh_q=dev(sh_q),
        sh_idx=None if sh_idx is None else dev(sh_idx),
        chunk_info=None if chunk_info is None else dev(chunk_info),
        splat_count=n,
        pos_format=pf,
        scale_format=sf,
        color_format=asset.color_format,
        sh_format=fmt,
    )


# --- jnp codec mirrors (formulas identical to io/asset.py's numpy ones,
#     which mirror GaussianSplatting.hlsl:261-304) ---


def _dec_bitfields_j(u, shifts, masks):
    """Broadcast-formula bit-field decode: u (...,) uint32 -> (..., len(shifts)).

    out[..., j] = ((u >> shifts[j]) & masks[j]) / masks[j], computed as ONE
    elementwise expression over the output shape — a ``jnp.stack`` of
    per-column vectors lowers to cross-lane interleaves on TPU (~8 ns per
    element, ~50 ms per decoded field at 6.1M splats); the broadcast form
    reads u via lane-broadcast and writes each output tile in place.
    """
    u = u.astype(jnp.uint32)[..., None]
    sh = jnp.asarray(shifts, jnp.uint32)
    mk = jnp.asarray(masks, jnp.uint32)
    return ((u >> sh) & mk).astype(jnp.float32) / mk.astype(jnp.float32)


def _dec_norm11_j(u):
    return _dec_bitfields_j(u, (0, 11, 21), (2047, 1023, 2047))


def _dec_norm655_j(u):
    return _dec_bitfields_j(u, (0, 6, 11), (63, 31, 31))


def _dec_norm565_j(u):
    return _dec_bitfields_j(u, (0, 5, 11), (31, 63, 31))


def _dec_vector_j(q, fmt: F.VectorFormat):
    if fmt == F.VectorFormat.Float32:
        return q.astype(jnp.float32)
    if fmt == F.VectorFormat.Norm16:
        return q.astype(jnp.float32) / 65535.0
    if fmt == F.VectorFormat.Norm11:
        return _dec_norm11_j(q)
    if fmt == F.VectorFormat.Norm6:
        return _dec_norm655_j(q)
    raise ValueError(fmt)


def _cols_bitfields_j(u, shifts, masks):
    """Planar variant of _dec_bitfields_j: list of 1-D (N,) columns."""
    u = u.astype(jnp.uint32)
    return [
        ((u >> s) & m).astype(jnp.float32) / float(m)
        for s, m in zip(shifts, masks)
    ]


def _cols_vector_j(q, fmt: F.VectorFormat):
    """Decode a packed vector blob to three PLANAR (N,) columns.

    The decode pipeline computes everything in 1-D columns and stacks once
    per output field: rank-3 broadcast intermediates and per-column stacks
    at (N, 3) shapes lane-pad / interleave on TPU (measured ~50 ms per
    field at 6.1M splats vs ~1 ms planar).
    """
    if fmt == F.VectorFormat.Float32:
        return [q[:, j].astype(jnp.float32) for j in range(3)]
    if fmt == F.VectorFormat.Norm16:
        return [q[:, j].astype(jnp.float32) / 65535.0 for j in range(3)]
    if fmt == F.VectorFormat.Norm11:
        return _cols_bitfields_j(q, (0, 11, 21), (2047, 1023, 2047))
    if fmt == F.VectorFormat.Norm6:
        return _cols_bitfields_j(q, (0, 6, 11), (63, 31, 31))
    raise ValueError(fmt)


def _f16_bits_to_f32(u16):
    return jax.lax.bitcast_convert_type(
        u16.astype(jnp.uint16), jnp.float16
    ).astype(jnp.float32)


def _f16_pair_split_j(u32):
    return _f16_bits_to_f32(u32 & 0xFFFF), _f16_bits_to_f32(u32 >> 16)


def decode_device(da: DeviceAsset, planar_sh: bool = False) -> Gaussians:
    """Jittable per-frame decode: DeviceAsset -> activated Gaussians.

    The jnp mirror of ``LoadSplatData`` (GaussianSplatting.hlsl:428-608);
    fuse it under the render jit so splats decode from the compressed
    words on the fly.

    All per-splat math runs on PLANAR 1-D columns and each output field is
    stacked exactly once at the end: rank-3 repeat intermediates and
    per-column interleaves at (N, 3) shapes cost ~50 ms per field at 6.1M
    splats on TPU (measured, tools/tpu_jobs/467-468), the planar form ~1 ms.

    ``planar_sh=True`` keeps SH as a tuple of 3 planar (N, 15) channel
    arrays when the format decodes planar (Norm11/Norm6); ops.sh.shade_sh
    consumes either form bit-identically.  MEASURED NET LOSS on the render
    path (DA fwd 509 -> 676 ms at 6.1M: shade_sh's 45 strided column
    reads of (N, 15) cost more than the one (N, 15, 3) interleave write
    they avoid) — kept for consumers that want channel columns, default
    off everywhere.
    """
    n = da.splat_count
    pos_cols = _cols_vector_j(da.pos_q, da.pos_format)
    scale_cols = _cols_vector_j(da.scale_q, da.scale_format)
    rot_pq = _dec_bitfields_j(da.rot_q, (0, 10, 20, 30), (1023, 1023, 1023, 3))
    rot = unpack_smallest3(rot_pq)

    cf = da.color_format
    # BC7 blocks were decoded to Norm8x4-equivalent words at upload.
    if cf in (F.ColorFormat.Norm8x4, F.ColorFormat.BC7):
        col_cols = _cols_bitfields_j(
            da.color_q, (0, 8, 16, 24), (0xFF, 0xFF, 0xFF, 0xFF)
        )
    elif cf == F.ColorFormat.Float16x4:
        r, g = _f16_pair_split_j(da.color_q[:, 0])
        b, a = _f16_pair_split_j(da.color_q[:, 1])
        col_cols = [r, g, b, a]
    elif cf == F.ColorFormat.Float32x4:
        col_cols = [da.color_q[:, j] for j in range(4)]
    else:
        raise NotImplementedError(cf)
    opacity = col_cols[3]

    fmt = da.sh_format
    sh_cols = None  # planar (n*15,) channel columns for the normed formats
    if F.is_cluster_format(fmt) or fmt == F.SHFormat.Float16:
        words = da.sh_q  # (rows, 24) u32 of f16 pairs (48 halves, 45 used)
        if F.is_cluster_format(fmt):
            words = jnp.take(words, da.sh_idx, axis=0)
        lo, hi = _f16_pair_split_j(words)  # (rows, 24) each
        sh48 = jnp.stack([lo, hi], axis=-1).reshape(-1, 48)
        sh = sh48[:, :45].reshape(-1, 15, 3)
    elif fmt == F.SHFormat.Float32:
        sh = da.sh_q.reshape(n, 15, 3)
    elif fmt == F.SHFormat.Norm11:
        sh_cols = _cols_bitfields_j(
            da.sh_q.reshape(-1), (0, 11, 21), (2047, 1023, 2047)
        )
        sh = None
    elif fmt == F.SHFormat.Norm6:
        sh_cols = _cols_bitfields_j(
            da.sh_q.reshape(-1), (0, 5, 11), (31, 63, 31)
        )
        sh = None
    else:
        raise ValueError(fmt)

    if da.chunk_info is not None:
        info = da.chunk_info  # (C, 16) u32
        nchunks = info.shape[0]

        pad = nchunks * F.CHUNK_SIZE - n

        def lerp1(x, lo_col, hi_col):
            # Chunk-constant lerp at (C, 256) shape: 256 is lane-aligned so
            # the 2-D view tiles perfectly and the coefficients broadcast
            # along lanes — no repeat, no rank-3 padding (a 1-D repeat of
            # the coefficients measured ~250 ms for one field at 6.1M).
            x2 = jnp.pad(x, (0, pad)).reshape(nchunks, F.CHUNK_SIZE)
            out = lo_col[:, None] + x2 * (hi_col - lo_col)[:, None]
            return out.reshape(-1)[:n]

        pos_pairs = jax.lax.bitcast_convert_type(info[:, 4:10], jnp.float32)
        pos_cols = [
            lerp1(pos_cols[j], pos_pairs[:, 2 * j], pos_pairs[:, 2 * j + 1])
            for j in range(3)
        ]
        scale_cols = [
            lerp1(scale_cols[j], *_f16_pair_split_j(info[:, 10 + j]))
            for j in range(3)
        ]
        # scale^8: hlsl:578-581 (s *= s three times).
        scale_cols = [((s * s) ** 2) ** 2 for s in scale_cols]
        col_cols = [
            lerp1(col_cols[j], *_f16_pair_split_j(info[:, j])) for j in range(4)
        ]
        opacity = col_cols[3]
        # InvSquareCentered01 (GaussianUtils.cs:25-38 / hlsl:583).
        t = opacity * 2.0 - 1.0
        opacity = jnp.sign(t) * jnp.sqrt(jnp.abs(t)) * 0.5 + 0.5
        if sh_cols is not None:
            # Per-channel planar lerp at (C, 256*15) lane-aligned shape
            # (the 15 coefficients of a splat are contiguous in the
            # flattened column, so chunk rows stay aligned).
            def lerp_sh(x, lo_col, hi_col):
                x2 = jnp.pad(x, (0, pad * 15)).reshape(
                    nchunks, F.CHUNK_SIZE * 15
                )
                out = lo_col[:, None] + x2 * (hi_col - lo_col)[:, None]
                return out.reshape(-1)[: n * 15]

            sh_cols = [
                lerp_sh(sh_cols[i], *_f16_pair_split_j(info[:, 13 + i]))
                for i in range(3)
            ]

    if sh_cols is not None:
        if planar_sh:
            sh = tuple(col.reshape(n, 15) for col in sh_cols)
        else:
            sh = jnp.stack(sh_cols, axis=-1).reshape(n, 15, 3)

    return Gaussians(
        means=jnp.stack(pos_cols, axis=-1),
        rotations=rot,
        scales=jnp.stack(scale_cols, axis=-1),
        opacities=opacity,
        base_color=jnp.stack(col_cols[:3], axis=-1),
        sh=sh,
    )


# ---------------------------------------------------------------------------
# Device-side encoding: Gaussians -> DeviceAsset entirely on the accelerator.


def _enc_j(x, maxv):
    """jnp mirror of io/asset._enc: [0,1] -> integer code."""
    return jnp.clip(x * (maxv + 0.5), 0.0, float(maxv)).astype(jnp.uint32)


def _f16_bits_j(x):
    return jax.lax.bitcast_convert_type(
        x.astype(jnp.float16), jnp.uint16
    ).astype(jnp.uint32)


def _f16_pair_j(lo, hi):
    return _f16_bits_j(lo) | (_f16_bits_j(hi) << 16)


def encode_device(
    g: Gaussians,
    pos_format: F.VectorFormat = F.VectorFormat.Norm11,
    scale_format: F.VectorFormat = F.VectorFormat.Norm11,
    color_format: F.ColorFormat = F.ColorFormat.Norm8x4,
    sh_format: F.SHFormat = F.SHFormat.Norm6,
) -> DeviceAsset:
    """Quantize activated Gaussians into a :class:`DeviceAsset` ON DEVICE.

    The jnp mirror of the host encoder (io/asset.encode_asset — itself the
    analog of GaussianSplatAssetCreator.CreateChunkData + the Encode* jobs,
    GaussianSplatAssetCreator.cs:520-833): scale^(1/8) and opacity
    square-warps, per-256-splat chunk min/max + [0,1] renormalization, and
    the same bit codecs — producing arrays bit-compatible with
    ``device_asset_from_asset(encode_asset(...))`` without the splat data
    ever visiting the host (the color texture swizzle is skipped: DeviceAsset
    stores splats splat-major, and upload de-swizzles anyway).

    This is what makes >8.6M-splat scenes practical here: the reference caps
    at 8.6M by its 2 GB export buffer (GaussianSplatAsset.cs:16) and its
    import runs minutes of Burst CPU work; encoding a 30M-splat scene on a
    TPU chip takes milliseconds and ~1.4 GB of HBM at Medium quality.

    BC7 color and Cluster SH formats need host-side search/k-means — use the
    host path (io/creator) for those.
    """
    if color_format == F.ColorFormat.BC7:
        raise NotImplementedError("BC7 encode is host-side (io/asset.encode_asset)")
    if F.is_cluster_format(sh_format):
        raise NotImplementedError("cluster SH needs k-means (io/creator)")

    use_chunks = F.uses_chunks(pos_format, scale_format, color_format, sh_format)
    n = int(g.means.shape[0])

    @functools.partial(jax.jit, static_argnums=())
    def enc(g: Gaussians):
        pos = g.means.astype(jnp.float32)
        scale = g.scales.astype(jnp.float32)
        color = g.base_color.astype(jnp.float32)
        opacity = g.opacities.astype(jnp.float32)
        sh = g.sh.astype(jnp.float32)
        rot01 = pack_smallest3(g.rotations.astype(jnp.float32))
        rot_q = (
            _enc_j(jnp.clip(rot01[:, 0], 0.0, 1.0), 1023)
            | (_enc_j(jnp.clip(rot01[:, 1], 0.0, 1.0), 1023) << 10)
            | (_enc_j(jnp.clip(rot01[:, 2], 0.0, 1.0), 1023) << 20)
            | (_enc_j(jnp.clip(rot01[:, 3], 0.0, 1.0), 3) << 30)
        )

        chunk_info = None
        if use_chunks:
            from ..ops.activations import square_centered01

            scale = jnp.power(jnp.maximum(scale, 0.0), 1.0 / 8.0)
            opacity = square_centered01(opacity)

            num_chunks = (n + F.CHUNK_SIZE - 1) // F.CHUNK_SIZE
            pad = num_chunks * F.CHUNK_SIZE - n

            def chunked(a):
                # Tail padding replicates the last chunk's first element so
                # min/max are unaffected (host encoder does the same).
                if pad:
                    fill = jnp.broadcast_to(
                        a[(num_chunks - 1) * F.CHUNK_SIZE][None],
                        (pad,) + a.shape[1:],
                    )
                    a = jnp.concatenate([a, fill])
                return a.reshape(num_chunks, F.CHUNK_SIZE, *a.shape[1:])

            eps = 1.0e-5
            cpos, cscl = chunked(pos), chunked(scale)
            col4 = jnp.concatenate([color, opacity[:, None]], axis=-1)
            ccol4, csh = chunked(col4), chunked(sh)
            pmin, pmax = cpos.min(1), cpos.max(1)
            smin, smax = cscl.min(1), cscl.max(1)
            cmin, cmax = ccol4.min(1), ccol4.max(1)
            shmin, shmax = csh.min(axis=(1, 2)), csh.max(axis=(1, 2))
            pmax = jnp.maximum(pmax, pmin + eps)
            smax = jnp.maximum(smax, smin + eps)
            cmax = jnp.maximum(cmax, cmin + eps)
            shmax = jnp.maximum(shmax, shmin + eps)

            # ChunkInfo word layout (GaussianSplatAsset.cs:231-237).
            pos_pairs = jnp.stack([pmin, pmax], axis=-1).reshape(num_chunks, 6)
            chunk_info = jnp.concatenate(
                [
                    _f16_pair_j(cmin[:, i], cmax[:, i])[:, None]
                    for i in range(4)
                ]
                + [jax.lax.bitcast_convert_type(pos_pairs, jnp.uint32)]
                + [
                    _f16_pair_j(smin[:, i], smax[:, i])[:, None]
                    for i in range(3)
                ]
                + [
                    _f16_pair_j(shmin[:, i], shmax[:, i])[:, None]
                    for i in range(3)
                ],
                axis=1,
            )  # (num_chunks, 16) u32

            def normalize(x, lo, hi):
                # Per-splat [0,1] within the chunk, at chunk-blocked shape
                # with chunk-constant coefficients broadcasting along the
                # CHUNK_SIZE axis (same pattern as decode_device's lerp1).
                width = int(np.prod(x.shape[1:])) if x.ndim > 1 else 1
                xp = jnp.pad(x.reshape(n, -1), ((0, pad), (0, 0)))
                x3 = xp.reshape(num_chunks, F.CHUNK_SIZE, width)
                lo_b = lo.reshape(num_chunks, 1, width)
                hi_b = hi.reshape(num_chunks, 1, width)
                out = (x3 - lo_b) / (hi_b - lo_b)
                return out.reshape(-1, width)[:n].reshape(x.shape)

            pos = normalize(pos, pmin, pmax)
            scale = normalize(scale, smin, smax)
            color = normalize(color, cmin[:, :3], cmax[:, :3])
            opacity = normalize(opacity, cmin[:, 3], cmax[:, 3])
            if sh_format in (F.SHFormat.Norm11, F.SHFormat.Norm6):
                # Per-channel chunk bounds over all 15 coefficients.
                lo15 = jnp.repeat(shmin, F.CHUNK_SIZE, axis=0)[:n][:, None, :]
                hi15 = jnp.repeat(shmax, F.CHUNK_SIZE, axis=0)[:n][:, None, :]
                sh = (sh - lo15) / (hi15 - lo15)

        def vector_words(v01, fmt):
            v01c = jnp.clip(v01, 0.0, 1.0)
            if fmt == F.VectorFormat.Float32:
                return v01.astype(jnp.float32)
            if fmt == F.VectorFormat.Norm16:
                return jnp.clip(v01c * 65535.5, 0, 65535).astype(jnp.uint16)
            if fmt == F.VectorFormat.Norm11:
                return (
                    _enc_j(v01c[:, 0], 2047)
                    | (_enc_j(v01c[:, 1], 1023) << 11)
                    | (_enc_j(v01c[:, 2], 2047) << 21)
                )
            if fmt == F.VectorFormat.Norm6:
                return (
                    _enc_j(v01c[:, 0], 63)
                    | (_enc_j(v01c[:, 1], 31) << 6)
                    | (_enc_j(v01c[:, 2], 31) << 11)
                ).astype(jnp.uint16)
            raise ValueError(fmt)

        pos_q = vector_words(pos, pos_format)
        scale_q = vector_words(scale, scale_format)

        col4 = jnp.clip(
            jnp.concatenate([color, opacity[:, None]], axis=-1), 0.0, 1.0
        )
        if color_format == F.ColorFormat.Norm8x4:
            codes = jnp.clip(col4 * 255.5, 0, 255).astype(jnp.uint32)
            color_q = (
                codes[:, 0]
                | (codes[:, 1] << 8)
                | (codes[:, 2] << 16)
                | (codes[:, 3] << 24)
            )
        elif color_format == F.ColorFormat.Float16x4:
            color_q = jnp.stack(
                [
                    _f16_pair_j(col4[:, 0], col4[:, 1]),
                    _f16_pair_j(col4[:, 2], col4[:, 3]),
                ],
                axis=-1,
            )
        elif color_format == F.ColorFormat.Float32x4:
            color_q = jnp.concatenate([color, opacity[:, None]], axis=-1)
        else:
            raise NotImplementedError(color_format)

        sh45 = sh.reshape(n, 45)
        if sh_format == F.SHFormat.Float32:
            sh_q = sh45
        elif sh_format == F.SHFormat.Float16:
            sh48 = jnp.pad(sh45, ((0, 0), (0, 3)))
            sh_q = _f16_pair_j(sh48[:, 0::2], sh48[:, 1::2])  # (n, 24)
        elif sh_format == F.SHFormat.Norm11:
            s = jnp.clip(sh.reshape(n, 15, 3), 0.0, 1.0)
            sh_q = (
                _enc_j(s[..., 0], 2047)
                | (_enc_j(s[..., 1], 1023) << 11)
                | (_enc_j(s[..., 2], 2047) << 21)
            )
        elif sh_format == F.SHFormat.Norm6:
            s = jnp.clip(sh.reshape(n, 15, 3), 0.0, 1.0)
            sh_q = (
                _enc_j(s[..., 0], 31)
                | (_enc_j(s[..., 1], 63) << 5)
                | (_enc_j(s[..., 2], 31) << 11)
            ).astype(jnp.uint16)
        else:
            raise ValueError(sh_format)

        return pos_q, rot_q, scale_q, color_q, sh_q, chunk_info

    pos_q, rot_q, scale_q, color_q, sh_q, chunk_info = enc(g)
    return DeviceAsset(
        pos_q=pos_q,
        rot_q=rot_q,
        scale_q=scale_q,
        color_q=color_q,
        sh_q=sh_q,
        sh_idx=None,
        chunk_info=chunk_info,
        splat_count=n,
        pos_format=pos_format,
        scale_format=scale_format,
        color_format=color_format,
        sh_format=sh_format,
    )
