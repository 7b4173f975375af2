"""Hand-constructed reference-layout assets decoded against the HLSL spec.

The committed byte fixtures (tests/fixtures) were produced by this repo's own
encoder, so they catch drift but not a shared systematic error.  These tests
break that loop: the blobs are built byte-by-byte here with struct packing
following ONLY the reference's published layouts, and the expected floats are
computed by an independent ~40-line spec decoder transcribed from the HLSL —
GaussianSplatting.hlsl:261-304 (DecodePacked_*), :394-421 (pos load),
:428-608 (LoadSplatData: chunk lerp, scale^8, InvSquareCentered01),
:120-127/:183-195 (Morton texel swizzle), GaussianSplatAsset.cs:31-101
(strides) — never by running this repo's encoder.  Anchor values for the
corner codes are additionally written as hand-computed literals.
"""

import struct

import numpy as np

from unitygaussiansplatting_tpu.io import formats as F
from unitygaussiansplatting_tpu.io.asset import GaussianSplatAssetData, decode_asset


# --- independent spec decoders (transcribed from the HLSL, not repo code) ---

def spec_norm11(enc):  # DecodePacked_11_10_11
    return ((enc & 2047) / 2047.0, ((enc >> 11) & 1023) / 1023.0,
            ((enc >> 21) & 2047) / 2047.0)


def spec_565(enc):  # DecodePacked_5_6_5
    return ((enc & 31) / 31.0, ((enc >> 5) & 63) / 63.0, ((enc >> 11) & 31) / 31.0)


def spec_10_10_10_2(enc):  # DecodePacked_10_10_10_2
    return ((enc & 1023) / 1023.0, ((enc >> 10) & 1023) / 1023.0,
            ((enc >> 20) & 1023) / 1023.0, ((enc >> 30) & 3) / 3.0)


def spec_inv_square_centered01(x):  # GaussianSplatting.hlsl:5-11
    x -= 0.5
    x *= 0.5
    x = np.sqrt(abs(x)) * np.sign(x)
    return x + 0.5


def spec_morton_texel(idx):  # hlsl:120-127 + SplatIndexToPixelIndex :183-195
    t = idx & 0xFF
    t = (t | ((t & 0xFE) << 7)) & 0x5555
    t = (t ^ (t >> 1)) & 0x3333
    t = (t ^ (t >> 2)) & 0x0F0F
    x, y = t & 0xF, t >> 8
    blocks_w = 2048 // 16
    block = idx >> 8
    return ((block // blocks_w) * 16 + y) * 2048 + (block % blocks_w) * 16 + x


def f16(v) -> int:
    return int(np.float32(v).astype(np.float16).view(np.uint16))


def f16_pair(lo, hi) -> int:
    return f16(lo) | (f16(hi) << 16)


def lerp(a, b, t):
    return a + (b - a) * t


def test_medium_preset_handbuilt_blob_decodes_to_spec():
    # One chunk, 3 splats; Medium preset: pos Norm11, scale Norm11,
    # color Norm8x4, SH Norm6 (non-cluster -> no SH index in 'other').
    n = 3

    # Chunk ranges (all f16/f32-exact values).  SplatChunkInfo layout
    # (hlsl:197-203): colR,colG,colB,colA | posX,posY,posZ (float2 each) |
    # sclX,sclY,sclZ | shR,shG,shB.
    col_rng = [(0.0, 1.0), (0.25, 0.75), (0.0, 0.5), (0.0, 1.0)]
    pos_rng = [(-1.0, 3.0), (0.0, 2.0), (-2.0, 0.0)]
    scl_rng = [(0.5, 1.0), (0.0, 1.0), (0.25, 0.75)]
    sh_rng = [(-1.0, 1.0), (0.0, 0.5), (-0.5, 0.5)]
    chunk_blob = b"".join(
        [struct.pack("<I", f16_pair(lo, hi)) for lo, hi in col_rng]
        + [struct.pack("<ff", lo, hi) for lo, hi in pos_rng]
        + [struct.pack("<I", f16_pair(lo, hi)) for lo, hi in scl_rng]
        + [struct.pack("<I", f16_pair(lo, hi)) for lo, hi in sh_rng]
    )
    assert len(chunk_blob) == 64  # 16 uints

    # Raw codes per splat (corner codes for 0/1, mid codes for 2).
    pos_codes = [
        0,
        2047 | (1023 << 11) | (2047 << 21),
        1024 | (512 << 11) | (256 << 21),
    ]
    rot_codes = [
        0,
        1023 | (511 << 10) | (256 << 20) | (3 << 30),
        100 | (200 << 10) | (300 << 20) | (2 << 30),
    ]
    scl_codes = [
        0,
        2047 | (1023 << 11) | (2047 << 21),
        1024 | (512 << 11) | (1024 << 21),
    ]
    pos_blob = b"".join(struct.pack("<I", c) for c in pos_codes)
    # other stride = 4 (rot 10.10.10.2) + 4 (scale Norm11): hlsl:437-446.
    other_blob = b"".join(
        struct.pack("<II", r, s) for r, s in zip(rot_codes, scl_codes)
    )

    # Color texture: 2048-wide, height rounded to 16; splat idx -> Morton-
    # swizzled texel (hlsl:183-195).  RGBA8.
    tw, th = 2048, 16
    tex = np.zeros((tw * th, 4), np.uint8)
    rgba = [(0, 255, 128, 255), (255, 0, 0, 128), (64, 64, 64, 0)]
    for i in range(n):
        tex[spec_morton_texel(i)] = rgba[i]
    color_blob = tex.tobytes()

    # SH Norm6: 16 ushorts per splat (15 coeffs + pad), 5_6_5 per coeff.
    sh_codes = [
        [((s * 5 + j) % 32) | (((s * 7 + j) % 64) << 5) | (((s * 11 + j) % 32) << 11)
         for j in range(15)]
        for s in range(n)
    ]
    sh_blob = b"".join(
        struct.pack("<16H", *(codes + [0])) for codes in sh_codes
    )

    asset = GaussianSplatAssetData(
        splat_count=n,
        pos_format=F.VectorFormat.Norm11,
        scale_format=F.VectorFormat.Norm11,
        color_format=F.ColorFormat.Norm8x4,
        sh_format=F.SHFormat.Norm6,
        bounds_min=np.asarray([-1.0, 0.0, -2.0], np.float32),
        bounds_max=np.asarray([3.0, 2.0, 0.0], np.float32),
        chunk_blob=chunk_blob,
        pos_blob=pos_blob,
        other_blob=other_blob,
        color_blob=color_blob,
        sh_blob=sh_blob,
    )
    got = decode_asset(asset)

    # Spec-side expected values (independent decode following the HLSL).
    for i in range(n):
        p01 = spec_norm11(pos_codes[i])
        exp_pos = [lerp(pos_rng[k][0], pos_rng[k][1], p01[k]) for k in range(3)]
        np.testing.assert_allclose(got.pos[i], exp_pos, rtol=1e-6, atol=1e-6)

        exp_rot = spec_10_10_10_2(rot_codes[i])
        np.testing.assert_allclose(got.rot[i], exp_rot, rtol=1e-6, atol=1e-6)

        s01 = spec_norm11(scl_codes[i])
        exp_scl = [lerp(scl_rng[k][0], scl_rng[k][1], s01[k]) ** 8 for k in range(3)]
        np.testing.assert_allclose(got.scale[i], exp_scl, rtol=1e-5, atol=1e-9)

        c01 = [v / 255.0 for v in rgba[i]]
        exp_col = [lerp(col_rng[k][0], col_rng[k][1], c01[k]) for k in range(3)]
        np.testing.assert_allclose(got.color[i], exp_col, rtol=1e-6, atol=1e-6)
        exp_op = spec_inv_square_centered01(lerp(col_rng[3][0], col_rng[3][1], c01[3]))
        np.testing.assert_allclose(got.opacity[i], exp_op, rtol=1e-6, atol=1e-6)

        for j in range(15):
            sh01 = spec_565(sh_codes[i][j])
            exp_sh = [lerp(sh_rng[k][0], sh_rng[k][1], sh01[k]) for k in range(3)]
            np.testing.assert_allclose(got.sh[i, j], exp_sh, rtol=1e-5, atol=1e-6)

    # Hand-computed literal anchors (corner codes, worked by hand from the
    # formulas above — catches an error duplicated into both decoders):
    np.testing.assert_allclose(got.pos[0], [-1.0, 0.0, -2.0], atol=1e-6)
    np.testing.assert_allclose(got.pos[1], [3.0, 2.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(
        got.pos[2], [2049.0 / 2047.0, 1024.0 / 1023.0, -2.0 + 512.0 / 2047.0],
        atol=1e-5,
    )
    np.testing.assert_allclose(got.scale[0], [0.5**8, 0.0, 0.25**8], atol=1e-10)
    np.testing.assert_allclose(got.scale[1], [1.0, 1.0, 0.75**8], atol=1e-6)
    np.testing.assert_allclose(got.rot[1], [1.0, 511 / 1023, 256 / 1023, 1.0],
                               atol=1e-6)
    assert abs(got.opacity[0] - 1.0) < 1e-6  # ISC01(1.0) = 1.0
    assert abs(got.opacity[2] - 0.0) < 1e-6  # ISC01(0.0) = 0.0
    # splat0 color: g maps to 0.25 + 1.0*(0.75-0.25) = 0.75 exactly.
    assert abs(got.color[0][1] - 0.75) < 1e-6


def test_veryhigh_preset_handbuilt_blob_decodes_to_spec():
    # Fully lossless config: no chunks, raw f32 everywhere; 'other' stride =
    # 4 (rot) + 12 (f32 scale); SH stride 192 B (48 f32, 45 used).  No
    # scale^8 / opacity warp outside the chunk branch (hlsl:559-583).
    n = 2
    pos = np.asarray([[1.5, -2.25, 3.75], [-0.125, 0.5, 10.0]], np.float32)
    scale = np.asarray([[0.01, 0.2, 3.0], [1.0, 0.5, 0.25]], np.float32)
    rot_codes = [5 | (10 << 10) | (20 << 20) | (1 << 30), 0x3FFFFFFF]
    pos_blob = pos.tobytes()
    other_blob = b"".join(
        struct.pack("<I", rot_codes[i]) + scale[i].tobytes() for i in range(n)
    )

    tw, th = 2048, 16
    tex = np.zeros((tw * th, 4), np.float32)
    rgba = [(0.25, 2.0, -0.5, 0.75), (1.0, 0.0, 0.125, 0.25)]
    for i in range(n):
        tex[spec_morton_texel(i)] = rgba[i]
    color_blob = tex.tobytes()

    sh = np.arange(n * 45, dtype=np.float32).reshape(n, 45) * 0.0625 - 1.0
    sh_pad = np.concatenate([sh, np.zeros((n, 3), np.float32)], axis=1)
    sh_blob = sh_pad.tobytes()
    assert len(sh_blob) == n * 192

    asset = GaussianSplatAssetData(
        splat_count=n,
        pos_format=F.VectorFormat.Float32,
        scale_format=F.VectorFormat.Float32,
        color_format=F.ColorFormat.Float32x4,
        sh_format=F.SHFormat.Float32,
        bounds_min=pos.min(axis=0),
        bounds_max=pos.max(axis=0),
        chunk_blob=b"",
        pos_blob=pos_blob,
        other_blob=other_blob,
        color_blob=color_blob,
        sh_blob=sh_blob,
    )
    got = decode_asset(asset)

    np.testing.assert_allclose(got.pos, pos, atol=0)
    np.testing.assert_allclose(got.scale, scale, atol=0)  # raw, no ^8
    for i in range(n):
        np.testing.assert_allclose(got.rot[i], spec_10_10_10_2(rot_codes[i]),
                                   atol=1e-6)
        np.testing.assert_allclose(got.color[i], rgba[i][:3], atol=0)
        assert got.opacity[i] == np.float32(rgba[i][3])  # no ISC01 warp
    np.testing.assert_allclose(got.sh, sh.reshape(n, 15, 3), atol=0)
