"""BC7 color-texture codec for asset compatibility.

The reference's VeryLow preset compresses the color texture to BC7 via the
Unity editor (GaussianSplatAssetCreator.cs:903-932, ColorFormat.BC7 in
GaussianSplatAsset.cs:51-68) and decodes it in-shader through the GPU's
texture units.  TPUs have no BC hardware, so:

- **decode** uses Pillow's native BC7 ("bcn") decoder — a complete,
  spec-table-driven implementation covering all 8 modes/partitions (hand
  re-deriving the 64-entry partition + anchor tables from memory is the
  classic way to ship a silently-wrong decoder, so we deliberately depend
  on the battle-tested one and pin it with hand-computed block vectors in
  tests);
- **encode** is a minimal single-subset mode-5 encoder (RGB 7.7.7 x2 +
  A 8 x2, independent 2-bit color and alpha index planes — the asset
  texture's alpha channel is uncorrelated opacity, which would destroy a
  shared-index mode): per 4x4 block, endpoints = channel min/max, indices
  by projection onto the endpoint segment.  Quality is below Unity's
  full-search encoder but the produced blocks are valid BC7 anyone can
  load, and they reproduce the VeryLow preset's 1 B/px size point.
"""

from __future__ import annotations

import numpy as np

# BC7 interpolation weights (Khronos/D3D spec aWeight2/aWeight4); their
# correctness is asserted empirically against the PIL decoder in tests.
WEIGHTS2 = np.array([0, 21, 43, 64], np.int32)
WEIGHTS4 = np.array(
    [0, 4, 9, 13, 17, 21, 26, 30, 34, 38, 43, 47, 51, 55, 60, 64], np.int32
)


def decode_bc7(data: bytes, width: int, height: int) -> np.ndarray:
    """Decode raw BC7 blocks to (height, width, 4) uint8 RGBA."""
    from PIL import Image

    if width % 4 or height % 4:
        raise ValueError(f"BC7 dimensions must be multiples of 4: {width}x{height}")
    expected = (width // 4) * (height // 4) * 16
    if len(data) < expected:
        raise ValueError(f"BC7 blob too short: {len(data)} < {expected}")
    img = Image.frombytes("RGBA", (width, height), data[:expected], "bcn", (7, ""))
    return np.asarray(img, np.uint8).reshape(height, width, 4)


def _pack_block_mode5(e0q, e1q, a0, a1, cidx, aidx) -> bytes:
    """One mode-5 block: stored 7-bit RGB endpoints x2 + A 8 x2, two 2-bit
    index planes."""
    bits = 1 << 5  # mode-5 marker
    pos = 6
    pos += 2  # rotation = 0 (alpha stays alpha)
    for c in range(3):
        bits |= int(e0q[c]) << pos
        pos += 7
        bits |= int(e1q[c]) << pos
        pos += 7
    bits |= int(a0) << pos
    pos += 8
    bits |= int(a1) << pos
    pos += 8
    bits |= int(cidx[0]) << pos  # anchor: 1 bit
    pos += 1
    for i in range(1, 16):
        bits |= int(cidx[i]) << pos
        pos += 2
    bits |= int(aidx[0]) << pos  # anchor: 1 bit
    pos += 1
    for i in range(1, 16):
        bits |= int(aidx[i]) << pos
        pos += 2
    assert pos == 128
    return int(bits).to_bytes(16, "little")


def _fit_indices(blocks, e0, e1, weights):
    """Least-squares index per pixel along the e0->e1 segment; (B, 16)."""
    seg = (e1 - e0).astype(np.float32)
    seg_len = np.maximum(np.sum(seg * seg, axis=-1, keepdims=True), 1e-6)
    t = np.sum((blocks - e0[:, None]) * seg[:, None], axis=-1) / seg_len
    return np.argmin(
        np.abs(t[..., None] * 64.0 - weights[None, None]), axis=-1
    ).astype(np.int32)


def encode_bc7(rgba: np.ndarray) -> bytes:
    """Encode (H, W, 4) uint8 RGBA as mode-5 BC7 blocks (H, W % 4 == 0).

    Mode 5 carries an independent 2-bit alpha index plane, so uncorrelated
    opacity (the asset texture's alpha channel) cannot corrupt color.
    """
    h, w, _ = rgba.shape
    if w % 4 or h % 4:
        raise ValueError(f"BC7 dimensions must be multiples of 4: {w}x{h}")
    # (nblocks, 16, 4) pixel blocks, row-major within each block.
    blocks4 = (
        rgba.reshape(h // 4, 4, w // 4, 4, 4)
        .transpose(0, 2, 1, 3, 4)
        .reshape(-1, 16, 4)
        .astype(np.int32)
    )
    rgb = blocks4[..., :3]
    alpha = blocks4[..., 3:4]
    e0q = rgb.min(axis=1) >> 1  # stored 7-bit endpoint values
    e1q = rgb.max(axis=1) >> 1
    # The decoder reconstructs a 7-bit endpoint as (v << 1) | (v >> 6)
    # (bit replication); fit indices against that exact lattice.
    e0 = (e0q << 1) | (e0q >> 6)
    e1 = (e1q << 1) | (e1q >> 6)
    cidx = _fit_indices(rgb, e0, e1, WEIGHTS2)
    a0 = alpha.min(axis=1)[:, 0]
    a1 = alpha.max(axis=1)[:, 0]
    aidx = _fit_indices(alpha, a0[:, None], a1[:, None], WEIGHTS2)
    # Anchor constraints: index 0 of each plane has 1 bit (must be 0 or 1).
    cswap = cidx[:, 0] > 1
    e0s = np.where(cswap[:, None], e1q, e0q)
    e1s = np.where(cswap[:, None], e0q, e1q)
    cidxs = np.where(cswap[:, None], 3 - cidx, cidx)
    aswap = aidx[:, 0] > 1
    a0s = np.where(aswap, a1, a0)
    a1s = np.where(aswap, a0, a1)
    aidxs = np.where(aswap[:, None], 3 - aidx, aidx)

    out = bytearray()
    for b in range(blocks4.shape[0]):
        out += _pack_block_mode5(e0s[b], e1s[b], a0s[b], a1s[b], cidxs[b], aidxs[b])
    return bytes(out)


