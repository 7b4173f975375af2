"""Measure BC7 encode quality on a realistic color texture (VERDICT r2 #7).

Builds the exact color texture the asset creator produces for a
bicycle-statistics synthetic scene (chunk-normalized color+opacity,
Morton-swizzled, GaussianSplatAssetCreator.cs:873-932 analog), encodes it
with io/bc7.py, and reports PSNR against the pre-quantization float texture
— alongside the Norm8x4 number on the same data, which is the 8-bit
ceiling: the BC7-vs-Norm8 gap isolates the encoder's cost from the
format's.

Run:  env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/measure_bc7.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from unitygaussiansplatting_tpu.io import formats as F
from unitygaussiansplatting_tpu.io.asset import morton_texel_index
from unitygaussiansplatting_tpu.io.bc7 import decode_bc7, encode_bc7
from unitygaussiansplatting_tpu.ops.morton import morton_order_np
from unitygaussiansplatting_tpu.utils.synthetic import captured_scene


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def chunk_normalized_color_tex(n: int, seed: int = 0) -> np.ndarray:
    """(H, W, 4) float in [0, 1]: the creator's color texture before the
    8-bit quantization step (asset.py encode_asset color path)."""
    raw = captured_scene(n=n, seed=seed)
    # Morton reorder as the creator does (chunk locality is what the BC7
    # blocks actually see).
    order = morton_order_np(raw.means)
    # The creator's linearized inputs: SH0->color, sigmoid opacity
    # (GaussianFileReader.cs:210-240), then per-chunk min/max normalize.
    c0 = 0.2820948
    color = raw.sh0[order] * c0 + 0.5
    opacity = 1.0 / (1.0 + np.exp(-raw.opacity_logits[order]))
    # SquareCentered01 warp (GaussianUtils.cs:25-38) as in CreateChunkData.
    x = opacity - 0.5
    opacity = 0.5 + np.sign(x) * np.sqrt(np.abs(x)) * np.sqrt(0.5)
    rgba = np.concatenate([color, opacity[:, None]], axis=-1).astype(np.float32)

    nchunks = (n + F.CHUNK_SIZE - 1) // F.CHUNK_SIZE
    pad = nchunks * F.CHUNK_SIZE - n
    padded = np.concatenate([rgba, np.repeat(rgba[-1:], pad, axis=0)])
    by_chunk = padded.reshape(nchunks, F.CHUNK_SIZE, 4)
    cmin = by_chunk.min(axis=1)
    cmax = by_chunk.max(axis=1)
    span = np.maximum(cmax - cmin, 1e-6)
    norm = ((by_chunk - cmin[:, None]) / span[:, None]).reshape(-1, 4)[:n]

    width, height = F.texture_size(n)
    tex = np.zeros((width * height, 4), np.float32)
    tex[morton_texel_index(n)] = norm
    return np.clip(tex, 0.0, 1.0).reshape(height, width, 4)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    tex = chunk_normalized_color_tex(n)
    h, w, _ = tex.shape
    print(f"scene n={n}, texture {w}x{h}")

    u8 = np.clip(tex * 255.5, 0, 255).astype(np.uint8)
    norm8 = u8.astype(np.float32) / 255.0
    print(f"Norm8x4 PSNR (8-bit ceiling): {psnr(tex, norm8):.2f} dB")

    t0 = time.time()
    blob = encode_bc7(u8)
    t_enc = time.time() - t0
    dec = decode_bc7(blob, w, h).reshape(h, w, 4).astype(np.float32) / 255.0
    p_all = psnr(tex, dec)
    p_rgb = psnr(tex[..., :3], dec[..., :3])
    p_a = psnr(tex[..., 3], dec[..., 3])
    # Per-block-u8 view: isolates BC7 from the shared 8-bit quantization.
    p_vs_u8 = psnr(u8.astype(np.float32) / 255.0, dec)
    print(
        f"BC7 PSNR: {p_all:.2f} dB total (rgb {p_rgb:.2f} / alpha {p_a:.2f}); "
        f"vs-u8 {p_vs_u8:.2f} dB; encode {t_enc:.1f}s "
        f"({blob and len(blob) / 1e6:.1f} MB, 1 B/px)"
    )


if __name__ == "__main__":
    main()
