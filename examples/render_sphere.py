"""Demo: render the synthetic sphere scene and save a PNG.

Runs on whatever backend JAX selects (the TPU under the ambient env).
Usage: python examples/render_sphere.py [out.png]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from unitygaussiansplatting_tpu import Camera, RenderSettings
from unitygaussiansplatting_tpu.models.renderer import render_over_background
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene


def save_png(path, img):
    # Minimal PNG writer (no PIL dependency assumption).
    import struct, zlib

    arr = np.clip(np.asarray(img) * 255.0, 0, 255).astype(np.uint8)
    h, w, _ = arr.shape
    raw = b"".join(b"\x00" + arr[i].tobytes() for i in range(h))

    def chunk(tag, data):
        c = struct.pack(">I", len(data)) + tag + data
        return c + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)

    png = b"\x89PNG\r\n\x1a\n"
    png += chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
    png += chunk(b"IDAT", zlib.compress(raw))
    png += chunk(b"IEND", b"")
    with open(path, "wb") as f:
        f.write(png)


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sphere.png"
    print("devices:", jax.devices())
    scene = sphere_scene(n=20_000, seed=0).activate()
    cam = Camera.look_at(
        eye=[0.0, 0.8, -3.2], target=[0, 0, 0], up=[0, 1, 0],
        fov_y_deg=45.0, width=512, height=384,
    )
    fn = jax.jit(lambda g: render_over_background(
        g, cam, background=jnp.asarray([0.1, 0.1, 0.12]),
        settings=RenderSettings(sh_order=3),
    ))
    t0 = time.time()
    img = fn(scene).block_until_ready()
    print(f"compile+first render: {time.time()-t0:.2f}s")
    t0 = time.time()
    for _ in range(5):
        img = fn(scene).block_until_ready()
    print(f"steady render: {(time.time()-t0)/5*1000:.2f} ms/frame")
    print("img stats: min", float(img.min()), "max", float(img.max()),
          "mean", float(img.mean()))
    save_png(out, img[..., :3])
    print("wrote", out)


if __name__ == "__main__":
    main()
