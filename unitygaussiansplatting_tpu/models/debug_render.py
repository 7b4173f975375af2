"""Debug render modes: points, index colors, splat boxes, chunk bounds.

Equivalents of the reference's debug visualizations
(package/Runtime/GaussianSplatRenderer.cs:217-224 RenderMode and the
GaussianDebugRenderPoints/Boxes shaders): quick visual fixtures that bypass
the full pipeline to isolate decode errors from projection/compositing errors
(SURVEY.md §4.3).  Implemented as scatters rather than draws — these are
debug paths, not hot paths.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils.config import RenderSettings
from .camera import Camera
from .gaussians import Gaussians


def _index_color(idx: jnp.ndarray) -> jnp.ndarray:
    """Hash a splat index into a stable debug color (analog of the
    index-as-color mode, GaussianDebugRenderPoints.shader:31-58)."""
    h = (idx.astype(jnp.uint32) * jnp.uint32(2654435761)) & jnp.uint32(0xFFFFFF)
    r = (h & 0xFF).astype(jnp.float32) / 255.0
    g = ((h >> 8) & 0xFF).astype(jnp.float32) / 255.0
    b = ((h >> 16) & 0xFF).astype(jnp.float32) / 255.0
    return jnp.stack([r, g, b], axis=-1)


def render_debug_points(
    g: Gaussians,
    camera: Camera,
    point_size: int = 2,
    by_index: bool = False,
    background=(0.0, 0.0, 0.0),
) -> jnp.ndarray:
    """Render splat centers as fixed-size squares (DebugPoints mode)."""
    view = g.means @ camera.view[:3, :3].T + camera.view[:3, 3]
    valid = view[:, 2] > 1e-6
    pix = camera.view_to_pixel(view)
    n = g.num_splats
    color = _index_color(jnp.arange(n)) if by_index else g.base_color

    img = jnp.zeros((camera.height, camera.width, 3), jnp.float32) + jnp.asarray(
        background, jnp.float32
    )
    x0 = jnp.round(pix[:, 0]).astype(jnp.int32)
    y0 = jnp.round(pix[:, 1]).astype(jnp.int32)
    for dy in range(point_size):
        for dx in range(point_size):
            x = x0 + dx - point_size // 2
            y = y0 + dy - point_size // 2
            ok = valid & (x >= 0) & (x < camera.width) & (y >= 0) & (y < camera.height)
            xs = jnp.where(ok, x, 0)
            ys = jnp.where(ok, y, 0)
            img = img.at[ys, xs].set(
                jnp.where(ok[:, None], color, img[ys, xs]), mode="drop"
            )
    return img


def render_debug_boxes(
    g: Gaussians,
    camera: Camera,
    settings: RenderSettings = RenderSettings(),
    background=(0.0, 0.0, 0.0),
) -> jnp.ndarray:
    """Render each splat's +-2 sigma screen AABB as a translucent overlay
    (DebugBoxes analog, screen-space variant of the 3D box shader)."""
    from ..ops.projection import project_splats

    proj = project_splats(g, camera, settings)
    rx = 2.0 * (jnp.abs(proj.axis1[:, 0]) + jnp.abs(proj.axis2[:, 0]))
    ry = 2.0 * (jnp.abs(proj.axis1[:, 1]) + jnp.abs(proj.axis2[:, 1]))

    ys = jnp.arange(camera.height, dtype=jnp.float32)[:, None] + 0.5
    xs = jnp.arange(camera.width, dtype=jnp.float32)[None, :] + 0.5
    img = jnp.zeros((camera.height, camera.width, 3), jnp.float32) + jnp.asarray(
        background, jnp.float32
    )

    # Accumulate coverage counts (cheap O(N * H * W) debug path; use the real
    # renderer for anything hot).
    def body(img, splat):
        cx, cy, rxi, ryi, color, ok = splat
        inside = (
            (jnp.abs(xs - cx) <= rxi) & (jnp.abs(ys - cy) <= ryi) & ok
        )
        return img + inside[..., None] * color * 0.1, None

    import jax

    colors = _index_color(jnp.arange(g.num_splats))
    img, _ = jax.lax.scan(
        body,
        img,
        (proj.center[:, 0], proj.center[:, 1], rx, ry, colors, proj.valid),
    )
    return jnp.clip(img, 0.0, 1.0)


def render_debug_chunk_bounds(
    g: Gaussians, camera: Camera, chunk_size: int = 256, background=(0.0, 0.0, 0.0)
) -> jnp.ndarray:
    """Visualize 256-splat chunk bounds as points colored per chunk
    (DebugChunkBounds analog; chunks follow Morton order after import)."""
    chunk_ids = jnp.arange(g.num_splats) // chunk_size
    view = g.means @ camera.view[:3, :3].T + camera.view[:3, 3]
    valid = view[:, 2] > 1e-6
    pix = camera.view_to_pixel(view)
    color = _index_color(chunk_ids)
    img = jnp.zeros((camera.height, camera.width, 3), jnp.float32) + jnp.asarray(
        background, jnp.float32
    )
    x = jnp.round(pix[:, 0]).astype(jnp.int32)
    y = jnp.round(pix[:, 1]).astype(jnp.int32)
    ok = valid & (x >= 0) & (x < camera.width) & (y >= 0) & (y < camera.height)
    return img.at[jnp.where(ok, y, 0), jnp.where(ok, x, 0)].set(
        jnp.where(ok[:, None], color, img[jnp.where(ok, y, 0), jnp.where(ok, x, 0)]),
        mode="drop",
    )
