"""Splat projection: world-space Gaussians -> screen-space view data.

The TPU-native equivalent of the reference's per-splat view-calc kernel
``CSCalcViewData`` (package/Shaders/SplatUtilities.compute:189-252): world/clip
transform, deleted/cutout kill, 3D covariance -> EWA 2D covariance ->
screen-axis decomposition, SH shading.  One fully-vectorized jnp pass over all
N splats; pointwise over the splat axis, so it shards trivially along a device
mesh and XLA fuses the whole chain.

Output differences from the reference's 40-byte ``SplatViewData``
(GaussianSplatting.hlsl:610-615): we additionally keep the conic and depth
(the reference re-derives pixel falloff from the quad axes in the fragment
shader and sorts by a separate distance-key pass, SplatUtilities.compute:69-82;
our tile rasterizer consumes conics directly).
"""

from __future__ import annotations

from typing import TYPE_CHECKING, NamedTuple

import jax
import jax.numpy as jnp

from ..utils.config import RenderSettings
from .covariance import project_covariance_planar
from .sh import shade_sh

if TYPE_CHECKING:  # avoid a models <-> ops circular import at runtime
    from ..models.camera import Camera
    from ..models.gaussians import Gaussians

OPACITY_CLAMP = 65000.0  # SplatUtilities.compute:246


class ProjectedSplats(NamedTuple):
    """Screen-space splat data, one entry per input splat."""

    depth: jnp.ndarray  # (N,) view-space depth (> 0 in front of camera)
    center: jnp.ndarray  # (N, 2) pixel coords of the splat center (y down)
    axis1: jnp.ndarray  # (N, 2) major screen axis, pixels
    axis2: jnp.ndarray  # (N, 2) minor screen axis, pixels
    conic: jnp.ndarray  # (N, 3) inverse 2D covariance (a, b, c), pixel space
    color: jnp.ndarray  # (N, 3) shaded RGB
    opacity: jnp.ndarray  # (N,) scaled opacity
    valid: jnp.ndarray  # (N,) bool: in front of camera and not killed


def project_splats(
    g: "Gaussians",
    camera: "Camera",
    settings: RenderSettings = RenderSettings(),
    model: jnp.ndarray | None = None,
    kill_mask: jnp.ndarray | None = None,
) -> ProjectedSplats:
    """Project a Gaussian cloud into screen space.

    Args:
      g: activated splat cloud.
      camera: the render camera.
      settings: display options (splat/opacity scale, SH order).
      model: optional (4, 4) object->world matrix; identity when None.  Like
        the reference, the covariance pipeline runs in object space with the
        model rotation folded into the model-view matrix
        (SplatUtilities.compute:236 passes ``_MatrixMV``).
      kill_mask: optional (N,) bool; True kills a splat (deleted bits /
        cutouts — the reference forces clip w to 0, compute:204-220).
    """
    # XLA's default f32 matmul on TPU is a single bf16 MXU pass; for the
    # px-scale position transform that is a ~0.4%-relative (multi-pixel)
    # error, so the tiny (N, 3) x (3, 3) transforms pin full precision.
    hi = jax.lax.Precision.HIGHEST
    view = camera.view
    if model is not None:
        mv = jnp.matmul(view, model, precision=hi)
        means_world = (
            jnp.dot(g.means, model[:3, :3].T, precision=hi) + model[:3, 3]
        )
        # Reference shades SH in object space via the world->object rotation
        # (compute:240-242); equivalent here to rotating the world-space view
        # direction by the inverse model rotation.
        inv_model_rot = jnp.linalg.inv(model[:3, :3])
    else:
        mv = view
        means_world = g.means
        inv_model_rot = None

    view_pos = jnp.dot(g.means, mv[:3, :3].T, precision=hi) + mv[:3, 3]
    depth = view_pos[..., 2]
    in_front = depth > 1e-8
    if kill_mask is not None:
        valid = in_front & (~kill_mask)
    else:
        valid = in_front

    center = camera.view_to_pixel(view_pos)

    # 3D covariance in object space (scaled by splat_scale^2, compute:229-235)
    # -> EWA 2D -> screen axes, fused on planar (N,) columns: same math as
    # covariance3d/ewa_project/decompose_covariance2d term-for-term, but
    # without the (N, 3, 3)/(N, 3) intermediates whose cross-lane assembly
    # dominated the stage (30.2 -> ~8 ms at 6.1M splats, tools/tpu_jobs/930/934).
    splat_scale2 = jnp.square(
        jnp.asarray(settings.splat_scale, dtype=g.scales.dtype)
    )
    axes, cov2d = project_covariance_planar(
        g.rotations, g.scales, splat_scale2, view_pos, mv[:3, :3],
        camera.focal, camera.tan_fovx, camera.tan_fovy,
    )

    cxx, cxy, cyy = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = cxx * cyy - cxy * cxy
    inv_det = 1.0 / jnp.maximum(det, 1e-12)
    conic = jnp.stack([cyy * inv_det, -cxy * inv_det, cxx * inv_det], axis=-1)

    # View-dependent color: direction camera->splat in object space.
    cam_pos = camera.position
    view_dir = means_world - cam_pos
    if inv_model_rot is not None:
        view_dir = jnp.dot(view_dir, inv_model_rot.T, precision=hi)
    # Norm floored inside the sqrt (linalg.norm's VJP divides by the norm:
    # a splat exactly at the camera would emit NaN grads despite being
    # masked invalid downstream).
    view_dir = view_dir / jnp.sqrt(
        jnp.maximum(jnp.sum(view_dir * view_dir, axis=-1, keepdims=True), 1e-24)
    )
    color = shade_sh(
        g.base_color,
        g.sh if settings.sh_order > 0 else None,
        view_dir,
        settings.sh_order,
        settings.sh_only,
    )
    opacity = jnp.minimum(
        g.opacities * jnp.asarray(settings.opacity_scale, dtype=g.opacities.dtype),
        OPACITY_CLAMP,
    )
    if settings.fp16_color:
        color = color.astype(jnp.float16).astype(jnp.float32)
        opacity = opacity.astype(jnp.float16).astype(jnp.float32)

    return ProjectedSplats(
        depth=depth,
        center=center,
        axis1=axes.axis1,
        axis2=axes.axis2,
        conic=conic,
        color=color,
        opacity=opacity,
        valid=valid,
    )
