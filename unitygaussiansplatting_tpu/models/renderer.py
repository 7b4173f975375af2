"""Render orchestration: project -> sort/bin -> rasterize -> composite.

The TPU-side analog of the reference's CPU orchestration layer
(package/Runtime/GaussianSplatRenderer.cs:108-169 ``SortAndRenderSplats`` and
:579-639 CalcViewData/SortPoints): instead of recording command buffers, it
builds one jittable function over the whole frame and lets XLA schedule it.

Two rasterizer backends share identical semantics:
- ``backend="jax"``: pure-XLA tile pipeline (differentiable via autodiff),
- ``backend="reference"``: the O(N*H*W) oracle scan (tests/small scenes).
- ``backend="pallas"``: hand-written TPU kernel (fastest; custom VJP).
"""

from __future__ import annotations

import dataclasses
import warnings
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import composite as composite_ops
from ..ops.binning import bin_splats, pair_budget
from ..ops.projection import project_splats
from ..ops.rasterize_ref import rasterize_reference
from ..ops.rasterize_tiles import rasterize_tiles_jax
from ..utils.config import RasterizeConfig, RenderSettings
from .camera import Camera
from .gaussians import Gaussians


class RenderStats(NamedTuple):
    """Per-frame counters surfaced alongside the image.

    The analog of the reference's inspector live stats
    (GaussianSplatRendererEditor.cs:333-347) plus the failure signal the
    static pair budget introduces: ``num_pairs`` is the true (splat, tile)
    pair demand; if it exceeds ``budget``, pairs were dropped and the frame
    is missing content (depth-major truncation on the XLA backend,
    splat-id-major on the fused pallas backend) — raise
    ``config.pair_multiplier``.
    """

    num_pairs: jnp.ndarray  # () int32 true pair demand this frame
    budget: int  # static pair capacity
    overflowed: jnp.ndarray  # () bool: num_pairs > budget (frame truncated)
    # (N,) bool per-splat visibility (on-screen with a non-empty tile rect)
    # when requested via want_visibility — the official 3DGS "radii > 0"
    # update filter for the densification statistic; None otherwise.
    visible: jnp.ndarray | None = None


def check_overflow(stats: RenderStats, action: str = "warn") -> bool:
    """Host-side overflow check: warn/raise if the frame dropped pairs."""
    over = bool(stats.overflowed)
    if over:
        msg = (
            f"pair budget overflow: frame needed {int(stats.num_pairs)} "
            f"(splat, tile) pairs but the static budget is {stats.budget}; "
            "pairs were dropped (depth-major on the XLA backend, "
            "splat-id-major on the pallas backend). Raise "
            "config.pair_multiplier."
        )
        if action == "raise":
            raise RuntimeError(msg)
        warnings.warn(msg, stacklevel=2)
    return over


def suggest_pair_multiplier(
    gaussians,
    cameras,
    settings: RenderSettings = RenderSettings(),
    config: RasterizeConfig = RasterizeConfig(),
    slack: float = 1.2,
    model: jnp.ndarray | None = None,
) -> tuple[float, int]:
    """Measure worst-case pair demand over ``cameras``; suggest a multiplier.

    The static pair budget (``config.pair_multiplier`` x N) is the one knob
    a user must size per scene; this measures the true demand — one jitted
    N-sized pass per camera (projection + tile rects; no sort, no expansion,
    so it costs a few ms even at bicycle scale) — and returns
    ``(multiplier, max_demand)`` where ``multiplier`` covers the worst view
    times ``slack`` (headroom for camera motion / training drift).  Counts
    come from :func:`ops.binning.slot_demand` on the fp16-quantized
    projection — the exact accounting the fused pipeline and the pallas
    branch of :func:`render_with_stats` use.

    Use at scene-load or train-setup time::

        mult, _ = suggest_pair_multiplier(cloud, cams, settings, config)
        config = dataclasses.replace(config, pair_multiplier=mult)
    """
    from ..ops.binning import slot_demand
    from ..ops.tile_common import quantize_view_fp16

    if isinstance(cameras, Camera):
        cameras = [cameras]
    if not cameras:
        raise ValueError("suggest_pair_multiplier needs at least one camera")

    def demand(g, camera):
        if hasattr(g, "pos_q"):  # DeviceAsset: decode inside jit like the
            from ..io.device_asset import decode_device

            g = decode_device(g)  # render path — no persistent f32 copy
        proj = quantize_view_fp16(
            project_splats(g, camera, settings, model=model), config
        )
        return slot_demand(proj, camera.width, camera.height, config)

    if hasattr(gaussians, "pos_q"):
        n = int(gaussians.num_splats)  # DeviceAsset property
    else:
        n = int(gaussians.means.shape[0])
    worst = max(int(jax.jit(demand)(gaussians, cam)) for cam in cameras)
    return (worst * slack) / max(n, 1), worst


def render(
    gaussians: Gaussians,
    camera: Camera,
    settings: RenderSettings = RenderSettings(),
    config: RasterizeConfig = RasterizeConfig(),
    backend: str = "jax",
    model: jnp.ndarray | None = None,
    kill_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Render a splat cloud; returns (H, W, 4) premultiplied linear RGBA.

    The alpha channel is the accumulated coverage (1 - final transmittance),
    matching the reference's offscreen RT before its composite pass.
    """
    img, _ = render_with_stats(
        gaussians, camera, settings, config, backend, model=model, kill_mask=kill_mask
    )
    return img


def render_with_stats(
    gaussians: Gaussians,
    camera: Camera,
    settings: RenderSettings = RenderSettings(),
    config: RasterizeConfig = RasterizeConfig(),
    backend: str = "jax",
    model: jnp.ndarray | None = None,
    kill_mask: jnp.ndarray | None = None,
    center_probe: jnp.ndarray | None = None,
    want_visibility: bool = False,
) -> tuple[jnp.ndarray, RenderStats]:
    """Like :func:`render` but also returns per-frame :class:`RenderStats`.

    jit-safe (stats are arrays); use :func:`check_overflow` on the host side
    to act on the truncation flag.

    ``gaussians`` may also be an :class:`io.device_asset.DeviceAsset`: the
    compressed blobs then decode on device inside this jitted frame (the
    reference's per-frame ``LoadSplatData`` decode,
    GaussianSplatting.hlsl:428-608), so HBM holds only the quantized asset.

    ``center_probe`` is an (N, 2) zero array added to the projected splat
    centers: differentiating w.r.t. it yields the *screen-space* positional
    gradient (the official 3DGS densification statistic, viewspace mean2D
    grads) without re-deriving it from world gradients.  ``want_visibility``
    (static) additionally fills ``RenderStats.visible`` with the per-splat
    "has a non-empty on-screen tile rect" mask — the 3DGS ``radii > 0``
    update filter.
    """
    if hasattr(gaussians, "pos_q"):  # DeviceAsset (duck-typed: no import cycle)
        from ..io.device_asset import decode_device

        with jax.named_scope("splat_decode"):
            gaussians = decode_device(
                gaussians,
                planar_sh=getattr(config, "decode_planar_sh", False),
            )
    with jax.named_scope("splat_project"):
        proj = project_splats(
            gaussians, camera, settings, model=model, kill_mask=kill_mask
        )
    if center_probe is not None:
        proj = proj._replace(center=proj.center + center_probe)
    n = proj.depth.shape[0]

    def visibility():
        if not want_visibility:
            return None
        from ..ops.binning import tile_rects
        from ..ops.tile_common import quantize_view_fp16

        *_, counts, valid = tile_rects(
            quantize_view_fp16(proj, config), camera.width, camera.height, config
        )
        return valid & (counts > 0)

    if backend == "reference":
        img = rasterize_reference(proj, camera.width, camera.height, config)
        zero = jnp.int32(0)
        return img, RenderStats(zero, 0, zero < 0, visibility())
    budget = pair_budget(n, config)
    if backend == "jax":
        with jax.named_scope("splat_bin"):
            binning = bin_splats(proj, camera.width, camera.height, config)
        stats = RenderStats(
            num_pairs=binning.num_pairs,
            budget=budget,
            overflowed=binning.num_pairs > budget,
            visible=visibility(),
        )
        with jax.named_scope("splat_rasterize_jax"):
            img = rasterize_tiles_jax(proj, binning, camera.width, camera.height, config)
        return img, stats
    if backend == "pallas":
        from ..ops.binning import tile_rects
        from ..ops.rasterize_pallas import rasterize_tiles_pallas_diff
        from ..ops.tile_common import quantize_view_fp16

        # N-sized, nearly free; quantized first so the bounds see the same
        # fp16-rounded opacity the pipeline's own bounds see (else
        # edge-of-budget frames could truncate while stats say otherwise).
        # One tile_rects pass serves both the demand counter and the
        # visibility mask (slot_demand's accounting, inlined).
        *_, counts, valid = tile_rects(
            quantize_view_fp16(proj, config), camera.width, camera.height, config
        )
        num_slots = jnp.sum(jnp.maximum(counts, 1), dtype=jnp.int32)
        stats = RenderStats(
            num_pairs=num_slots,
            budget=budget,
            overflowed=num_slots > budget,
            visible=(valid & (counts > 0)) if want_visibility else None,
        )
        with jax.named_scope("splat_rasterize_pallas"):
            img = rasterize_tiles_pallas_diff(
                proj, camera.width, camera.height, config
            )
        return img, stats
    raise ValueError(f"unknown backend {backend!r}")


def render_over_background(
    gaussians: Gaussians,
    camera: Camera,
    background: jnp.ndarray,
    settings: RenderSettings = RenderSettings(),
    config: RasterizeConfig = RasterizeConfig(),
    backend: str = "jax",
    convert_gamma: bool = False,
) -> jnp.ndarray:
    """Full frame: splat RT composited over a background color/image.

    Mirrors GaussianSplatRenderSystem.OnPreCullCamera's RT + composite pass
    (GaussianSplatRenderer.cs:187-211).
    """
    rt = render(gaussians, camera, settings, config, backend)
    return composite_ops.composite_over(rt, background, convert_gamma=convert_gamma)


def render_multi(
    clouds: list[Gaussians],
    camera: Camera,
    settings_list: list[RenderSettings] | None = None,
    config: RasterizeConfig = RasterizeConfig(),
    backend: str = "jax",
    render_order: list[float] | None = None,
    models: list | None = None,
) -> jnp.ndarray:
    """Render several splat objects into one frame.

    Mirrors GaussianSplatRenderSystem.GatherSplatsForCamera +
    SortAndRenderSplats (GaussianSplatRenderer.cs:73-169): objects are sorted
    by explicit render order then by camera-space depth of their origin, each
    object is depth-sorted internally, and objects composite front-to-back
    into the shared RT ("under" blending).  Splats of different objects are
    NOT interleaved in depth — same policy as the reference.
    """
    n = len(clouds)
    settings_list = settings_list or [RenderSettings()] * n
    models = models or [None] * n
    order_keys = []
    for i, g in enumerate(clouds):
        origin = jnp.zeros((3,)) if models[i] is None else jnp.asarray(models[i])[:3, 3]
        depth = float(camera.world_to_view(origin)[2])
        explicit = render_order[i] if render_order else 0.0
        # Under-compositing draws front-most objects first: nearest origin
        # first, higher explicit render order in front.
        order_keys.append((-explicit, depth, i))
    order_keys.sort()

    h, w = camera.height, camera.width
    accum = jnp.zeros((h, w, 4), jnp.float32)
    for _, _, i in order_keys:
        rt = render(clouds[i], camera, settings_list[i], config, backend, model=models[i])
        # "under" compositing: new content goes behind what is already drawn.
        t = 1.0 - accum[..., 3:4]
        accum = accum + t * rt
    return accum


@partial(jax.jit, static_argnames=("backend",))
def _render_jit(gaussians, camera, settings, config, backend):
    return render(gaussians, camera, settings, config, backend)


@dataclasses.dataclass
class GaussianSplatRenderer:
    """Stateful convenience wrapper mirroring the reference's component API.

    Owns a cloud plus display settings (GaussianSplatRenderer.cs:215-251) and
    memoizes the jitted frame function.  The functional `render` above is the
    primary API; this class exists for interactive/driver use.
    """

    gaussians: Gaussians
    settings: RenderSettings = RenderSettings()
    config: RasterizeConfig = RasterizeConfig()
    backend: str = "jax"

    def render_frame(self, camera: Camera) -> jnp.ndarray:
        return _render_jit(self.gaussians, camera, self.settings, self.config, self.backend)
