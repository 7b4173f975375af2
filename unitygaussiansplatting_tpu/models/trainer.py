"""Training: losses and optimization steps for splat clouds.

The reference is a viewer with no backward pass (SURVEY.md §0); this module
provides the training half the TPU build adds: the standard 3DGS photometric
loss (L1 + D-SSIM as in Kerbl et al. 2023) and jitted optimizer steps over
the raw (pre-activation) splat parameterization.  Works with any rasterizer
backend; "pallas" uses the hand-written forward with custom VJP.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..utils.config import RasterizeConfig, RenderSettings
from .camera import Camera
from .gaussians import RawGaussians
from .renderer import render


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(a: jnp.ndarray, b: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over an (H, W, C) image pair (3DGS training metric)."""
    c1, c2 = 0.01**2, 0.03**2
    win = _gaussian_window(window_size)[:, :, None, None]  # (k, k, 1, 1)

    def filt(x):
        # Depthwise 2-D convolution per channel.
        x4 = x.transpose(2, 0, 1)[:, None]  # (C, 1, H, W)
        k = jnp.broadcast_to(win.transpose(2, 3, 0, 1), (1, 1, window_size, window_size))
        y = jax.lax.conv_general_dilated(
            x4, k, (1, 1), "SAME", feature_group_count=1
        )
        return y[:, 0].transpose(1, 2, 0)

    mu_a, mu_b = filt(a), filt(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sig_a = filt(a * a) - mu_a2
    sig_b = filt(b * b) - mu_b2
    sig_ab = filt(a * b) - mu_ab
    s = ((2 * mu_ab + c1) * (2 * sig_ab + c2)) / (
        (mu_a2 + mu_b2 + c1) * (sig_a + sig_b + c2)
    )
    return jnp.mean(s)


def photometric_loss(
    img: jnp.ndarray, target: jnp.ndarray, ssim_weight: float = 0.2
) -> jnp.ndarray:
    """(1 - w) * L1 + w * D-SSIM, the 3DGS training loss."""
    l1 = jnp.mean(jnp.abs(img - target))
    if ssim_weight == 0.0:
        return l1
    dssim = (1.0 - ssim(img, target)) / 2.0
    return (1.0 - ssim_weight) * l1 + ssim_weight * dssim


def make_train_step(
    camera: Camera,
    optimizer: optax.GradientTransformation,
    settings: RenderSettings = RenderSettings(),
    config: RasterizeConfig = RasterizeConfig(),
    backend: str = "jax",
    ssim_weight: float = 0.2,
    background: jnp.ndarray | None = None,
):
    """Build a jitted SGD/Adam step fitting a cloud to one target image.

    Returns step(params, opt_state, target) -> (loss, params, opt_state).
    ``target`` is (H, W, 3) linear RGB.
    """
    bg = jnp.zeros((3,)) if background is None else jnp.asarray(background)

    def loss_fn(raw: RawGaussians, target):
        rt = render(raw.activate(), camera, settings, config, backend)
        img = rt[..., :3] + (1.0 - rt[..., 3:4]) * bg
        return photometric_loss(img, target, ssim_weight)

    @jax.jit
    def step(raw, opt_state, target):
        loss, grads = jax.value_and_grad(loss_fn)(raw, target)
        updates, opt_state = optimizer.update(grads, opt_state, raw)
        raw = optax.apply_updates(raw, updates)
        return loss, raw, opt_state

    return step


def make_multicam_train_step(
    optimizer: optax.GradientTransformation,
    settings: RenderSettings = RenderSettings(),
    config: RasterizeConfig = RasterizeConfig(),
    backend: str = "jax",
    ssim_weight: float = 0.2,
    background: jnp.ndarray | None = None,
):
    """Train step taking the camera as an argument (multi-view training).

    Cameras with the same (width, height, fov) share one compiled step —
    the view matrix is traced data (Camera is a pytree with static
    intrinsics), so iterating over training views costs no recompiles.
    Returns step(raw, opt_state, camera, target).
    """
    bg = jnp.zeros((3,)) if background is None else jnp.asarray(background)

    def loss_fn(raw: RawGaussians, camera: Camera, target):
        rt = render(raw.activate(), camera, settings, config, backend)
        img = rt[..., :3] + (1.0 - rt[..., 3:4]) * bg
        return photometric_loss(img, target, ssim_weight)

    @jax.jit
    def step(raw, opt_state, camera, target):
        loss, grads = jax.value_and_grad(loss_fn)(raw, camera, target)
        updates, opt_state = optimizer.update(grads, opt_state, raw)
        raw = optax.apply_updates(raw, updates)
        return loss, raw, opt_state

    return step


def default_optimizer(lr_means: float = 1.6e-4, lr_rest: float = 2.5e-3):
    """Per-parameter-group Adam like the official 3DGS schedule shape:
    positions learn slowly relative to appearance parameters."""
    def label_fn(raw):
        return RawGaussians(
            means="means",
            rotations_wxyz="rest",
            log_scales="rest",
            opacity_logits="rest",
            sh0="rest",
            sh="rest",
        )

    return optax.multi_transform(
        {"means": optax.adam(lr_means), "rest": optax.adam(lr_rest)}, label_fn
    )


def official_3dgs_optimizer(
    scene_extent: float = 1.0,
    total_steps: int = 30_000,
    means_lr_init: float = 1.6e-4,
    means_lr_final: float = 1.6e-6,
):
    """The official 3DGS per-parameter Adam recipe (Kerbl et al. §5 /
    released training defaults), in this parameterization:

    - means: lr scaled by scene extent, exponential decay init -> final
      over ``total_steps`` (the official position_lr schedule),
    - sh0 (DC color): 2.5e-3; higher-order SH: 2.5e-3 / 20,
    - opacity logits: 0.05, log-scales: 5e-3, rotations: 1e-3,
    - Adam eps 1e-15 (the official code's optimizer epsilon).

    ``scene_extent`` is the camera-extent radius the official trainer
    multiplies into position lr; pass the scene's bounding radius.
    """
    means_lr = optax.exponential_decay(
        init_value=means_lr_init * scene_extent,
        transition_steps=max(total_steps, 1),
        decay_rate=means_lr_final / means_lr_init,
        # Clamp past total_steps like the official get_expon_lr_func (which
        # clips t to [0, 1]) — resumed/extended runs keep the final lr.
        end_value=means_lr_final * scene_extent,
    )

    def label_fn(raw):
        return RawGaussians(
            means="means",
            rotations_wxyz="rotations",
            log_scales="scales",
            opacity_logits="opacity",
            sh0="sh0",
            sh="sh_rest",
        )

    adam = lambda lr: optax.adam(lr, eps=1e-15)
    return optax.multi_transform(
        {
            "means": adam(means_lr),
            "rotations": adam(1e-3),
            "scales": adam(5e-3),
            "opacity": adam(5e-2),
            "sh0": adam(2.5e-3),
            "sh_rest": adam(2.5e-3 / 20.0),
        },
        label_fn,
    )


def fit(
    raw: RawGaussians,
    camera: Camera,
    target: jnp.ndarray,
    steps: int = 200,
    optimizer: optax.GradientTransformation | None = None,
    **kw,
):
    """Convenience loop: fit a cloud to a single target image."""
    opt = optimizer or default_optimizer()
    step = make_train_step(camera, opt, **kw)
    opt_state = opt.init(raw)
    losses = []
    for _ in range(steps):
        loss, raw, opt_state = step(raw, opt_state, target)
        losses.append(float(loss))
    return raw, losses
