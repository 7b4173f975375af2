"""Synthetic test scenes.

The reference validates against captured scenes (bicycle/truck/garden golden
images, package/Editor/GaussianSplatValidator.cs:40-60); those assets are not
distributable, so the test pyramid here starts from procedurally generated
clouds with known statistics (BASELINE.json config 1: 10k-splat sphere scene).
"""

from __future__ import annotations

import numpy as np

from ..models.gaussians import RawGaussians


def sphere_scene(
    n: int = 10_000,
    radius: float = 1.0,
    seed: int = 0,
    sh_bands: bool = True,
) -> RawGaussians:
    """Random splats on a sphere shell with varied scale/orientation/color.

    Returns the raw (pre-activation) parameterization so tests can both
    activate-and-render and differentiate w.r.t. the raw fields.
    """
    rng = np.random.default_rng(seed)
    # Uniform directions via normalized Gaussians; radii jittered around shell.
    dirs = rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    radii = radius * (1.0 + 0.05 * rng.normal(size=(n, 1)))
    means = (dirs * radii).astype(np.float32)

    rot = rng.normal(size=(n, 4)).astype(np.float32)  # unnormalized wxyz
    log_scales = rng.uniform(np.log(0.005), np.log(0.05), size=(n, 3)).astype(np.float32)
    opacity_logits = rng.uniform(-2.0, 3.0, size=(n,)).astype(np.float32)
    sh0 = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
    if sh_bands:
        sh = (0.2 * rng.normal(size=(n, 15, 3))).astype(np.float32)
    else:
        sh = np.zeros((n, 15, 3), dtype=np.float32)
    return RawGaussians(
        means=means,
        rotations_wxyz=rot,
        log_scales=log_scales,
        opacity_logits=opacity_logits,
        sh0=sh0,
        sh=sh,
    )


def outdoor_scene(n: int = 1_000_000, seed: int = 0) -> RawGaussians:
    """Synthetic scene with real-capture-like statistics (bicycle-class).

    The reference's headline scene (bicycle, 6.1M splats) is not
    distributable, so this models the published shape of trained outdoor
    3DGS scenes instead of the uniform sphere shell: a dense foreground
    cluster of small splats, a ground plane, and a sparse far shell of large
    low-detail splats; log-normal scales spanning ~3 decades and a bimodal
    opacity distribution (many translucent floaters + solid surface splats).
    Used by bench.py as the realistic-distribution companion to the
    sphere-shell headline (tile-overlap and depth-complexity distributions
    differ strongly between the two).
    """
    rng = np.random.default_rng(seed)
    n_fg = int(n * 0.55)
    n_ground = int(n * 0.25)
    n_bg = n - n_fg - n_ground

    # Foreground object cloud: anisotropic Gaussian blob around the origin.
    fg = rng.normal(size=(n_fg, 3)) * np.asarray([1.2, 0.8, 1.2])
    # Ground plane: thin slab, wide extent.
    ground = np.stack(
        [
            rng.uniform(-12, 12, size=n_ground),
            -0.8 + 0.05 * rng.normal(size=n_ground),
            rng.uniform(-12, 12, size=n_ground),
        ],
        axis=1,
    )
    # Background shell: large radius, splats grow with distance.
    dirs = rng.normal(size=(n_bg, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    r_bg = rng.uniform(8.0, 30.0, size=(n_bg, 1))
    bg = dirs * r_bg
    means = np.concatenate([fg, ground, bg]).astype(np.float32)

    # Scales: log-normal, median ~1.5 cm foreground / 4 cm ground, background
    # proportional to distance (constant angular size).
    ls_fg = rng.normal(np.log(0.015), 0.9, size=(n_fg, 3))
    ls_ground = rng.normal(np.log(0.04), 0.7, size=(n_ground, 3))
    ls_bg = np.log(r_bg * 0.02) + rng.normal(0.0, 0.5, size=(n_bg, 3))
    log_scales = np.concatenate([ls_fg, ls_ground, ls_bg]).astype(np.float32)
    # Mild anisotropy everywhere (surface-aligned flattening).
    log_scales[:, 1] -= rng.uniform(0.0, 1.5, size=n).astype(np.float32)

    # Opacity: bimodal — half translucent floaters, half near-solid.
    solid = rng.random(n) < 0.5
    opacity_logits = np.where(
        solid, rng.uniform(0.5, 6.0, size=n), rng.uniform(-4.5, 0.5, size=n)
    ).astype(np.float32)

    rot = rng.normal(size=(n, 4)).astype(np.float32)
    sh0 = rng.uniform(-1.2, 1.8, size=(n, 3)).astype(np.float32)
    sh = (0.15 * rng.normal(size=(n, 15, 3))).astype(np.float32)
    return RawGaussians(
        means=means,
        rotations_wxyz=rot,
        log_scales=log_scales,
        opacity_logits=opacity_logits,
        sh0=sh0,
        sh=sh,
    )
