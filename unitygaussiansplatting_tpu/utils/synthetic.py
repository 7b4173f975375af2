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
