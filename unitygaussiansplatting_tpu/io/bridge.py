"""Converters between the asset pipeline's canonical splats and the
renderer's Gaussians pytree."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.gaussians import Gaussians
from .asset import InputSplats, pack_smallest3_np, unpack_smallest3_np


def input_splats_to_gaussians(s: InputSplats) -> Gaussians:
    """Decoded asset splats -> renderer-ready Gaussians (on device)."""
    rot = unpack_smallest3_np(s.rot)
    return Gaussians(
        means=jnp.asarray(s.pos),
        rotations=jnp.asarray(rot),
        scales=jnp.asarray(s.scale),
        opacities=jnp.asarray(s.opacity),
        base_color=jnp.asarray(s.color),
        sh=jnp.asarray(s.sh),
    )


def gaussians_to_input_splats(g: Gaussians) -> InputSplats:
    """Renderer Gaussians -> canonical splats (numpy, for export/encode)."""
    rot = pack_smallest3_np(np.asarray(g.rotations, np.float32))
    return InputSplats(
        pos=np.asarray(g.means, np.float32),
        rot=rot,
        scale=np.asarray(g.scales, np.float32),
        color=np.asarray(g.base_color, np.float32),
        opacity=np.asarray(g.opacities, np.float32),
        sh=np.asarray(g.sh, np.float32),
    )
