"""Gaussian splat cloud data model.

The TPU-side analog of the reference's splat data structures: the activated
form mirrors the decoded ``SplatData`` a kernel sees
(package/Shaders/GaussianSplatting.hlsl:209-216), and the raw form mirrors the
canonical float struct produced by file import before activations
(package/Editor/Utils/GaussianFileReader.cs:17-26, ``InputSplatData``).

Both are registered pytrees (struct-of-arrays), so they shard over a device
mesh along the splat axis and differentiate directly — the raw form is the
trainable parameterization the reference lacks by design.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops import activations
from ..ops.quaternion import normalize_swizzle_rotation, quat_normalize


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Gaussians:
    """Activated splat cloud (what the renderer consumes).

    Attributes:
      means: (N, 3) world-space positions.
      rotations: (N, 4) normalized xyzw quaternions.
      scales: (N, 3) linear (post-exp) scales.
      opacities: (N,) opacity in [0, 1] (post-sigmoid).
      base_color: (N, 3) DC color, ``sh0 * SH_C0 + 0.5``.
      sh: (N, 15, 3) band 1..3 SH coefficients (zeros when unused).
    """

    means: jnp.ndarray
    rotations: jnp.ndarray
    scales: jnp.ndarray
    opacities: jnp.ndarray
    base_color: jnp.ndarray
    sh: jnp.ndarray

    @property
    def num_splats(self) -> int:
        return self.means.shape[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RawGaussians:
    """Pre-activation splat parameters (the trainable / file-level form).

    Field semantics follow the 3DGS PLY layout the reference imports
    (GaussianFileReader.cs:210-240): scales are log-scales, opacities are
    logits, rotations are unnormalized wxyz, color is the raw DC SH
    coefficient.
    """

    means: jnp.ndarray  # (N, 3)
    rotations_wxyz: jnp.ndarray  # (N, 4) unnormalized, PLY order
    log_scales: jnp.ndarray  # (N, 3)
    opacity_logits: jnp.ndarray  # (N,)
    sh0: jnp.ndarray  # (N, 3) raw DC coefficients
    sh: jnp.ndarray  # (N, 15, 3)

    @property
    def num_splats(self) -> int:
        return self.means.shape[0]

    def activate(self) -> Gaussians:
        """Apply the import-time activations (GaussianFileReader.cs:210-240).

        Pass-through fields go through jnp.asarray so the result is fully
        device-resident — a host numpy leaf would otherwise be re-uploaded on
        every jit call (pathological over a tunneled TPU).
        """
        return Gaussians(
            means=jnp.asarray(self.means),
            rotations=normalize_swizzle_rotation(self.rotations_wxyz),
            scales=activations.linear_scale(self.log_scales),
            opacities=activations.sigmoid(self.opacity_logits),
            base_color=activations.sh0_to_color(self.sh0),
            sh=jnp.asarray(self.sh),
        )


def deactivate(g: Gaussians) -> RawGaussians:
    """Inverse of :meth:`RawGaussians.activate`, used by PLY export.

    Mirrors the export kernel's inverse activations
    (SplatUtilities.compute:616-673: InvSigmoid, log scale, color -> SH0).
    """
    q = quat_normalize(g.rotations)
    wxyz = jnp.concatenate([q[..., 3:4], q[..., 0:3]], axis=-1)
    return RawGaussians(
        means=g.means,
        rotations_wxyz=wxyz,
        log_scales=jnp.log(jnp.maximum(g.scales, 1e-37)),
        opacity_logits=activations.inv_sigmoid(g.opacities),
        sh0=activations.color_to_sh0(g.base_color),
        sh=g.sh,
    )
