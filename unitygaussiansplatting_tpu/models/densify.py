"""Adaptive density control: clone / split / prune for training.

The 3DGS training-loop operations (Kerbl et al. §5.2) that neither the
reference (a viewer) nor plain rendering needs, but a trainer does: densify
under-reconstructed regions by cloning small high-gradient splats and
splitting large ones, prune transparent splats.

These run host-side between jitted train steps (numpy): the splat count
changes, so they are inherently shape-dynamic — re-jitting per densify event
(every few hundred steps, as in 3DGS) is the natural TPU pattern; arrays can
optionally be padded to a capacity to keep one compiled shape.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from .gaussians import RawGaussians


def _to_np(raw: RawGaussians) -> dict:
    return {k: np.asarray(getattr(raw, k)) for k in raw.__dataclass_fields__}


def _from_np(d: dict) -> RawGaussians:
    return RawGaussians(**d)


def prune(
    raw: RawGaussians,
    min_opacity: float = 0.005,
    max_world_scale: float | None = None,
    return_map: bool = False,
):
    """Drop splats below an opacity threshold (and optionally huge ones).

    ``return_map`` also returns the kept input indices (for optimizer-state
    carry-over, see :func:`densify`).
    """
    d = _to_np(raw)
    opacity = 1.0 / (1.0 + np.exp(-d["opacity_logits"]))
    keep = opacity > min_opacity
    if max_world_scale is not None:
        keep &= np.exp(d["log_scales"]).max(axis=1) < max_world_scale
    out = _from_np({k: v[keep] for k, v in d.items()})
    if return_map:
        return out, np.flatnonzero(keep)
    return out


def densify(
    raw: RawGaussians,
    position_grads: np.ndarray,
    grad_threshold: float = 2e-4,
    scale_threshold: float = 0.01,
    split_factor: float = 1.6,
    seed: int = 0,
    return_map: bool = False,
):
    """Clone small / split large high-gradient splats (3DGS §5.2).

    Args:
      position_grads: (N,) or (N, D) accumulated positional-gradient
        statistic; rows are norm-reduced.  The official statistic is the
        screen-space (viewspace mean2D, NDC-scaled) gradient norm averaged
        over views where the splat was visible — the training loop produces
        exactly that via its center probe (training_loop._make_step).
      grad_threshold: densify splats whose gradient norm exceeds this
        (2e-4 matches the official calibration for NDC-scaled grads).
      scale_threshold: world-size boundary between "clone" (small) and
        "split" (large).
      split_factor: scale reduction applied to split children.
      return_map: also return ``(src_idx, is_new)`` — for each output row,
        the input row it derives from and whether it is a new splat (clone
        copies and split children).  Lets the training loop carry Adam
        moments across the topology change like the official trainer
        (zeros for new rows, parent moments dropped with split parents).
    """
    d = _to_np(raw)
    n = d["means"].shape[0]
    gnorm = np.linalg.norm(np.asarray(position_grads).reshape(n, -1), axis=1)
    hot = gnorm > grad_threshold
    world_scale = np.exp(d["log_scales"]).max(axis=1)

    clone_mask = hot & (world_scale <= scale_threshold)
    split_mask = hot & (world_scale > scale_threshold)

    parts = [d]
    idx_parts = [np.arange(n)]
    new_parts = [np.zeros(n, bool)]

    if clone_mask.any():
        # Clone: duplicate in place; the pair then drifts apart under the
        # optimizer (3DGS clones along the gradient; at clone scale the
        # offset is negligible and optimizer noise separates them).
        parts.append({k: v[clone_mask] for k, v in d.items()})
        idx_parts.append(np.flatnonzero(clone_mask))
        new_parts.append(np.ones(int(clone_mask.sum()), bool))

    if split_mask.any():
        rng = np.random.default_rng(seed)
        src = {k: v[split_mask] for k, v in d.items()}
        m = src["means"].shape[0]
        # Sample child positions from the parent gaussian, shrink scales.
        from ..ops.quaternion import quat_to_rotation_matrix
        from .gaussians import RawGaussians as _RG

        import jax.numpy as jnp

        q = src["rotations_wxyz"]
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        xyzw = np.concatenate([qn[:, 1:], qn[:, :1]], axis=1)
        rot = np.asarray(quat_to_rotation_matrix(jnp.asarray(xyzw, jnp.float32)))
        scales = np.exp(src["log_scales"])
        for _ in range(2):
            child = {k: v.copy() for k, v in src.items()}
            eps = rng.normal(size=(m, 3)).astype(np.float32)
            offset = np.einsum("nij,nj->ni", rot, eps * scales)
            child["means"] = src["means"] + offset.astype(np.float32)
            child["log_scales"] = (
                src["log_scales"] - np.float32(np.log(split_factor))
            ).astype(np.float32)
            parts.append(child)
            idx_parts.append(np.flatnonzero(split_mask))
            new_parts.append(np.ones(m, bool))

    merged = {
        k: np.concatenate([p[k] for p in parts]).astype(d[k].dtype)
        for k in d
    }
    src_idx = np.concatenate(idx_parts)
    is_new = np.concatenate(new_parts)
    if split_mask.any():
        # Remove the split parents (their children replace them).
        keep = np.ones(merged["means"].shape[0], bool)
        keep[:n] = ~split_mask
        merged = {k: v[keep] for k, v in merged.items()}
        src_idx, is_new = src_idx[keep], is_new[keep]
    out = _from_np(merged)
    if return_map:
        return out, src_idx, is_new
    return out


def reset_opacity(raw: RawGaussians, ceiling: float = 0.01) -> RawGaussians:
    """Clamp opacities to a low value (periodic reset, 3DGS §5.2)."""
    d = _to_np(raw)
    logit_ceiling = np.float32(np.log(ceiling / (1 - ceiling)))
    d["opacity_logits"] = np.minimum(d["opacity_logits"], logit_ceiling)
    return _from_np(d)


def pad_to_capacity(raw: RawGaussians, capacity: int) -> RawGaussians:
    """Pad with zero-opacity splats so jitted shapes stay fixed across
    densification events (dead splats render as nothing)."""
    d = _to_np(raw)
    n = d["means"].shape[0]
    if n > capacity:
        raise ValueError(f"{n} splats exceed capacity {capacity}")
    pad = capacity - n
    if pad == 0:
        return raw
    out = {}
    for k, v in d.items():
        filler = np.zeros((pad,) + v.shape[1:], v.dtype)
        if k == "opacity_logits":
            filler -= 20.0  # sigmoid(-20) ~ 0: invisible
        if k == "log_scales":
            filler -= 20.0  # degenerate size
        if k == "rotations_wxyz":
            filler[:, 0] = 1.0
        out[k] = np.concatenate([v, filler])
    return _from_np(out)
