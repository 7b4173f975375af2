"""Full 3DGS training loop: multi-view fit + adaptive density + checkpoints.

Composes the pieces the reference (a viewer, SURVEY.md §0) never needed:
multi-view photometric optimization (trainer.py), clone/split/prune/
opacity-reset density control (densify.py, Kerbl et al. §5.2) and orbax
checkpointing — the durable-training analog of the reference's asset
persistence + hash-triggered hot reload (GaussianSplatRenderer.cs:641-658).

Shape discipline: densification changes N, so the cloud is padded to a
slowly-growing capacity (pad_to_capacity) and the jitted train step only
recompiles when the capacity bucket grows.
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.config import RasterizeConfig, RenderSettings
from .camera import Camera
from .densify import densify, pad_to_capacity, prune, reset_opacity
from .gaussians import RawGaussians
from .renderer import render
from .trainer import default_optimizer, photometric_loss


@dataclasses.dataclass
class TrainLoopConfig:
    steps: int = 400
    ssim_weight: float = 0.2
    # Density control (3DGS §5.2 schedule shape).
    densify_every: int = 100
    densify_from: int = 50
    densify_until: int = 10**9
    grad_threshold: float = 2e-4
    scale_threshold: float = 0.01
    prune_opacity: float = 0.005
    opacity_reset_every: int = 0  # 0 = off (3DGS uses 3000)
    capacity_step: int = 1024  # capacity rounds up to this granularity
    capacity_headroom: float = 1.3
    # Checkpointing.
    checkpoint_dir: str | None = None
    checkpoint_every: int = 0  # 0 = only final
    # Pair-budget auto-sizing: measure worst-view demand at setup and set
    # config.pair_multiplier = demand/N x this slack (0 = keep config as-is).
    # Slack absorbs densification drift; overflow is still surfaced per
    # frame via RenderStats if the scene outgrows it.
    auto_budget_slack: float = 0.0
    # Periodic held-out evaluation: every eval_every steps (and at step 0 /
    # the end) call eval_fn(raw, step) -> value and append (step, value) to
    # history["evals"] — the PSNR-vs-step curve of a training run.  0 = off.
    eval_every: int = 0
    # Overflow RECOVERY (VERDICT r3 item 5): when a frame's true pair demand
    # exceeds the static budget mid-training (densification grew the scene
    # past the t=0 sizing), grow pair_multiplier to demand/capacity x
    # budget_grow_slack and re-jit the step instead of silently training on
    # truncated frames.  Overflow flags are collected per step WITHOUT
    # blocking (they ride the async dispatch) and checked every
    # budget_check_every steps and at densify boundaries, so at most that
    # many steps can see a truncated frame before the budget grows — each
    # growth is recorded as a "budget_grow" event in history.  0 disables.
    budget_check_every: int = 25
    budget_grow_slack: float = 1.2


def _capacity_for(n: int, cfg: TrainLoopConfig) -> int:
    want = int(n * cfg.capacity_headroom)
    return max(-(-want // cfg.capacity_step) * cfg.capacity_step, cfg.capacity_step)


def _remap_opt_state(opt_state, src_idx: np.ndarray, is_new: np.ndarray):
    """Carry optimizer state across a densify/prune/pad topology change.

    The official trainer cats zeros onto exp_avg for new splats and drops
    pruned rows ("cat_tensors_to_optimizer"); the analog here walks the
    optax state tree and remaps every RawGaussians-shaped moment pytree
    (Adam mu/nu live as mirrors of the param pytree): surviving rows keep
    their moments via a gather, new/padding rows start at zero.  Scalar
    counts (Adam bias correction, lr-schedule steps) are left untouched —
    torch keeps per-tensor step counts across the cat too, and resetting
    them is what made the exponential means-lr schedule restart from
    init_value after every densification.
    """
    idx = jnp.asarray(src_idx, jnp.int32)
    fresh = jnp.asarray(is_new)

    def remap_leaf(a):
        taken = jnp.take(a, idx, axis=0)
        mask = fresh.reshape((-1,) + (1,) * (taken.ndim - 1))
        return jnp.where(mask, jnp.zeros_like(taken), taken)

    def walk(s):
        if isinstance(s, RawGaussians):
            return jax.tree_util.tree_map(remap_leaf, s)
        if hasattr(s, "_fields"):  # NamedTuple optax states
            return type(s)(*[walk(c) for c in s])
        if isinstance(s, tuple):
            return tuple(walk(c) for c in s)
        if isinstance(s, list):
            return [walk(c) for c in s]
        if isinstance(s, dict):
            return {k: walk(v) for k, v in s.items()}
        return s

    return walk(opt_state)


def _make_step(optimizer, settings, config, backend, ssim_weight, width, height):
    from .renderer import render_with_stats

    # The official 3DGS densification statistic accumulates the norm of the
    # loss gradient w.r.t. the *screen-space* splat centers (viewspace
    # mean2D grads, Kerbl et al. §5.2) over splats visible in each view
    # (radii > 0), normalized by the per-splat visibility count.  A zero
    # (N, 2) probe added to the projected centers yields exactly that
    # gradient; the official code differentiates w.r.t. NDC-scaled points,
    # so the pixel-space probe grad is rescaled by (W/2, H/2) to keep the
    # published grad_threshold=2e-4 calibration.
    ndc_scale = jnp.asarray([width * 0.5, height * 0.5], jnp.float32)

    def loss_fn(raw: RawGaussians, probe, camera: Camera, target):
        rt, stats = render_with_stats(
            raw.activate(), camera, settings, config, backend,
            center_probe=probe, want_visibility=True,
        )
        img = rt[..., :3]  # black background
        return photometric_loss(img, target, ssim_weight), stats

    @jax.jit
    def step(raw, opt_state, gacc, vis_count, camera, target):
        probe = jnp.zeros_like(raw.means[:, :2])
        (loss, stats), (grads, gprobe) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(raw, probe, camera, target)
        updates, opt_state = optimizer.update(grads, opt_state, raw)
        new_raw = optax.apply_updates(raw, updates)
        # Accumulate on device: one host transfer per densify window, not
        # one per step.
        gacc = gacc + jnp.linalg.norm(gprobe * ndc_scale, axis=-1)
        vis_count = vis_count + stats.visible.astype(jnp.int32)
        return loss, new_raw, opt_state, gacc, vis_count, stats.num_pairs

    return step


def save_checkpoint(path: str, raw: RawGaussians, step: int) -> None:
    """Orbax checkpoint of the raw cloud + step counter."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {k: np.asarray(getattr(raw, k)) for k in raw.__dataclass_fields__}
    payload["__step__"] = np.asarray(step, np.int64)
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str) -> tuple[RawGaussians, int]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(path))
    step = int(payload.pop("__step__"))
    return RawGaussians(**{k: jnp.asarray(v) for k, v in payload.items()}), step


def train(
    raw: RawGaussians,
    cameras: list[Camera],
    targets: list[jnp.ndarray],
    loop: TrainLoopConfig = TrainLoopConfig(),
    settings: RenderSettings = RenderSettings(sh_order=1),
    config: RasterizeConfig = RasterizeConfig(),
    backend: str = "jax",
    optimizer: optax.GradientTransformation | None = None,
    eval_fn=None,
) -> tuple[RawGaussians, dict]:
    """Run the full loop; returns (trained_raw, history).

    history: {"losses": [...], "counts": [(step, n), ...], "events": [...],
    "evals": [(step, eval_fn result), ...] when loop.eval_every > 0}.
    Targets are (H, W, 3) linear RGB, one per camera; views round-robin.
    ``eval_fn(raw, step)`` runs OUTSIDE the jitted step (host-driven, e.g.
    held-out PSNR) at the ``loop.eval_every`` cadence.
    """
    if loop.auto_budget_slack > 0:
        from .renderer import suggest_pair_multiplier

        mult, _ = suggest_pair_multiplier(
            raw.activate(), cameras, settings, config, slack=loop.auto_budget_slack
        )
        # Never shrink below the caller's configured floor.
        config = dataclasses.replace(
            config, pair_multiplier=max(mult, config.pair_multiplier)
        )
    opt = optimizer or default_optimizer()

    def make_step(cfg):
        return _make_step(
            opt, settings, cfg, backend, loop.ssim_weight,
            cameras[0].width, cameras[0].height,
        )

    step_fn = make_step(config)

    n_live = int(raw.num_splats)
    capacity = _capacity_for(n_live, loop)
    raw = pad_to_capacity(raw, capacity)
    opt_state = opt.init(raw)
    # Screen-space positional-gradient statistic over the densify window
    # (3DGS §5.2: sum of viewspace grad norms / per-splat visibility count).
    # Both accumulators live on device; they transfer to host only at
    # densify boundaries.
    gacc = jnp.zeros(capacity, jnp.float32)
    vis_count = jnp.zeros(capacity, jnp.int32)

    history = {"losses": [], "counts": [(0, n_live)], "events": []}
    if loop.eval_every > 0 and eval_fn is not None:
        history["evals"] = [(0, eval_fn(raw, 0))]
    from ..ops.binning import pair_budget

    # Per-step pair demands, collected WITHOUT blocking (device scalars ride
    # the async dispatch queue); drained at the check cadence, where they
    # are all long since computed.
    pending_pairs: list[tuple[int, jnp.ndarray]] = []

    def check_budget(i: int) -> bool:
        """Grow the pair budget if any pending frame overflowed it."""
        nonlocal pending_pairs, step_fn
        nonlocal config
        if not pending_pairs:
            return False
        demands = [(s, int(p)) for s, p in pending_pairs]
        pending_pairs = []
        budget = pair_budget(int(raw.num_splats), config)
        worst_step, worst = max(demands, key=lambda sp: sp[1])
        if worst <= budget:
            return False
        # Demand outgrew the static budget: grow the multiplier to cover the
        # observed worst frame with slack and re-jit (the same capacity
        # re-bucketing discipline densify already uses for N).
        new_mult = max(
            worst * loop.budget_grow_slack / max(int(raw.num_splats), 1),
            config.pair_multiplier * 1.25,
        )
        config = dataclasses.replace(config, pair_multiplier=new_mult)
        step_fn = make_step(config)
        history["events"].append(
            (i + 1, "budget_grow", {
                "worst_step": worst_step, "demand": worst,
                "old_budget": budget,
                "new_multiplier": round(new_mult, 4),
            })
        )
        return True

    for i in range(loop.steps):
        v = i % len(cameras)
        loss, raw, opt_state, gacc, vis_count, num_pairs = step_fn(
            raw, opt_state, gacc, vis_count, cameras[v], targets[v]
        )
        # Device scalar: converted to float lazily at return so the loop
        # doesn't block on every step's dispatch.
        history["losses"].append(loss)
        if loop.budget_check_every > 0:
            pending_pairs.append((i, num_pairs))
            if len(pending_pairs) >= loop.budget_check_every:
                check_budget(i)

        do_densify = (
            loop.densify_every > 0
            and loop.densify_from <= i < loop.densify_until
            and (i + 1) % loop.densify_every == 0
        )
        if do_densify:
            if loop.budget_check_every > 0:
                check_budget(i)  # densify boundary already syncs the host
            # Density ops run on the padded cloud: padding slots have zero
            # grads (never cloned) and ~0 opacity (pruned away).  The ONE
            # host transfer per densify window happens here.
            mean_grad = np.asarray(gacc) / np.maximum(np.asarray(vis_count), 1)
            new, src_idx, is_new = densify(
                raw,
                mean_grad,
                grad_threshold=loop.grad_threshold,
                scale_threshold=loop.scale_threshold,
                seed=i,
                return_map=True,
            )
            new, kept = prune(new, min_opacity=loop.prune_opacity, return_map=True)
            src_idx, is_new = src_idx[kept], is_new[kept]
            n_live = int(new.num_splats)
            capacity = _capacity_for(n_live, loop)
            raw = pad_to_capacity(new, capacity)
            # Padding rows are "new" (zero moments); surviving splats keep
            # their Adam moments and the lr-schedule step count keeps
            # ticking (the official trainer's cat_tensors_to_optimizer).
            pad = capacity - n_live
            src_idx = np.concatenate([src_idx, np.zeros(pad, np.int64)])
            is_new = np.concatenate([is_new, np.ones(pad, bool)])
            opt_state = _remap_opt_state(opt_state, src_idx, is_new)
            gacc = jnp.zeros(capacity, jnp.float32)
            vis_count = jnp.zeros(capacity, jnp.int32)
            history["counts"].append((i + 1, n_live))
            history["events"].append((i + 1, "densify+prune", n_live))

        if (
            loop.opacity_reset_every
            and (i + 1) % loop.opacity_reset_every == 0
            # Never reset on the FINAL step: a reset needs recovery steps to
            # re-learn opacities, and with none left it just craters the
            # returned cloud (r5 demo: 34.8 dB -> 8.5 dB from a reset landing
            # exactly on step 3000).  3DGS's own schedule stops resets half a
            # cycle before the end for the same reason.
            and (i + 1) < loop.steps
        ):
            raw = pad_to_capacity(reset_opacity(raw), capacity)
            history["events"].append((i + 1, "opacity_reset", n_live))

        if (
            loop.eval_every > 0
            and eval_fn is not None
            and ((i + 1) % loop.eval_every == 0 or i + 1 == loop.steps)
        ):
            history["evals"].append((i + 1, eval_fn(raw, i + 1)))

        if (
            loop.checkpoint_dir
            and loop.checkpoint_every
            and (i + 1) % loop.checkpoint_every == 0
        ):
            save_checkpoint(
                os.path.join(loop.checkpoint_dir, f"ckpt_{i + 1:06d}"), raw, i + 1
            )

    if loop.budget_check_every > 0:
        # Trailing frames: record (and grow for any caller continuing to
        # train/render with the returned config via history) rather than
        # ending with silent truncation.
        check_budget(loop.steps - 1)
    if loop.checkpoint_dir:
        save_checkpoint(os.path.join(loop.checkpoint_dir, "ckpt_final"), raw, loop.steps)
    history["losses"] = [float(x) for x in history["losses"]]
    return raw, history


@functools.partial(jax.jit, static_argnames=("backend",))
def _psnr_mse(raw, camera, target, settings, config, backend):
    img = render(raw.activate(), camera, settings, config, backend=backend)[..., :3]
    return jnp.mean((img - target) ** 2)


def psnr_of(
    raw: RawGaussians, camera: Camera, target, settings, config,
    backend: str = "jax",
) -> float:
    # Jitted end-to-end: an eager render dispatches hundreds of ops one at
    # a time (~30-200 ms each through the TPU tunnel) — evals on a ring of
    # same-shaped cameras compile once and replay.
    mse = float(_psnr_mse(raw, camera, jnp.asarray(target), settings, config, backend))
    return 10.0 * float(np.log10(1.0 / max(mse, 1e-12)))
