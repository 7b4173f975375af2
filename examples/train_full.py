"""Demo: full 3DGS training — multi-view fit with density control + checkpoints.

    python examples/train_full.py [--preset quick|r5] [overrides...]

Synthesizes a ground-truth splat scene, renders a ring of training views,
then trains a smaller randomly-initialized cloud against them with the full
loop (Adam with the official 3DGS per-parameter lr recipe, L1 + D-SSIM,
periodic densify/prune, opacity resets, orbax checkpoints) and reports
held-out PSNR plus a PSNR-vs-step curve.  The reference has no training at
all (SURVEY.md §0) — this is the capability the TPU build adds on top of
its feature set.

``--preset quick`` (default) is the ~2-minute CPU smoke demo; ``--preset
r5`` is the on-chip convergence artifact recorded in
docs/train_demo_r5.json (24 training views, 3000 steps, densify + opacity
reset, pallas backend, held-out PSNR curve) — every knob can be overridden
on the command line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ring_cameras(k, radius, width, height, height_off=0.6, fov=45.0,
                 target=(0.0, 0.0, 0.0), phase=0.0):
    from unitygaussiansplatting_tpu.models.camera import Camera

    cams = []
    for i in range(k):
        a = 2 * np.pi * (i + phase) / k
        eye = [radius * np.sin(a), height_off, -radius * np.cos(a)]
        cams.append(
            Camera.look_at(eye, list(target), [0, 1, 0], fov, width, height)
        )
    return cams


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", choices=["quick", "r5"], default="quick")
    p.add_argument("--out-dir", default="/tmp/tpu_splat_train")
    p.add_argument("--out-json", default=None,
                   help="write the run record (curve, events, PSNR) here")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--views", type=int, default=None)
    p.add_argument("--held-out", type=int, default=None,
                   help="number of held-out eval cameras (between train views)")
    p.add_argument("--width", type=int, default=None)
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--truth-n", type=int, default=None)
    p.add_argument("--init-n", type=int, default=None)
    p.add_argument("--scene", choices=["sphere", "captured"], default=None)
    p.add_argument("--backend", default=None)
    p.add_argument("--sh-order", type=int, default=None)
    p.add_argument("--eval-every", type=int, default=None)
    p.add_argument("--opacity-reset-every", type=int, default=None)
    p.add_argument("--densify-every", type=int, default=None)
    p.add_argument("--densify-until", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    presets = {
        # ~2 min on CPU: the original round-1 smoke demo.
        "quick": dict(steps=300, views=6, held_out=0, width=160, height=120,
                      truth_n=3000, init_n=800, scene="sphere", backend="jax",
                      sh_order=1, eval_every=0, opacity_reset_every=0,
                      densify_every=80, densify_until=10**9),
        # The on-chip r5 convergence artifact (docs/train_demo_r5.json).
        "r5": dict(steps=3000, views=24, held_out=4, width=800, height=500,
                   truth_n=400_000, init_n=120_000, scene="captured",
                   backend="pallas", sh_order=1, eval_every=250,
                   opacity_reset_every=1500, densify_every=150,
                   densify_until=2500),
    }
    cfg = presets[args.preset]
    for k, v in cfg.items():
        if getattr(args, k) is None:
            setattr(args, k, v)
    return args


def main(argv=None):
    args = parse_args(argv)

    import jax.numpy as jnp

    from unitygaussiansplatting_tpu.models.renderer import render
    from unitygaussiansplatting_tpu.models.trainer import official_3dgs_optimizer
    from unitygaussiansplatting_tpu.models.training_loop import (
        TrainLoopConfig,
        load_checkpoint,
        psnr_of,
        train,
    )
    from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
    from unitygaussiansplatting_tpu.utils.synthetic import captured_scene, sphere_scene

    settings = RenderSettings(sh_order=args.sh_order)
    if args.backend == "pallas":
        # The bench/production knob set (see bench.py): packed sort payloads.
        config = RasterizeConfig(pack_axes_f16=True, pack_grads_bf16=True,
                                 pack_center_u32=True, pack_color_rgba8=True)
    else:
        config = RasterizeConfig()

    if args.scene == "captured":
        truth = captured_scene(n=args.truth_n, seed=5).activate()
        cam_radius, cam_h, cam_target, fov = 9.0, 2.0, (0.0, 0.3, 0.0), 47.0
    else:
        truth = sphere_scene(n=args.truth_n, seed=args.seed).activate()
        cam_radius, cam_h, cam_target, fov = 3.0, 0.6, (0.0, 0.0, 0.0), 45.0

    train_cams = ring_cameras(args.views, cam_radius, args.width, args.height,
                              cam_h, fov, cam_target)
    # Held-out cameras sit BETWEEN training views (phase offset), so the
    # eval truly measures novel-view generalization, not memorization.
    held_cams = ring_cameras(args.held_out, cam_radius, args.width,
                             args.height, cam_h, fov, cam_target, phase=0.5
                             )[: args.held_out]

    t0 = time.time()
    # One jitted render replayed per camera (the ring shares static shape);
    # an unjitted render dispatches op-by-op through the TPU tunnel.
    import jax

    rfn = jax.jit(lambda g, c: render(g, c, settings, config,
                                      backend=args.backend))
    targets = [np.asarray(rfn(truth, c)[..., :3]) for c in train_cams]
    held_targets = [np.asarray(rfn(truth, c)[..., :3]) for c in held_cams]
    print(f"rendered {len(targets)}+{len(held_targets)} targets in "
          f"{time.time() - t0:.0f}s", flush=True)

    rgba8_clip = None
    if config.pack_color_rgba8:
        # Guard for the rgba8 pack knob: shaded rgb saturates at 2.0; a
        # clipped_high fraction >~1e-3 on this scene means highlights would
        # flatten and the f16 color path should be used instead.
        from unitygaussiansplatting_tpu.utils.quality import rgba8_clip_fraction

        rgba8_clip = {
            k: float(v)
            for k, v in rgba8_clip_fraction(truth, train_cams[0], settings).items()
        }
        print(f"rgba8 clip check: {rgba8_clip}", flush=True)

    init = (captured_scene(n=args.init_n, seed=77)
            if args.scene == "captured"
            else sphere_scene(n=args.init_n, seed=42))
    loop = TrainLoopConfig(
        steps=args.steps,
        densify_every=args.densify_every,
        densify_from=min(100, args.densify_every),
        densify_until=args.densify_until,
        opacity_reset_every=args.opacity_reset_every,
        checkpoint_dir=args.out_dir,
        checkpoint_every=max(args.steps // 3, 100),
        auto_budget_slack=1.3,
        eval_every=args.eval_every,
    )
    extent = float(np.linalg.norm(np.asarray(truth.means), axis=1).max())
    opt = official_3dgs_optimizer(scene_extent=extent, total_steps=loop.steps)

    def held_psnr(raw, step):
        if not held_cams:
            return None
        vals = [psnr_of(raw, c, t, settings, config, backend=args.backend)
                for c, t in zip(held_cams, held_targets)]
        v = round(float(np.mean(vals)), 2)
        print(f"  step {step}: held-out PSNR {v:.2f} dB", flush=True)
        return v

    t1 = time.time()
    trained, hist = train(init, train_cams, targets, loop, settings, config,
                          backend=args.backend, optimizer=opt,
                          eval_fn=held_psnr if held_cams else None)
    train_s = time.time() - t1
    if held_cams and hist.get("evals"):
        p0, p1 = hist["evals"][0][1], hist["evals"][-1][1]
    else:
        p0 = psnr_of(init, train_cams[0], targets[0], settings, config,
                     backend=args.backend)
        p1 = psnr_of(trained, train_cams[0], targets[0], settings, config,
                     backend=args.backend)
    print(f"held-out PSNR: {p0:.2f} -> {p1:.2f} dB "
          f"({train_s:.0f}s, {train_s / args.steps * 1000:.0f} ms/step)")
    print("splat counts:", hist["counts"])
    print("events:", hist["events"])

    restored, step = load_checkpoint(os.path.join(args.out_dir, "ckpt_final"))
    pr = psnr_of(restored, train_cams[0], targets[0], settings, config,
                 backend=args.backend)
    print(f"restored checkpoint @step {step}: train-view PSNR {pr:.2f} dB")

    if args.out_json:
        losses = hist["losses"]
        l1_proxy = None
        record = {
            "metric": (
                f"held-out PSNR after {args.steps} training steps "
                f"({args.scene} scene, {args.views} train views "
                f"@{args.width}x{args.height} SH{args.sh_order}, "
                f"{args.backend} backend)"
            ),
            "psnr_init_db": p0,
            "psnr_trained_db": p1,
            "psnr_curve": hist.get("evals", []),
            "train_wall_s": round(train_s, 1),
            "ms_per_step_avg": round(train_s / args.steps * 1000.0, 1),
            # The combined L1 + D-SSIM loss (trainer.photometric_loss).
            # NOTE: can dip slightly below 0 on near-perfect fits — the
            # SSIM uses SAME-padding without border renormalization
            # (matching the official 3DGS implementation), so local SSIM
            # can marginally exceed 1 at image borders.
            "loss_l1_dssim_first10_mean": round(sum(losses[:10]) / 10, 5),
            "loss_l1_dssim_last10_mean": round(sum(losses[-10:]) / 10, 5),
            "splat_counts": hist["counts"],
            "events": hist["events"],
            "rgba8_clip": rgba8_clip,
            "truth_splats": args.truth_n,
            "init_splats": args.init_n,
            "provenance": (
                "examples/train_full.py --preset r5 "
                f"(argv={argv if argv is not None else sys.argv[1:]})"
            ),
        }
        with open(args.out_json, "w") as f:
            json.dump(record, f, indent=1)
        print(f"wrote {args.out_json}")
    return trained, hist


if __name__ == "__main__":
    main()
