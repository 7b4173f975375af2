"""Configuration dataclasses for the renderer.

The TPU-native replacement for the reference's config surfaces: serialized
component fields (package/Runtime/GaussianSplatRenderer.cs:225-251), shader
keyword multi-compiles and the packed ``_SplatFormat`` word
(GaussianSplatRenderer.cs:502-503).  Static fields (pytree metadata) become
compile-time kernel specializations, exactly like shader variants; traced
fields stay runtime-adjustable without recompiles.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RenderSettings:
    """Per-renderer display options (GaussianSplatRenderer.cs:225-251).

    splat_scale / opacity_scale are traced (tweakable per frame without
    recompiling); sh_order / sh_only specialize the shading kernel like the
    reference's ``_SHOrder`` uniform branch.
    """

    splat_scale: jnp.ndarray | float = 1.0  # range 0.1..2.0 in the reference UI
    opacity_scale: jnp.ndarray | float = 1.0  # range 0.05..20.0
    sh_order: int = dataclasses.field(default=3, metadata={"static": True})
    sh_only: bool = dataclasses.field(default=False, metadata={"static": True})
    # Round projected color/opacity through fp16 like the reference's packed
    # SplatViewData (SplatUtilities.compute:247-248); off by default to keep
    # the forward pass smooth for training.
    fp16_color: bool = dataclasses.field(default=False, metadata={"static": True})


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static tiling/budget configuration for the tile rasterizer.

    TPU-native choices: tiles are ``tile_h x tile_w`` pixels, flattened to
    ``tile_h * tile_w`` VPU lanes inside the kernels (any tile shape whose
    area is a multiple of 128 works; the reference instead relies on hardware
    quad blending, RenderGaussianSplats.shader:10-12); ``pair_budget`` caps the
    (splat, tile) duplication list so every shape stays static under jit.
    """

    # 64x32 measured fastest end-to-end at bicycle scale with the fused
    # pipeline: same 2048-px tile area as 128x16 (so identical per-pair pixel
    # work), but the squarer aspect cuts ellipse-AABB tile overlap ~20%
    # (pair demand 4.8 -> 3.85 slots/splat), which shrinks the K-sort and
    # every pair-sized stage (fwd 632 -> 511 ms, fwd+bwd 1435 -> 1076 ms).
    tile_h: int = dataclasses.field(default=32, metadata={"static": True})
    tile_w: int = dataclasses.field(default=64, metadata={"static": True})
    # Max (splat, tile) pairs as a multiple of N.  On overflow the XLA
    # bin_splats path drops far-field pairs first (they sort after the
    # cutoff); the fused pallas pipeline generates pairs splat-id-major and
    # truncates *arbitrary* splats (see RenderStats docstring) — size the
    # budget from binning.slot_demand / suggest_pair_multiplier, don't rely
    # on graceful degradation.
    pair_multiplier: float = dataclasses.field(default=4.0, metadata={"static": True})
    # Splats processed per inner-kernel chunk; also the MXU contraction dim of
    # the color accumulation matmul.  128 default (small-scene friendly); at
    # multi-million-splat scale set 256 — fewer grid steps at unchanged
    # per-pair work: fwd 422.6 -> 394.2 / fwd+bwd 834.2 -> 772.6 ms at
    # bicycle scale (tools/tpu_jobs/922; bench.py uses 256).
    chunk_size: int = dataclasses.field(default=128, metadata={"static": True})
    # Pairs per step of the Pallas expansion kernel (ops/pair_expand.py);
    # larger amortizes grid overhead and halves the r0-searchsorted query
    # count (512 measured 147 -> 113 ms over 256 at bicycle scale; 1024
    # exceeds VMEM for the (2C, C) window compare).
    expand_chunk: int = dataclasses.field(default=512, metadata={"static": True})
    # Slot windows of expand_chunk pairs per expansion-kernel grid step.
    # MEASURED A WASH on v5e at bicycle scale (tools/tpu_jobs/477: 291 /
    # 283 / 285 / 286 ms at W=1/2/4/8): although a no-op kernel on the same
    # grid costs 62 ms (tools/tpu_jobs/475), that per-step machinery fully
    # overlaps the real kernel's VPU compute, so amortizing it buys
    # nothing.  A shared (W+1)-block window was strictly worse (332 ms at
    # W=4 — rebase rotates grow O(W)); raising expand_chunk instead also
    # loses (C=1024: 146 ms vs 124 — (C, C) compute grows quadratically).
    # Kept as a knob for future hardware; don't revisit on v5e.
    expand_windows: int = dataclasses.field(default=1, metadata={"static": True})
    # Static per-tile work cap for the XLA rasterizer path (it needs a static
    # trip count; the Pallas kernel loops to the true per-tile count instead).
    max_pairs_per_tile: int = dataclasses.field(default=8192, metadata={"static": True})
    # DeviceAsset rendering: decode SH planar (3 x (N, 15) channel arrays)
    # instead of interleaved (N, 15, 3).  MEMORY knob for very large scenes:
    # the interleaved form is materialized twice by XLA (the shade path
    # wants a {0,2,1} layout copy) — 12.7 GB at 31.5M splats, the OOM line
    # of the one-chip 30M demo (tools/tpu_jobs/479) — while planar holds one
    # copy.  Costs ~170 ms/frame at 6.1M (shade_sh's strided channel-column
    # reads, tools/tpu_jobs 7809c90 negative), so off by default; turn on
    # when the scene doesn't fit otherwise.
    decode_planar_sh: bool = dataclasses.field(default=False, metadata={"static": True})
    # Stop compositing a tile once max transmittance drops below this
    # (the official 3DGS early-out; reference relies on 1/255 alpha discard).
    transmittance_eps: float = dataclasses.field(default=1e-4, metadata={"static": True})
    # Alpha handling identical to the reference fragment shader
    # (RenderGaussianSplats.shader:79-108).
    alpha_discard: float = dataclasses.field(default=1.0 / 255.0, metadata={"static": True})
    alpha_max: float = dataclasses.field(default=0.9999, metadata={"static": True})
    # Clip splats to their |q| <= 2 eigen-axis quad like the reference's
    # instanced-quad geometry (RenderGaussianSplats.shader:54-55).  Disabling
    # (together with alpha_discard=0) makes the forward pass smooth, which
    # gradient finite-difference tests need.
    quad_clip: bool = dataclasses.field(default=True, metadata={"static": True})
    # Use the hand-written Pallas backward kernel for the pallas backend's
    # VJP (False falls back to XLA autodiff of the tile path — test-scale
    # only: its transposed scan lane-pads pair buffers and OOMs at scale).
    pallas_backward: bool = dataclasses.field(default=True, metadata={"static": True})
    # Round pair colors+opacity through fp16, exactly like the reference's
    # packed SplatViewData (SplatUtilities.compute:247-248 f32tof16).  Lets
    # the fused pipeline carry color as two packed u32 sort payloads
    # (~80 ms/frame at bicycle scale).  Applied consistently in ALL
    # backends (oracle included) so cross-backend tests stay exact; set
    # False (with alpha_discard=0) for smooth-gradient finite-difference
    # work.
    pack_color_f16: bool = dataclasses.field(default=True, metadata={"static": True})
    # Round screen-space quad axes through fp16 as well, letting the fused
    # sort carry them as two packed u32 payloads (another ~95 ms/frame at
    # bicycle scale).  The reference keeps axes f32 in SplatViewData
    # (GaussianSplatting.hlsl:610-615), so this is a deviation: axis
    # magnitudes are O(1..100) px and fp16 keeps ~3 decimal digits, a
    # <=0.1% geometry perturbation.  Off by default; the benchmark enables
    # it.  Applied consistently in all backends when on.
    pack_axes_f16: bool = dataclasses.field(default=False, metadata={"static": True})
    # Pack BOTH screen axes into ONE u32 sort payload as (theta 12-bit,
    # log2|a1| 10-bit, log2|a2| 10-bit) — valid because the eigen
    # decomposition guarantees axis2 = |a2| * perp(axis1) with fixed
    # handedness, so one angle + two log-lengths reconstructs the pair
    # exactly orthogonal.  Coarser than f16 (~0.45% max length step vs
    # ~0.05%) but saves one sort operand (~29 ms at bicycle scale, r5).
    # Supersedes pack_axes_f16 when set; applied consistently in all
    # backends (straight-through gradients).  Off by default.
    pack_axes_u32: bool = dataclasses.field(default=False, metadata={"static": True})
    # Round per-pair backward gradients through bfloat16 so the backward
    # glue's grouping sort (pair_gradients_to_splats) carries them as 5
    # packed u32 payloads instead of 10 f32 — each dropped operand saves
    # ~48 ms at bicycle scale.  bfloat16 (not f16): per-pair gradients of a
    # mean loss are ~1e-7, far below f16's subnormal floor, while bf16
    # keeps the full f32 exponent range at ~0.4% relative rounding.  The
    # per-splat reduction itself stays f32.  Off by default (strict
    # cross-backend gradient agreement); the benchmark enables it.
    pack_grads_bf16: bool = dataclasses.field(default=False, metadata={"static": True})
    # Pack each pair's screen center into ONE u32 sort payload (instead of
    # two f32) in the pair's own eigen-frame relative to its tile center:
    # the quantization tolerance scales with the same axis as the range
    # (12-bit major / 17-bit minor offsets -> ~7e-4 error in the q
    # coordinates even at extreme anisotropy), bounded by the
    # ellipse-interval cull's survival guarantee.  Saves one sort operand:
    # measured fwd 505 -> 456 ms at bicycle scale (tools/tpu_jobs/457, r3);
    # the benchmark enables it.  Lossy and pallas-pipeline-internal (other
    # backends keep f32 centers), so off by default; requires the cull to
    # be active (alpha_discard > 0 or quad_clip) — silently ignored
    # otherwise.
    pack_center_u32: bool = dataclasses.field(default=False, metadata={"static": True})
    # Quantize pair colors to RGBA8 (rgb 8 bits over [0, 2], opacity 8 bits
    # over [0, 1]) so the fused sort carries color+opacity as ONE packed u32
    # payload instead of two (saves another sort operand, ~27-31 ms at
    # bicycle scale).  Coarser than the asset's own Norm8 color only in the
    # SH-shaded view-dependent part; gradients pass straight-through.
    # QUALITY CAVEAT: shaded rgb is HARD-SATURATED at 2.0 — the f16 path
    # (and the reference's SplatViewData) preserves highlights above it.
    # The clamp is scene-dependent and applied consistently across all
    # backends (no divergence, but bright HDR-ish scenes lose specular
    # peaks beyond the measured 63 dB); probe a scene's exposure with
    # utils.quality.rgba8_clip_fraction before enabling.
    # Supersedes pack_color_f16's rounding when set.  Applied consistently
    # in all backends.  Off by default (the reference's SplatViewData is
    # f16, SplatUtilities.compute:247-248); the benchmark enables it if the
    # measured quality holds.
    pack_color_rgba8: bool = dataclasses.field(default=False, metadata={"static": True})
