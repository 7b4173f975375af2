"""Gradient correctness: autodiff through the renderer vs finite differences.

The reference has no backward pass at all (SURVEY.md §0); these tests
establish the differentiability contract the TPU build adds — gradients
w.r.t. means, scales, rotations, opacities and SH coefficients
(BASELINE.json config 1: synthetic scene, finite-diff check).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.models.renderer import render
from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene


@pytest.fixture(scope="module")
def small_scene():
    return sphere_scene(n=60, seed=3)


@pytest.fixture(scope="module")
def camera():
    return Camera.look_at(
        eye=[0.0, 0.3, -2.6],
        target=[0.0, 0.0, 0.0],
        up=[0.0, 1.0, 0.0],
        fov_y_deg=50.0,
        width=48,
        height=32,
    )


# Finite differences require a smooth forward pass: the quad clip and alpha
# discard are O(1) jumps that FD samples but autodiff (correctly) ignores.
SMOOTH = RasterizeConfig(quad_clip=False, alpha_discard=0.0, pack_color_f16=False)


def loss_fn(raw, camera, backend, config=SMOOTH):
    img = render(
        raw.activate(),
        camera,
        settings=RenderSettings(sh_order=1),
        config=config,
        backend=backend,
    )
    # Weighted sum (pseudo target) exercises rgb and alpha channels.
    w = jnp.asarray([0.3, 0.5, 0.2, 0.7])
    return jnp.sum(img * w)


@pytest.mark.parametrize("backend", ["reference"])
@pytest.mark.parametrize(
    "field", ["means", "log_scales", "opacity_logits", "sh0", "rotations_wxyz", "sh"]
)
def test_grad_matches_finite_diff(small_scene, camera, backend, field, monkeypatch):
    # FD runs against the un-binned oracle backend only: the tile backend's
    # AABB truncation adds small tail discontinuities FD would sample; its
    # gradients are covered by test_backends_agree_on_grads below.
    raw = small_scene
    grad = jax.grad(lambda r: loss_fn(r, camera, backend))(raw)
    g = np.asarray(getattr(grad, field))
    assert np.isfinite(g).all(), f"non-finite grads for {field}"

    # Probe a handful of coordinates with central differences.
    rng = np.random.default_rng(0)
    flat_idx = rng.choice(g.size, size=min(6, g.size), replace=False)
    base = np.asarray(getattr(raw, field))
    eps = 3e-3
    f0 = lambda arr: float(
        loss_fn(
            jax.tree_util.tree_map(lambda x: x, raw).__class__(
                **{
                    **{k: getattr(raw, k) for k in raw.__dataclass_fields__},
                    field: jnp.asarray(arr),
                }
            ),
            camera,
            backend,
        )
    )
    # Geometry parameters move splat footprints across hard boundaries (the
    # |q|<=2 quad clip, the 1/255 alpha discard, tile edges); finite
    # differences sample those jumps while autodiff correctly treats them as
    # measure-zero.  Allow a looser tolerance there plus one outlier.
    geometry = field in ("means", "log_scales", "rotations_wxyz")
    rel_tol = 0.15 if geometry else 0.06
    # SH fields can also probe across the shade_sh max(res, 0) clamp kink.
    max_outliers = 1 if geometry or field in ("sh", "sh0") else 0
    failures = []
    for i in flat_idx:
        arr = base.copy()
        arr.flat[i] += eps
        fp = f0(arr)
        arr = base.copy()
        arr.flat[i] -= eps
        fm = f0(arr)
        fd = (fp - fm) / (2 * eps)
        an = g.flat[i]
        scale = max(abs(fd), abs(an), 1e-2)
        if abs(fd) < 1e-4 and abs(an) < 1e-4:
            continue
        if abs(fd - an) / scale >= rel_tol:
            failures.append(f"{field}[{i}]: finite-diff {fd} vs autodiff {an}")
    assert len(failures) <= max_outliers, "; ".join(failures)
    # At least one coordinate must have a meaningfully nonzero gradient.
    assert np.abs(g).max() > 1e-6


def test_backends_agree_on_grads(small_scene, camera):
    # Default config: with the quad clip active the tile backend's binning
    # AABB is a superset of the quad, so both backends compute the *same*
    # function and autodiff must agree.
    cfg = RasterizeConfig()
    g_jax = jax.grad(lambda r: loss_fn(r, camera, "jax", cfg))(small_scene)
    g_ref = jax.grad(lambda r: loss_fn(r, camera, "reference", cfg))(small_scene)
    for field in ("means", "log_scales", "opacity_logits", "sh0"):
        a = np.asarray(getattr(g_jax, field))
        b = np.asarray(getattr(g_ref, field))
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4, err_msg=field)


def test_pallas_backward_matches_jax(small_scene, camera):
    # The pallas backend's custom VJP (XLA-autodiff backward) must produce
    # the same gradients as differentiating the XLA tile path directly.
    cfg = RasterizeConfig()
    g_jax = jax.grad(lambda r: loss_fn(r, camera, "jax", cfg))(small_scene)

    import unitygaussiansplatting_tpu.ops.rasterize_pallas as rpal
    from unitygaussiansplatting_tpu.ops.binning import bin_splats
    from unitygaussiansplatting_tpu.ops.projection import project_splats

    def loss_pallas(raw):
        g = raw.activate()
        proj = project_splats(g, camera, RenderSettings(sh_order=1))
        img = rpal.rasterize_tiles_pallas_diff(
            proj, camera.width, camera.height, cfg
        )
        w = jnp.asarray([0.3, 0.5, 0.2, 0.7])
        return jnp.sum(img * w)

    # interpret-mode pallas on CPU
    rpal.INTERPRET = True
    try:
        g_pal = jax.grad(loss_pallas)(small_scene)
    finally:
        rpal.INTERPRET = False

    for field in ("means", "log_scales", "opacity_logits", "sh0"):
        np.testing.assert_allclose(
            np.asarray(getattr(g_pal, field)),
            np.asarray(getattr(g_jax, field)),
            rtol=2e-3,
            atol=2e-5,
            err_msg=field,
        )


def test_pack_grads_bf16_close_to_f32(small_scene, camera):
    # The benchmark's pack_grads_bf16 rounds per-pair gradients through
    # bfloat16 in the backward grouping sort; the per-splat sums must stay
    # within bf16 rounding (~0.4% per pair, smaller after averaging) of the
    # exact f32 path.
    import unitygaussiansplatting_tpu.ops.rasterize_pallas as rpal
    from unitygaussiansplatting_tpu.ops.projection import project_splats

    def make_loss(cfg):
        def loss(raw):
            g = raw.activate()
            proj = project_splats(g, camera, RenderSettings(sh_order=1))
            img = rpal.rasterize_tiles_pallas_diff(
                proj, camera.width, camera.height, cfg
            )
            w = jnp.asarray([0.3, 0.5, 0.2, 0.7])
            return jnp.sum(img * w)

        return loss

    rpal.INTERPRET = True
    try:
        g32 = jax.grad(make_loss(RasterizeConfig()))(small_scene)
        gbf = jax.grad(make_loss(RasterizeConfig(pack_grads_bf16=True)))(small_scene)
    finally:
        rpal.INTERPRET = False

    for field in ("means", "log_scales", "opacity_logits", "sh0"):
        a = np.asarray(getattr(g32, field))
        b = np.asarray(getattr(gbf, field))
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 1e-2, field


def test_pallas_bwd_kernel_matches_xla(small_scene, camera):
    # The hand-written Pallas backward kernel (interpret mode) must match
    # XLA autodiff of the tile path on every projected-splat gradient.
    import unitygaussiansplatting_tpu.ops.rasterize_pallas as rpal
    from unitygaussiansplatting_tpu.ops.binning import bin_splats
    from unitygaussiansplatting_tpu.ops.projection import project_splats
    from unitygaussiansplatting_tpu.ops.rasterize_tiles import rasterize_tiles_jax

    # pack_color_f16 off: the XLA path's autodiff rounds color cotangents
    # through f16 (vjp of the quantization cast) while the hand-written
    # kernel keeps them f32 — a real 1e-3-level difference by design.
    cfg = RasterizeConfig(pack_color_f16=False)
    g = small_scene.activate()
    proj = project_splats(g, camera, RenderSettings(sh_order=1))
    binning = bin_splats(proj, camera.width, camera.height, cfg)
    rng = np.random.default_rng(11)
    gimg = jnp.asarray(
        rng.normal(size=(camera.height, camera.width, 4)).astype(np.float32)
    )

    _, vjp_x = jax.vjp(
        lambda p: rasterize_tiles_jax(p, binning, camera.width, camera.height, cfg),
        proj,
    )
    (gx,) = vjp_x(gimg)

    rpal.INTERPRET = True
    try:
        _, vjp_p = jax.vjp(
            lambda p: rpal.rasterize_tiles_pallas_diff(
                p, camera.width, camera.height, cfg
            ),
            proj,
        )
        (gp,) = vjp_p(gimg)
    finally:
        rpal.INTERPRET = False

    for field in ("center", "axis1", "axis2", "color", "opacity"):
        a = np.asarray(getattr(gx, field))
        b = np.asarray(getattr(gp, field))
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 1e-4, field


def test_run_reduce_mask_near_budget(small_scene, camera):
    # Regression for the run-reduce validity mask: when pair demand lands
    # within one expansion chunk of the budget (or overflows it), the
    # Pallas reduction grid stops short of the last splat blocks; those
    # splats must come back as exact zeros (their pairs were truncated),
    # not whatever the unvisited output HBM held.
    import unitygaussiansplatting_tpu.ops.rasterize_pallas as rpal
    from unitygaussiansplatting_tpu.ops.binning import pair_budget
    from unitygaussiansplatting_tpu.ops.pair_expand import bin_and_prepare
    from unitygaussiansplatting_tpu.ops.projection import project_splats

    g = small_scene.activate()
    proj = project_splats(g, camera, RenderSettings(sh_order=1))
    n = proj.depth.shape[0]

    # Find a multiplier whose budget is within one expand chunk of demand.
    cfg0 = RasterizeConfig(pack_grads_bf16=True)
    _, _, num_real = bin_and_prepare(
        proj, camera.width, camera.height, cfg0, interpret=True
    )
    demand = int(num_real) + 0  # live AABB pairs (sentinels add < n more)
    mult = (demand + n) / n  # budget ~= demand + sentinel allowance
    cfg = RasterizeConfig(pack_grads_bf16=True, pair_multiplier=mult)
    k = pair_budget(n, cfg)
    assert k - demand < k, "sanity"

    def loss(raw):
        gg = raw.activate()
        p = project_splats(gg, camera, RenderSettings(sh_order=1))
        img = rpal.rasterize_tiles_pallas_diff(p, camera.width, camera.height, cfg)
        return jnp.sum(img * jnp.asarray([0.3, 0.5, 0.2, 0.7]))

    rpal.INTERPRET = True
    try:
        grads = jax.grad(loss)(small_scene)
    finally:
        rpal.INTERPRET = False
    for field in ("means", "log_scales", "opacity_logits", "sh0"):
        arr = np.asarray(getattr(grads, field))
        assert np.isfinite(arr).all(), field
    # The scene fits the budget here, so gradients must be nonzero overall
    # (the mask may only kill splats whose pairs were actually truncated).
    assert np.abs(np.asarray(grads.means)).max() > 0


def test_run_reduce_straddling_final_window():
    # Direct regression for the run-reduce validity mask: when the LAST grid
    # window starts in block vb but covers splats of block vb+1 (straddle),
    # those splats' sums live in visited block vb's *hi* half.  Masking both
    # halves at (vb+1)*C (the old single-edge mask) zeroed up to C-1 valid
    # tail splats; the fix masks lo at (vb+1)*C and shifted-hi at (vb+2)*C.
    from unitygaussiansplatting_tpu.ops.rasterize_pallas_bwd import _run_reduce

    c = 256
    k = 512  # two grid steps
    n = 300
    rng = np.random.default_rng(7)

    # counts: splats 0..254 -> 1 pair, splat 255 -> 2 (its run covers slot
    # 256, so step 1's r0 = 255 -> vb = 0), splats 256..298 -> 5, 299 -> 40.
    counts = np.zeros(n, np.int32)
    counts[:255] = 1
    counts[255] = 2
    counts[256:299] = 5
    counts[299] = 40
    assert counts.sum() == k
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int32)

    # 10 bf16-representable field rows per pair (<= 8 significand bits),
    # packed pairwise into u32.
    fields = rng.integers(-256, 256, size=(10, k)).astype(np.float32) / 8.0
    bf = lambda r: jnp.asarray(r).astype(jnp.bfloat16)
    packed = tuple(
        jax.lax.bitcast_convert_type(bf(fields[2 * i]), jnp.uint16).astype(jnp.uint32)
        | (
            jax.lax.bitcast_convert_type(bf(fields[2 * i + 1]), jnp.uint16).astype(
                jnp.uint32
            )
            << 16
        )
        for i in range(5)
    )
    splat_ids = jnp.asarray(np.repeat(np.arange(n, dtype=np.int32), counts))
    got = np.asarray(
        _run_reduce(packed, splat_ids, jnp.asarray(offsets), n, c, interpret=True)
    )  # (10, n)

    expected = np.zeros((10, n), np.float32)
    np.add.at(expected.T, np.repeat(np.arange(n), counts), fields.T)
    np.testing.assert_allclose(got, expected, rtol=0, atol=1e-5)
    # The straddled tail splats (block 1) are the regression target:
    assert np.abs(got[:, 256:]).max() > 0

    # Budget truncation: same layout clipped to one grid step (K must stay a
    # chunk multiple) -> splat 255 keeps 1 of its 2 pairs, splats 256.. are
    # fully truncated and must come back as exact zeros.
    k2 = 256
    off2 = np.minimum(offsets, k2)
    got2 = np.asarray(
        _run_reduce(
            tuple(p[:k2] for p in packed), splat_ids[:k2], jnp.asarray(off2), n, c,
            interpret=True,
        )
    )
    exp2 = np.zeros((10, n), np.float32)
    live = np.repeat(np.arange(n), counts)[:k2]
    np.add.at(exp2.T, live, fields[:, :k2].T)
    np.testing.assert_allclose(got2, exp2, rtol=0, atol=1e-5)
    assert np.abs(got2[:, 256:]).max() == 0  # fully truncated splats


def test_padded_isotropic_splats_have_zero_finite_grads():
    # Regression: sqrt'(0) = inf made every perfectly isotropic covariance
    # (capacity-padding splats are exactly isotropic) poison the gradient of
    # all its parameters with NaN even though its pixel contribution is zero.
    from unitygaussiansplatting_tpu.models.densify import pad_to_capacity
    from unitygaussiansplatting_tpu.models.renderer import render
    from unitygaussiansplatting_tpu.models.trainer import photometric_loss
    from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

    cam = Camera.look_at(
        eye=[0, 0.5, -3.0], target=[0, 0, 0], up=[0, 1, 0],
        fov_y_deg=45.0, width=64, height=32,
    )
    cfg = RasterizeConfig(tile_h=8, chunk_size=32)
    settings = RenderSettings(sh_order=1)
    raw = pad_to_capacity(sphere_scene(n=100, seed=2), 256)
    target = jnp.zeros((32, 64, 3))

    def loss_fn(r):
        img = render(r.activate(), cam, settings, cfg, backend="jax")
        return photometric_loss(img[..., :3], target, ssim_weight=0.2)

    g = jax.grad(loss_fn)(raw)
    for f in ("means", "rotations_wxyz", "log_scales", "opacity_logits", "sh0", "sh"):
        a = np.asarray(getattr(g, f))
        assert np.isfinite(a).all(), f
        assert np.abs(a[100:]).max() == 0.0, f  # padding gets exact zeros
