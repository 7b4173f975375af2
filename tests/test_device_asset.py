"""Device-side compressed rendering: decode_device vs the host decoder.

The reference decodes quantized splats per frame in-kernel from compressed
GPU buffers (LoadSplatData, GaussianSplatting.hlsl:428-608).  These tests
pin the jittable device decoder to the host (numpy) decoder bit-for-bit-ish
and exercise rendering straight from a DeviceAsset.
"""

import jax
import numpy as np
import pytest

from unitygaussiansplatting_tpu.io import formats as F
from unitygaussiansplatting_tpu.io.asset import decode_asset, encode_asset
from unitygaussiansplatting_tpu.io.bridge import input_splats_to_gaussians
from unitygaussiansplatting_tpu.io.device_asset import (
    decode_device,
    device_asset_from_asset,
)
from unitygaussiansplatting_tpu.io.kmeans import cluster_sh
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.models.renderer import render

from test_io import make_splats


def assert_matches_host(asset, atol=2e-6):
    host = input_splats_to_gaussians(decode_asset(asset))
    da = device_asset_from_asset(asset)
    dev = jax.jit(decode_device)(da)
    for f in ("means", "scales", "opacities", "base_color", "sh"):
        np.testing.assert_allclose(
            np.asarray(getattr(dev, f)),
            np.asarray(getattr(host, f)),
            atol=atol,
            rtol=2e-6,
            err_msg=f,
        )
    # Quaternions match up to sign.
    qa, qb = np.asarray(dev.rotations), np.asarray(host.rotations)
    assert np.abs(np.sum(qa * qb, axis=-1)).min() > 1.0 - 1e-6
    return da, dev


@pytest.mark.parametrize("quality", ["low", "medium", "high", "very_high"])
def test_decode_device_matches_host(quality):
    splats = make_splats(n=700, seed=2)
    preset = F.QUALITY_PRESETS[quality]
    color = preset.color if preset.color != F.ColorFormat.BC7 else F.ColorFormat.Norm8x4
    kw = {}
    if F.is_cluster_format(preset.sh):
        table, idx = cluster_sh(splats.sh, k=64, iters=4)
        kw = dict(sh_indices=idx, sh_table=table)
    asset = encode_asset(
        splats,
        pos_format=preset.pos,
        scale_format=preset.scale,
        color_format=color,
        sh_format=preset.sh,
        **kw,
    )
    da, _ = assert_matches_host(asset)
    # Compression must survive onto the device: footprint ~= blob bytes.
    assert da.device_bytes() <= asset.total_bytes() * 1.6 + 4096


def test_render_from_device_asset_matches_host_decode():
    splats = make_splats(n=900, seed=5)
    asset = encode_asset(splats)  # medium-ish defaults
    da = device_asset_from_asset(asset)
    host = input_splats_to_gaussians(decode_asset(asset))
    cam = Camera.look_at(
        eye=[0.0, 1.0, -14.0],
        target=[0.0, 0.0, 0.0],
        up=[0.0, 1.0, 0.0],
        fov_y_deg=45.0,
        width=192,
        height=128,
    )
    img_host = np.asarray(render(host, cam))
    img_dev = np.asarray(jax.jit(lambda a: render(a, cam))(da))
    # Host (numpy) and device (XLA) decoders can differ by 1 ulp, which can
    # flip a discard-threshold pixel; require sub-0.01% such pixels and
    # tight agreement elsewhere (same gate style as the golden validator).
    bad = np.abs(img_dev - img_host) > 2e-5
    assert bad.mean() < 1e-4, f"{bad.sum()} mismatched values"
    assert float(img_dev[..., 3].max()) > 0.05  # drew something


def test_shade_sh_planar_matches_array():
    # The planar (tuple-of-channels) shade_sh fast path must equal the
    # array path BIT-FOR-BIT (same formulas, same term order).
    import jax.numpy as jnp

    from unitygaussiansplatting_tpu.ops.sh import shade_sh

    rng = np.random.default_rng(3)
    n = 2048
    base = jnp.asarray(rng.normal(0.5, 0.3, size=(n, 3)).astype(np.float32))
    sh = jnp.asarray(rng.normal(0, 0.2, size=(n, 15, 3)).astype(np.float32))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d = jnp.asarray(d)
    sh_cols = tuple(sh[:, :, c] for c in range(3))
    for order in (1, 2, 3):
        a = np.asarray(shade_sh(base, sh, d, order))
        p = np.asarray(shade_sh(base, sh_cols, d, order))
        np.testing.assert_array_equal(a, p, err_msg=f"order {order}")
    a = np.asarray(shade_sh(base, sh, d, 3, only_sh=True))
    p = np.asarray(shade_sh(base, sh_cols, d, 3, only_sh=True))
    np.testing.assert_array_equal(a, p)
