"""Device-side asset encoding (io/device_asset.encode_device).

The jnp mirror of the host encoder must produce DeviceAssets
bit-compatible with ``device_asset_from_asset(encode_asset(...))``.
Tolerance: quantization codes may differ by ±1 on a tiny fraction of
elements (XLA fuses ``x * scale + 0.5`` into an FMA, a 1-ulp difference
that matters only exactly on a code boundary — verified on a concrete
element in round 4).
"""

import numpy as np
import pytest

from unitygaussiansplatting_tpu.io import formats as F
from unitygaussiansplatting_tpu.io.asset import encode_asset
from unitygaussiansplatting_tpu.io.bridge import gaussians_to_input_splats
from unitygaussiansplatting_tpu.io.device_asset import (
    decode_device,
    device_asset_from_asset,
    encode_device,
)
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

COMBOS = [
    {},  # Medium: Norm11 / Norm11 / Norm8x4 / Norm6
    dict(pos_format=F.VectorFormat.Norm16, scale_format=F.VectorFormat.Norm6,
         color_format=F.ColorFormat.Float16x4, sh_format=F.SHFormat.Norm11),
    dict(pos_format=F.VectorFormat.Float32, scale_format=F.VectorFormat.Float32,
         color_format=F.ColorFormat.Float32x4, sh_format=F.SHFormat.Float32),
    dict(sh_format=F.SHFormat.Float16),
]


@pytest.mark.parametrize("kw", COMBOS)
def test_encode_device_matches_host_encoder(kw):
    g = sphere_scene(n=1000, seed=5).activate()
    splats = gaussians_to_input_splats(g)
    host = device_asset_from_asset(encode_asset(splats, **kw))
    dev = encode_device(g, **kw)
    for f in ("pos_q", "rot_q", "scale_q", "color_q", "sh_q", "chunk_info"):
        a, b = getattr(host, f), getattr(dev, f)
        if a is None and b is None:
            continue
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape, f
        assert a.dtype == b.dtype, f
        ndiff = int((a != b).sum())
        # code-boundary jitter only: <=0.5% of elements.
        assert ndiff <= max(2, a.size // 200), (f, ndiff, a.size)


def test_encode_device_decode_roundtrip_quality():
    g = sphere_scene(n=2000, seed=6).activate()
    da = encode_device(g)  # Medium
    back = decode_device(da)
    # Medium-preset tolerances (the preset measures ~49 dB end-to-end).
    np.testing.assert_allclose(
        np.asarray(back.means), np.asarray(g.means), atol=2e-3
    )
    # Opacity rides 8 bits through the square-centered warp whose inverse
    # has unbounded slope at 0.5 (GaussianUtils.cs:25-38): worst-case code
    # error ~0.045 — same for the host encoder.
    np.testing.assert_allclose(
        np.asarray(back.opacities), np.asarray(g.opacities), atol=6e-2
    )
    np.testing.assert_allclose(
        np.asarray(back.scales), np.asarray(g.scales), rtol=0.25, atol=2e-4
    )
    # Rotations up to sign.
    q0, q1 = np.asarray(g.rotations), np.asarray(back.rotations)
    dot = np.abs(np.sum(q0 * q1, axis=-1))
    assert dot.min() > 0.999


def test_encode_device_rejects_host_only_formats():
    g = sphere_scene(n=64, seed=0).activate()
    with pytest.raises(NotImplementedError):
        encode_device(g, color_format=F.ColorFormat.BC7)
    with pytest.raises(NotImplementedError):
        encode_device(g, sh_format=F.SHFormat.Cluster4k)
