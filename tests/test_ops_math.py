"""Unit tests for the splat math library (ops/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unitygaussiansplatting_tpu.ops import activations, covariance, morton, packing, quaternion, sh


def rand(*shape, seed=0, lo=-1.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return rng.uniform(lo, hi, size=shape).astype(np.float32)


class TestQuaternion:
    def test_rotate_matches_matrix(self):
        q = quaternion.quat_normalize(jnp.asarray(rand(64, 4, seed=1)))
        v = jnp.asarray(rand(64, 3, seed=2))
        r = np.asarray(quaternion.quat_to_rotation_matrix(q))
        got = quaternion.quat_rotate_vector(v, q)
        want = np.einsum("nij,nj->ni", r, np.asarray(v))
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_rotation_matrix_orthonormal(self):
        q = quaternion.quat_normalize(jnp.asarray(rand(32, 4, seed=3)))
        r = np.asarray(quaternion.quat_to_rotation_matrix(q))
        eye = np.einsum("nij,nkj->nik", r, r)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
        det = np.linalg.det(np.asarray(r))
        np.testing.assert_allclose(det, 1.0, atol=1e-5)

    def test_mul_compose(self):
        qa = quaternion.quat_normalize(jnp.asarray(rand(16, 4, seed=4)))
        qb = quaternion.quat_normalize(jnp.asarray(rand(16, 4, seed=5)))
        v = jnp.asarray(rand(16, 3, seed=6))
        ab = quaternion.quat_mul(qa, qb)
        got = quaternion.quat_rotate_vector(v, ab)
        want = quaternion.quat_rotate_vector(quaternion.quat_rotate_vector(v, qb), qa)
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_inverse(self):
        q = quaternion.quat_normalize(jnp.asarray(rand(16, 4, seed=7)))
        qi = quaternion.quat_inverse(q)
        ident = quaternion.quat_mul(q, qi)
        np.testing.assert_allclose(
            ident, np.broadcast_to(np.array([0, 0, 0, 1.0]), (16, 4)), atol=1e-5
        )

    def test_smallest3_roundtrip(self):
        q = quaternion.quat_normalize(jnp.asarray(rand(512, 4, seed=8)))
        packed = quaternion.pack_smallest3(q)
        assert float(jnp.min(packed)) >= 0.0 and float(jnp.max(packed)) <= 1.0
        unpacked = quaternion.unpack_smallest3(packed)
        # Quaternions are sign-ambiguous; compare rotations.
        ra = quaternion.quat_to_rotation_matrix(q)
        rb = quaternion.quat_to_rotation_matrix(unpacked)
        np.testing.assert_allclose(ra, rb, atol=1e-5)

    def test_swizzle(self):
        wxyz = jnp.asarray([[2.0, 0.0, 0.0, 0.0]])
        xyzw = quaternion.normalize_swizzle_rotation(wxyz)
        np.testing.assert_allclose(xyzw, [[0, 0, 0, 1.0]], atol=1e-7)


class TestActivations:
    def test_sigmoid_roundtrip(self):
        x = jnp.asarray(rand(100, seed=9, lo=-6, hi=6))
        np.testing.assert_allclose(
            activations.inv_sigmoid(activations.sigmoid(x)), x, atol=1e-3
        )

    def test_square_centered01_roundtrip(self):
        x = jnp.linspace(0.0, 1.0, 101)
        y = activations.square_centered01(x)
        np.testing.assert_allclose(activations.inv_square_centered01(y), x, atol=1e-6)
        # Endpoints and midpoint are fixed points.
        np.testing.assert_allclose(
            activations.square_centered01(jnp.asarray([0.0, 0.5, 1.0])),
            [0.0, 0.5, 1.0],
            atol=1e-7,
        )

    def test_sh0_color_roundtrip(self):
        x = jnp.asarray(rand(64, 3, seed=10))
        np.testing.assert_allclose(
            activations.color_to_sh0(activations.sh0_to_color(x)), x, atol=1e-5
        )


class TestPacking:
    @pytest.mark.parametrize(
        "enc,dec,dim,bits",
        [
            (packing.encode_11_10_11, packing.decode_11_10_11, 3, (11, 10, 11)),
            (packing.encode_6_5_5, packing.decode_6_5_5, 3, (6, 5, 5)),
            (packing.encode_5_6_5, packing.decode_5_6_5, 3, (5, 6, 5)),
            (packing.encode_10_10_10_2, packing.decode_10_10_10_2, 4, (10, 10, 10, 2)),
        ],
    )
    def test_roundtrip_error_bound(self, enc, dec, dim, bits):
        v = jnp.asarray(rand(4096, dim, seed=11, lo=0.0, hi=1.0))
        out = dec(enc(v))
        for c, b in enumerate(bits):
            step = 1.0 / (2**b - 1)
            err = np.abs(np.asarray(out[..., c] - v[..., c]))
            # The reference's floor(x * (max + 0.5)) convention is not centered
            # rounding; its worst-case error is ~1 quantization step.
            assert err.max() <= step * 1.01, f"channel {c}: {err.max()} vs {step}"

    def test_16_16_16_roundtrip(self):
        v = jnp.asarray(rand(1024, 3, seed=12, lo=0.0, hi=1.0))
        out = packing.decode_16_16_16(packing.encode_16_16_16(v))
        # f32 can't even hold 16-bit levels exactly; allow ~2 steps.
        assert np.abs(np.asarray(out - v)).max() <= 2.0 / 65535.0

    def test_exact_levels(self):
        # Quantization levels themselves round-trip exactly.
        levels = jnp.arange(2048, dtype=jnp.float32) / 2047.0
        v = jnp.stack([levels, jnp.zeros_like(levels), jnp.zeros_like(levels)], axis=-1)
        out = packing.decode_11_10_11(packing.encode_11_10_11(v))
        np.testing.assert_allclose(out[..., 0], levels, atol=1e-7)

    def test_sortable_uint_order(self):
        f = jnp.asarray(
            np.sort(rand(1000, seed=13, lo=-100, hi=100).astype(np.float32))
        )
        u = packing.float_to_sortable_uint(f)
        assert bool(jnp.all(u[1:] >= u[:-1]))
        np.testing.assert_allclose(packing.sortable_uint_to_float(u), f, atol=0)

    def test_f16_bits_roundtrip(self):
        x = jnp.asarray(rand(256, seed=14, lo=-10, hi=10))
        bits = packing.f32_to_f16_bits(x)
        back = packing.f16_bits_to_f32(bits)
        np.testing.assert_allclose(back, np.asarray(x, dtype=np.float16), atol=0)


class TestMorton:
    def test_2d_roundtrip(self):
        codes = jnp.arange(256, dtype=jnp.uint32)
        xy = morton.decode_morton2d_16x16(codes)
        back = morton.encode_morton2d_16x16(xy)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(codes))
        # Bijective onto the 16x16 grid.
        flat = np.asarray(xy[:, 1] * 16 + xy[:, 0])
        assert len(np.unique(flat)) == 256

    def test_3d_encode_known(self):
        # Interleave pattern: x gets bit 0, y bit 1, z bit 2.
        v = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]], dtype=np.uint64)
        codes = morton.morton_encode3_np(v)
        np.testing.assert_array_equal(codes, np.array([1, 2, 4, 7], dtype=np.uint64))

    def test_morton_order_locality(self):
        rng = np.random.default_rng(15)
        pts = rng.uniform(size=(4096, 3)).astype(np.float32)
        order = morton.morton_order_np(pts)
        sorted_pts = pts[order]
        # Z-order preserves locality: mean neighbor distance shrinks a lot.
        d_orig = np.linalg.norm(np.diff(pts, axis=0), axis=1).mean()
        d_sorted = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1).mean()
        assert d_sorted < d_orig * 0.5

    def test_texel_swizzle_bijective(self):
        idx = jnp.arange(2048 * 32, dtype=jnp.uint32)  # 32 rows of 16px blocks
        texel = morton.splat_index_to_texel(idx)
        flat = np.asarray(texel[:, 1].astype(np.int64) * 2048 + texel[:, 0])
        assert len(np.unique(flat)) == idx.shape[0]


class TestCovariance:
    def test_cov3d_matches_numpy(self):
        q = quaternion.quat_normalize(jnp.asarray(rand(32, 4, seed=16)))
        s = jnp.asarray(rand(32, 3, seed=17, lo=0.1, hi=2.0))
        cov6 = covariance.covariance3d(q, s)
        m = covariance.cov3d_to_matrix(cov6)
        r = np.asarray(quaternion.quat_to_rotation_matrix(q))
        want = np.einsum("nij,nj,nkj->nik", r, np.asarray(s) ** 2, r)
        np.testing.assert_allclose(np.asarray(m), want, atol=1e-4)

    def test_decompose_reconstructs(self):
        # axis1/axis2 with |axis|^2 = 2*lambda reconstruct 2*Sigma.
        cov = jnp.asarray([[4.0, 1.0, 2.0], [3.0, -0.8, 1.5], [5.0, 0.0, 0.5]])
        axes = covariance.decompose_covariance2d(cov)
        a1, a2 = np.asarray(axes.axis1), np.asarray(axes.axis2)
        recon = 0.5 * (
            np.einsum("ni,nj->nij", a1, a1) + np.einsum("ni,nj->nij", a2, a2)
        )
        want = np.stack(
            [
                np.stack([cov[:, 0], cov[:, 1]], -1),
                np.stack([cov[:, 1], cov[:, 2]], -1),
            ],
            axis=1,
        )
        np.testing.assert_allclose(recon, np.asarray(want), atol=1e-4)

    def test_decompose_orthogonal(self):
        cov = jnp.asarray(rand(64, 3, seed=18, lo=0.5, hi=4.0))
        cov = cov.at[:, 1].set(cov[:, 1] * 0.3 - 0.6)  # valid-ish off-diagonals
        axes = covariance.decompose_covariance2d(cov)
        dots = np.einsum("ni,ni->n", np.asarray(axes.axis1), np.asarray(axes.axis2))
        np.testing.assert_allclose(dots, 0.0, atol=1e-3)

    def test_min_lambda_floor(self):
        cov = jnp.asarray([[1.0, 0.0, 0.0001]])
        axes = covariance.decompose_covariance2d(cov)
        assert np.linalg.norm(axes.axis2[0]) >= np.sqrt(2 * covariance.MIN_LAMBDA) - 1e-5

    def test_ewa_isotropic_central(self):
        # Isotropic splat on the optical axis: cov2d ~= (focal * s / z)^2 * I + 0.3.
        s = 0.1
        z = 5.0
        focal = 600.0
        cov6 = jnp.asarray([[s * s, 0, 0, s * s, 0, s * s]])
        view_pos = jnp.asarray([[0.0, 0.0, z]])
        cov2d = covariance.ewa_project(
            view_pos, cov6, jnp.eye(3), focal, 1.0, 1.0
        )
        expect = (focal * s / z) ** 2
        np.testing.assert_allclose(cov2d[0, 0], expect + 0.3, rtol=1e-5)
        np.testing.assert_allclose(cov2d[0, 2], expect + 0.3, rtol=1e-5)
        np.testing.assert_allclose(cov2d[0, 1], 0.0, atol=1e-5)


class TestSH:
    def test_order0(self):
        base = jnp.asarray(rand(8, 3, seed=19, lo=0.0, hi=1.0))
        out = sh.shade_sh(base, None, jnp.asarray(rand(8, 3, seed=20)), 0)
        np.testing.assert_allclose(out, np.maximum(np.asarray(base), 0.0), atol=1e-7)

    def test_band1_linearity(self):
        # Band-1 response flips sign when direction flips.
        base = jnp.full((1, 3), 0.5)
        shc = jnp.zeros((1, 15, 3)).at[0, 0, :].set(1.0)
        d = jnp.asarray([[0.0, 1.0, 0.0]])
        plus = sh.shade_sh(base, shc, d, 1)
        minus = sh.shade_sh(base, shc, -d, 1)
        np.testing.assert_allclose(
            np.asarray(plus - 0.5), -np.asarray(minus - 0.5), atol=1e-6
        )
        np.testing.assert_allclose(plus[0, 0], 0.5 - sh.SH_C1, atol=1e-6)

    def test_nonnegative_clamp(self):
        base = jnp.full((4, 3), -1.0)
        out = sh.shade_sh(base, jnp.zeros((4, 15, 3)), jnp.asarray(rand(4, 3)), 3)
        assert float(jnp.min(out)) >= 0.0

    def test_jit_all_orders(self):
        base = jnp.asarray(rand(16, 3, seed=21, lo=0.0, hi=1.0))
        shc = jnp.asarray(rand(16, 15, 3, seed=22))
        d = jnp.asarray(rand(16, 3, seed=23))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        outs = [
            jax.jit(sh.shade_sh, static_argnums=(3,))(base, shc, d, order)
            for order in range(4)
        ]
        # Higher orders add detail; all finite.
        for o in outs:
            assert bool(jnp.all(jnp.isfinite(o)))
        assert not np.allclose(outs[0], outs[3])
