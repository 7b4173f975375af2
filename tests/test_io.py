"""Asset pipeline tests: codecs, chunked quantization round-trips, PLY/SPZ."""

import jax.numpy as jnp
import numpy as np
import pytest

from unitygaussiansplatting_tpu.io import formats as F
from unitygaussiansplatting_tpu.io.asset import (
    InputSplats,
    decode_asset,
    encode_asset,
    load_asset,
    pack_smallest3_np,
    save_asset,
    unpack_smallest3_np,
)
from unitygaussiansplatting_tpu.io.creator import create_asset, reorder_morton
from unitygaussiansplatting_tpu.io.ply import read_ply, write_ply
from unitygaussiansplatting_tpu.io.spz import read_spz, write_spz


def make_splats(n=1500, seed=0) -> InputSplats:
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return InputSplats(
        pos=rng.uniform(-5, 5, (n, 3)).astype(np.float32),
        rot=pack_smallest3_np(q),
        scale=np.exp(rng.uniform(-6, -1, (n, 3))).astype(np.float32),
        color=rng.uniform(0, 1, (n, 3)).astype(np.float32),
        opacity=rng.uniform(0.02, 0.98, n).astype(np.float32),
        sh=(0.3 * rng.normal(size=(n, 15, 3))).astype(np.float32),
    )


def psnr(a, b, peak):
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(peak**2 / max(mse, 1e-20))


class TestAssetRoundtrip:
    @pytest.mark.parametrize("quality", ["medium", "high", "very_high"])
    def test_preset_roundtrip(self, quality):
        splats = make_splats()
        preset = F.QUALITY_PRESETS[quality]
        asset = encode_asset(
            splats,
            pos_format=preset.pos,
            scale_format=preset.scale,
            color_format=preset.color,
            sh_format=preset.sh,
        )
        out = decode_asset(asset)

        extent = splats.pos.max() - splats.pos.min()
        assert psnr(out.pos, splats.pos, extent) > {"medium": 55, "high": 80, "very_high": 130}[quality]
        assert psnr(out.color, splats.color, 1.0) > {"medium": 40, "high": 55, "very_high": 130}[quality]
        assert psnr(out.opacity, splats.opacity, 1.0) > 35
        assert psnr(out.sh, splats.sh, 2.0) > {"medium": 30, "high": 40, "very_high": 130}[quality]
        # Rotation codec is always 10.10.10.2.
        qa = unpack_smallest3_np(splats.rot)
        qb = unpack_smallest3_np(out.rot)
        dots = np.abs(np.sum(qa * qb, axis=-1))
        assert dots.min() > 0.9999
        # Scale is chunked+warped: compare in log space, relative.
        if quality != "very_high":
            rel = np.abs(np.log(out.scale) - np.log(splats.scale))
            assert np.median(rel) < 0.02
        else:
            np.testing.assert_allclose(out.scale, splats.scale, rtol=1e-5)

    def test_very_high_lossless_pos(self):
        splats = make_splats()
        asset = encode_asset(
            splats,
            pos_format=F.VectorFormat.Float32,
            scale_format=F.VectorFormat.Float32,
            color_format=F.ColorFormat.Float32x4,
            sh_format=F.SHFormat.Float32,
        )
        assert not asset.has_chunks
        out = decode_asset(asset)
        np.testing.assert_array_equal(out.pos, splats.pos)
        np.testing.assert_array_equal(out.sh, splats.sh)

    def test_compression_ratios(self):
        # Blob sizes must match the reference's per-format math
        # (GaussianSplatAsset.cs:174-203).
        n = 4096
        splats = make_splats(n)
        asset = encode_asset(
            splats,
            pos_format=F.VectorFormat.Norm11,
            scale_format=F.VectorFormat.Norm11,
            color_format=F.ColorFormat.Norm8x4,
            sh_format=F.SHFormat.Norm6,
        )
        assert len(asset.pos_blob) == n * 4
        assert len(asset.other_blob) == n * 8  # 4 rot + 4 scale
        w, h = F.texture_size(n)
        assert len(asset.color_blob) == w * h * 4
        assert len(asset.sh_blob) == n * 32
        assert len(asset.chunk_blob) == (n // 256) * 64

    def test_save_load(self, tmp_path):
        splats = make_splats(600)
        asset = encode_asset(splats)
        meta = save_asset(asset, str(tmp_path), "test")
        loaded = load_asset(meta)
        assert loaded.splat_count == asset.splat_count
        assert loaded.data_hash == asset.data_hash
        out1 = decode_asset(asset)
        out2 = decode_asset(loaded)
        np.testing.assert_array_equal(out1.pos, out2.pos)

    def test_cluster_format(self):
        # SH data drawn from a 64-prototype mixture (random 45-dim noise has
        # no cluster structure to find); k-means must recover the prototypes.
        rng = np.random.default_rng(7)
        protos = 0.4 * rng.normal(size=(64, 15, 3)).astype(np.float32)
        member = rng.integers(0, 64, size=2048)
        splats = make_splats(2048)
        splats.sh[:] = protos[member] + 0.01 * rng.normal(size=(2048, 15, 3))

        from unitygaussiansplatting_tpu.io.kmeans import cluster_sh

        table, idx = cluster_sh(splats.sh, k=256, iters=128, batch=1024)
        asset = encode_asset(
            splats,
            sh_format=F.SHFormat.Cluster4k,
            sh_indices=np.asarray(idx),
            sh_table=np.pad(np.asarray(table), ((0, 4096 - 256), (0, 0), (0, 0))),
        )
        assert asset.has_sh_index
        out = decode_asset(asset)
        corr = np.corrcoef(out.sh.ravel(), splats.sh.ravel())[0, 1]
        assert corr > 0.95


class TestPly:
    def test_roundtrip(self, tmp_path):
        splats = make_splats(800)
        p = str(tmp_path / "test.ply")
        write_ply(p, splats)
        out = read_ply(p)
        np.testing.assert_allclose(out.pos, splats.pos, atol=1e-6)
        np.testing.assert_allclose(out.color, splats.color, atol=1e-5)
        np.testing.assert_allclose(out.opacity, splats.opacity, atol=1e-5)
        np.testing.assert_allclose(out.scale, splats.scale, rtol=1e-5)
        np.testing.assert_allclose(out.sh, splats.sh, atol=1e-6)
        qa = unpack_smallest3_np(splats.rot)
        qb = unpack_smallest3_np(out.rot)
        assert np.abs(np.sum(qa * qb, axis=-1)).min() > 0.99999

    def test_rejects_bad_magic(self, tmp_path):
        p = tmp_path / "bad.ply"
        p.write_bytes(b"nope\n")
        with pytest.raises(ValueError):
            read_ply(str(p))


class TestSpz:
    def test_roundtrip(self, tmp_path):
        splats = make_splats(700)
        # SPZ's u8 SH codec covers [-1, 1); clamp so clipping doesn't
        # dominate the comparison.
        splats.sh[:] = np.clip(splats.sh, -0.99, 0.98)
        p = str(tmp_path / "test.spz")
        write_spz(p, splats)
        out = read_spz(p)
        assert out.count == splats.count
        np.testing.assert_allclose(out.pos, splats.pos, atol=2.0 / (1 << 12) + 1e-3)
        np.testing.assert_allclose(out.opacity, splats.opacity, atol=1 / 255.0)
        # one u8 step in SPZ color space = (1/255)/0.15*SH_C0 ~ 0.0074 in color
        np.testing.assert_allclose(out.color, splats.color, atol=0.008)
        rel = np.abs(np.log(out.scale) - np.log(splats.scale))
        assert rel.max() < 1 / 16.0 + 1e-3
        np.testing.assert_allclose(out.sh, splats.sh, atol=1 / 128.0 + 1e-6)


class TestCreator:
    def test_end_to_end_ply(self, tmp_path):
        splats = make_splats(1000)
        ply_path = str(tmp_path / "scene.ply")
        write_ply(ply_path, splats)
        asset = create_asset(ply_path, output_folder=str(tmp_path / "out"), quality="medium")
        assert asset.splat_count == 1000
        # Morton reorder permutes splats; decoded positions must be a
        # permutation of the originals (to quantization tolerance).
        out = decode_asset(asset)
        a = np.sort(np.round(out.pos[:, 0], 2))
        b = np.sort(np.round(splats.pos[:, 0], 2))
        assert np.abs(a - b).max() < 0.02

    def test_morton_improves_locality(self):
        splats = make_splats(4096)
        ordered = reorder_morton(splats)
        d0 = np.linalg.norm(np.diff(splats.pos, axis=0), axis=1).mean()
        d1 = np.linalg.norm(np.diff(ordered.pos, axis=0), axis=1).mean()
        assert d1 < d0 * 0.5


class TestCameras:
    def test_cameras_json_import_and_camera_build(self, tmp_path):
        import json

        # 3DGS-style cameras.json one directory above the input file.
        rot = np.eye(3).tolist()
        cams = [
            {
                "id": 0, "img_name": "0001", "width": 980, "height": 545,
                "position": [1.0, 2.0, 3.0], "rotation": rot,
                "fx": 1000.0, "fy": 1000.0,
            }
        ]
        (tmp_path / "cameras.json").write_text(json.dumps(cams))
        sub = tmp_path / "pc"
        sub.mkdir()
        ply_path = sub / "scene.ply"
        write_ply(str(ply_path), make_splats(100))

        from unitygaussiansplatting_tpu.io.creator import create_asset

        asset = create_asset(str(ply_path), quality="medium")
        assert asset.cameras and len(asset.cameras) == 1
        info = asset.cameras[0]
        np.testing.assert_allclose(info["pos"], [1.0, 2.0, 3.0])

        from unitygaussiansplatting_tpu.models.camera import Camera

        cam = Camera.from_camera_info(info, width=980, height=545, fov_y_deg=47.0)
        # Camera position must round-trip through the view matrix.
        np.testing.assert_allclose(np.asarray(cam.position), [1.0, 2.0, 3.0], atol=1e-5)

    def test_no_cameras_json(self, tmp_path):
        ply_path = tmp_path / "scene.ply"
        write_ply(str(ply_path), make_splats(50))
        from unitygaussiansplatting_tpu.io.creator import create_asset

        asset = create_asset(str(ply_path), quality="very_high")
        assert asset.cameras is None


class TestKMeansQuality:
    """Cluster-format quality tracking (reference preset comments record
    measured PSNR per quality level, GaussianSplatAssetCreator.cs:195-219)
    and the 3-attempt init parity (KMeansClustering.cs:508-570)."""

    def _structured_sh(self, n=6000, protos=40, seed=0):
        rng = np.random.default_rng(seed)
        table = (0.5 * rng.normal(size=(protos, 45))).astype(np.float32)
        idx = rng.integers(0, protos, n)
        return (table[idx] + 0.02 * rng.normal(size=(n, 45))).astype(np.float32)

    def test_cluster_psnr_improves_with_k(self):
        from unitygaussiansplatting_tpu.io.kmeans import cluster_sh

        sh = self._structured_sh().reshape(-1, 15, 3)
        results = {}
        for k in (16, 128):
            table, idx = cluster_sh(sh, k=k, iters=64)
            rec = np.asarray(table.reshape(k, 45))[np.asarray(idx)]
            results[k] = psnr(rec, sh.reshape(-1, 45), 2.0)
        assert results[128] > results[16] + 3.0, results
        # 128 >= 40 protos: near-lossless up to the injected noise floor.
        assert results[128] > 35.0, results

    def test_arbitrary_k_not_multiple_of_chunk(self):
        import jax

        from unitygaussiansplatting_tpu.io.kmeans import assign_clusters, fit_kmeans

        rng = np.random.default_rng(1)
        data = rng.normal(size=(2000, 8)).astype(np.float32)
        centers = fit_kmeans(
            jnp.asarray(data), jax.random.PRNGKey(0), k=37, iters=32, k_chunk=16
        )
        assert centers.shape == (37, 8)
        assert np.isfinite(np.asarray(centers)).all()
        idx = assign_clusters(jnp.asarray(data), centers, k_chunk=16)
        assert int(idx.max()) < 37 and int(idx.min()) >= 0

    def test_init_attempts_no_worse_than_single(self):
        import jax

        from unitygaussiansplatting_tpu.io.kmeans import _chunked_argmin_dist, fit_kmeans

        data = jnp.asarray(self._structured_sh(n=3000, seed=2))
        def cost(centers):
            _, d = _chunked_argmin_dist(data, centers, 64)
            return float(jnp.sum(d))

        c3 = fit_kmeans(data, jax.random.PRNGKey(5), k=64, iters=0, init_attempts=3)
        c1 = fit_kmeans(data, jax.random.PRNGKey(5), k=64, iters=0, init_attempts=1)
        assert cost(c3) <= cost(c1) * 1.0001
