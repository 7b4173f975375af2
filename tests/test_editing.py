"""Editing API tests: selection, transforms, cutouts, SH rotation, export."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from unitygaussiansplatting_tpu.editing import (
    Cutout,
    CutoutType,
    EditState,
    cutout_kill_mask,
    delete_selected,
    edit_summary,
    export_gaussians,
    invert_selection,
    merge_gaussians,
    rotate_selection,
    scale_selection,
    select_rect,
    translate_selection,
)
from unitygaussiansplatting_tpu.editing.export import bake_transform
from unitygaussiansplatting_tpu.models.camera import Camera
from unitygaussiansplatting_tpu.models.renderer import render
from unitygaussiansplatting_tpu.ops.quaternion import quat_to_rotation_matrix
from unitygaussiansplatting_tpu.ops.sh import rotate_sh, shade_sh
from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene


@pytest.fixture()
def scene():
    return sphere_scene(n=500, seed=1).activate()


@pytest.fixture()
def camera():
    return Camera.look_at(
        eye=[0, 0, -3.0], target=[0, 0, 0], up=[0, 1, 0],
        fov_y_deg=45.0, width=160, height=120,
    )


class TestSelection:
    def test_rect_select_half(self, scene, camera):
        st = EditState.empty(scene.num_splats)
        st = select_rect(st, scene, camera, (0, 0), (80, 120))
        n_sel = int(st.selected.sum())
        assert 0 < n_sel < scene.num_splats
        # Selected splats project into the left half.
        view = scene.means @ camera.view[:3, :3].T + camera.view[:3, 3]
        pix = camera.view_to_pixel(view)
        assert float(jnp.max(jnp.where(st.selected, pix[:, 0], -jnp.inf))) <= 80.0

    def test_subtract(self, scene, camera):
        st = EditState.empty(scene.num_splats)
        st = select_rect(st, scene, camera, (0, 0), (160, 120))
        before = int(st.selected.sum())
        st = select_rect(st, scene, camera, (0, 0), (80, 120), subtract=True)
        assert int(st.selected.sum()) < before

    def test_invert_excludes_deleted(self, scene):
        st = EditState.empty(scene.num_splats)
        st = dataclasses.replace(st, selected=st.selected.at[:10].set(True))
        st = delete_selected(st)
        assert int(st.deleted.sum()) == 10
        st = invert_selection(st)
        assert not bool(st.selected[:10].any())
        assert bool(st.selected[10:].all())

    def test_summary(self, scene):
        st = EditState.empty(scene.num_splats)
        st = dataclasses.replace(st, selected=st.selected.at[:50].set(True))
        s = edit_summary(scene, st)
        assert int(s.selected_count) == 50
        assert np.all(np.asarray(s.selected_bounds_min) <= np.asarray(s.selected_bounds_max))


class TestTransforms:
    def test_translate(self, scene):
        st = EditState.empty(scene.num_splats)
        st = dataclasses.replace(st, selected=st.selected.at[:100].set(True))
        out = translate_selection(scene, st, [1.0, 2.0, 3.0])
        np.testing.assert_allclose(
            np.asarray(out.means[:100]), np.asarray(scene.means[:100]) + [1, 2, 3], atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(out.means[100:]), np.asarray(scene.means[100:]))

    def test_rotate_moves_positions(self, scene):
        st = EditState.empty(scene.num_splats)
        st = dataclasses.replace(st, selected=jnp.ones_like(st.selected))
        q = jnp.asarray([0.0, np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4)])  # 90 deg about y
        out = rotate_selection(scene, st, q, center=[0, 0, 0])
        r = np.asarray(quat_to_rotation_matrix(q))
        np.testing.assert_allclose(
            np.asarray(out.means), np.asarray(scene.means) @ r.T, atol=1e-5
        )

    def test_scale(self, scene):
        st = EditState.empty(scene.num_splats)
        st = dataclasses.replace(st, selected=jnp.ones_like(st.selected))
        out = scale_selection(scene, st, [2.0, 2.0, 2.0], center=[0, 0, 0])
        np.testing.assert_allclose(np.asarray(out.means), 2 * np.asarray(scene.means), atol=1e-5)


class TestCutouts:
    def test_ellipsoid(self, scene):
        cut = Cutout(mat=jnp.eye(4) / 1.0, type=CutoutType.ELLIPSOID)
        mask = cutout_kill_mask([cut], scene.means)
        r = np.linalg.norm(np.asarray(scene.means), axis=1)
        # Normal (non-inverted) cutout keeps inside, cuts outside.
        np.testing.assert_array_equal(np.asarray(mask), r > 1.0)

    def test_inverted_box(self, scene):
        m = jnp.eye(4)
        cut = Cutout(mat=m, type=CutoutType.BOX, invert=True)
        mask = cutout_kill_mask([cut], scene.means)
        inside = np.all(np.abs(np.asarray(scene.means)) <= 1.0, axis=1)
        np.testing.assert_array_equal(np.asarray(mask), inside)

    def test_render_with_cutout(self, scene, camera):
        cut = Cutout(mat=jnp.eye(4), type=CutoutType.ELLIPSOID)
        mask = cutout_kill_mask([cut], scene.means)
        img_cut = render(scene, camera, kill_mask=mask)
        img_full = render(scene, camera)
        assert float(img_cut[..., 3].sum()) < float(img_full[..., 3].sum())


class TestSHRotation:
    def test_rotation_consistency(self):
        # Shading rotated coefficients at d == shading originals at R^-1 d.
        rng = np.random.default_rng(3)
        sh = jnp.asarray(rng.normal(size=(8, 15, 3)).astype(np.float32))
        base = jnp.full((8, 3), 0.7)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        r = np.asarray(quat_to_rotation_matrix(jnp.asarray(q, jnp.float32)))
        d = rng.normal(size=(8, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        d = d.astype(np.float32)

        rotated = rotate_sh(sh, jnp.asarray(r))
        lhs = shade_sh(base, rotated, jnp.asarray(d), 3)
        rhs = shade_sh(base, sh, jnp.asarray(d @ r), 3)  # R^-1 d = d @ R
        np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=2e-4)

    def test_identity(self):
        rng = np.random.default_rng(4)
        sh = jnp.asarray(rng.normal(size=(4, 15, 3)).astype(np.float32))
        out = rotate_sh(sh, jnp.eye(3))
        np.testing.assert_allclose(np.asarray(out), np.asarray(sh), atol=1e-4)


class TestExport:
    def test_filter_deleted(self, scene):
        deleted = jnp.zeros((scene.num_splats,), bool).at[:123].set(True)
        out = export_gaussians(scene, deleted=deleted)
        assert out.num_splats == scene.num_splats - 123

    def test_bake_preserves_render(self, scene, camera):
        # Baking a transform into the cloud and un-transforming the camera
        # must give the same image (bar fp noise).
        angle = 0.5
        r = np.array(
            [
                [np.cos(angle), 0, np.sin(angle)],
                [0, 1, 0],
                [-np.sin(angle), 0, np.cos(angle)],
            ],
            np.float32,
        )
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = r
        baked = bake_transform(scene, m)
        # New camera: view' = view @ m gives identical view-space geometry.
        cam2 = dataclasses.replace(camera, view=camera.view @ jnp.asarray(m))
        img_ref = render(scene, cam2)
        img_baked = render(baked, camera)
        d = np.abs(np.asarray(img_ref) - np.asarray(img_baked))
        assert d.max() < 0.02  # SH rotation + fp accumulation tolerance

    def test_merge(self, scene):
        merged = merge_gaussians([scene, scene])
        assert merged.num_splats == 2 * scene.num_splats


class TestRoundTrip:
    def test_edit_export_reimport_render(self, scene, camera, tmp_path):
        """The reference's implicit end-to-end fixture (SURVEY §4.5): edits ->
        PLY export -> re-import through the full asset pipeline -> render,
        compared against rendering the edited cloud directly."""
        import dataclasses

        from unitygaussiansplatting_tpu.editing import (
            EditState, delete_selected, select_rect,
        )
        from unitygaussiansplatting_tpu.io.asset import decode_asset
        from unitygaussiansplatting_tpu.io.bridge import (
            gaussians_to_input_splats, input_splats_to_gaussians,
        )
        from unitygaussiansplatting_tpu.io.creator import create_asset
        from unitygaussiansplatting_tpu.io.ply import write_ply
        from unitygaussiansplatting_tpu.utils.image import psnr

        # Edit: select the left half and delete it.
        st = EditState.empty(scene.num_splats)
        st = select_rect(st, scene, camera, (0, 0), (80, 120))
        st = delete_selected(st)
        edited = export_gaussians(scene, deleted=st.deleted)
        assert edited.num_splats < scene.num_splats

        # Export -> reimport through the quantized asset pipeline (High
        # preset keeps quantization error below the image tolerance).
        ply_path = str(tmp_path / "edited.ply")
        write_ply(ply_path, gaussians_to_input_splats(edited))
        asset = create_asset(ply_path, quality="high")
        reimported = input_splats_to_gaussians(decode_asset(asset))

        img_direct = np.asarray(render(edited, camera))
        img_reimported = np.asarray(render(reimported, camera))
        assert psnr(img_direct[..., :3], img_reimported[..., :3]) > 40
