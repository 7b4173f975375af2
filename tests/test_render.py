

def test_viewer_session_reuses_identical_frames():
    import dataclasses

    import numpy as np

    from unitygaussiansplatting_tpu.models.camera import Camera
    from unitygaussiansplatting_tpu.models.viewer import ViewerSession
    from unitygaussiansplatting_tpu.utils.config import RasterizeConfig, RenderSettings
    from unitygaussiansplatting_tpu.utils.synthetic import sphere_scene

    g = sphere_scene(n=400, seed=0).activate()
    cam = Camera.look_at(
        eye=[0, 0.5, -3.0], target=[0, 0, 0], up=[0, 1, 0],
        fov_y_deg=45.0, width=128, height=64,
    )
    sess = ViewerSession(
        g, cam, RenderSettings(sh_order=1),
        RasterizeConfig(tile_h=8, chunk_size=32), backend="jax",
    )
    a = sess.frame()
    b = sess.frame()  # identical pose: cache hit, same object back
    assert b is a
    cam2 = Camera.look_at(
        eye=[0.3, 0.5, -3.0], target=[0, 0, 0], up=[0, 1, 0],
        fov_y_deg=45.0, width=128, height=64,
    )
    c = sess.frame(view=cam2.view)  # moved: fresh render, different image
    assert c is not a
    assert float(abs(np.asarray(c) - np.asarray(a)).max()) > 1e-4
    d = sess.frame(view=cam2.view, opacity_scale=2.0)  # settings delta
    assert d is not c
    assert sess.stats.frames == 4 and sess.stats.reused == 1
    sess.update_gaussians(g)
    e = sess.frame(view=cam2.view, opacity_scale=2.0)
    assert e is not d  # cache invalidated by the scene swap
