"""In-process scene-construction API (hydra_api analog, SURVEY.md §2.11).

Builds a Cornell-like box purely from numpy data — no XML authoring — then
commits and renders it through the exact same pipeline as the CLI.
"""
import numpy as np

from hydracore3_tpu import api as HR


def _quad(p0, p1, p2, p3):
    return np.array([p0, p1, p2, p3], np.float32), np.array(
        [0, 1, 2, 0, 2, 3], np.uint32)


def _build_box(ctx):
    white = ctx.material_create(name='white', diffuse_color=(0.5, 0.5, 0.5))
    red = ctx.material_create(name='red', diffuse_color=(0.5, 0.0, 0.0))
    green = ctx.material_create(name='green', diffuse_color=(0.0, 0.5, 0.0))

    s = 4.0
    # floor (+Y normal), ceiling, back wall, left (red), right (green)
    quads = [
        (((-s, -s, -s), (-s, -s, s), (s, -s, s), (s, -s, -s)), white),
        (((-s, s, -s), (s, s, -s), (s, s, s), (-s, s, s)), white),
        (((-s, -s, -s), (s, -s, -s), (s, s, -s), (-s, s, -s)), white),
        (((-s, -s, -s), (-s, s, -s), (-s, s, s), (-s, -s, s)), red),
        (((s, -s, -s), (s, -s, s), (s, s, s), (s, s, -s)), green),
    ]
    for pts, mat in quads:
        pos, ind = _quad(*pts)
        mid = ctx.mesh_from_data(pos, ind, mat_indices=[mat, mat])
        ctx.instance_add(mid)

    lmat = np.eye(4, dtype=np.float32)
    lmat[1, 3] = s - 0.05  # just under the ceiling
    ctx.light_area(name='top', color=(1.0, 1.0, 1.0), multiplier=12.0,
                   half_width=1.0, half_length=1.0, matrix=lmat)
    # camera inside the box so the side walls reach the image borders
    ctx.camera_set(pos=(0.0, 0.0, 6.0), look_at=(0.0, 0.0, 0.0),
                   up=(0.0, 1.0, 0.0), fov=45.0)
    ctx.settings_set(width=64, height=48, depth=4, spp=8)


def test_commit_builds_scene(tmp_path):
    ctx = HR.hr2_create_scene()
    _build_box(ctx)
    scene, meta = ctx.commit(str(tmp_path / 'lib'))
    # 5 quads x 2 tris + auto light mesh 2 tris
    assert meta.num_tris == 12
    assert meta.num_lights == 1
    assert meta.width == 64 and meta.height == 48


def test_commit_and_render(tmp_path):
    ctx = HR.hr2_create_scene()
    _build_box(ctx)
    img = np.asarray(ctx.commit_and_render(spp=8, out_dir=str(tmp_path / 'lib')))
    assert img.shape == (48, 64, 4)
    assert np.isfinite(img).all()
    mid = img[10:38, 10:54, :3]
    assert mid.mean() > 0.01, 'scene should be lit by the area light'
    # red wall on the left, green on the right
    left = img[16:32, 2:8]
    right = img[16:32, 56:62]
    assert left[..., 0].mean() > left[..., 1].mean() * 1.5
    assert right[..., 1].mean() > right[..., 0].mean() * 1.5
