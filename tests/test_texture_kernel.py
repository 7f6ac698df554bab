"""Windowed in-kernel texture sampler vs the XLA gather path.

The sampler (ops/raster_pallas.sample_textures_pallas) must be bit-compatible
with the per-pixel gather in pipeline._shade_gbuffer: same iu/iv, same
reference get_UV indexing (core.py:138-143), texels sliced from the same
packed stacks. Runs in Pallas interpret mode on the CPU mesh.
"""
import dataclasses

import numpy as np
import pytest

import tpu_renderer as tr
from tpu_renderer.ops.pipeline import render_frame

BASE = "/root/reference/obj"


def _compare(scene, expect_kinds):
    cfg, dyn = scene._prepare()
    got_kinds = [mc.win_kinds for mc in cfg.models]
    assert got_kinds == expect_kinds, got_kinds
    f_on = np.asarray(
        render_frame(dataclasses.replace(cfg, tex_kernel=True), dyn)[0])
    f_off = np.asarray(
        render_frame(dataclasses.replace(cfg, tex_kernel=False), dyn)[0])
    same = (f_on == f_off).all(axis=-1).mean()
    assert same >= 0.9999, f"only {same:.2%} identical pixels"
    assert f_on.max() > 0


def test_cube_kd_ks_windows():
    """Cube with same-shape diffuse + specular maps -> shared windows."""
    cube = tr.Model.load_model(f"{BASE}/obj_loader_test/cube.obj")
    cam = tr.Camera((2, 2.5, 4), center=(0, 0, 0), fovy=60, near=0.01, far=50)
    s = tr.Scene(cam, tr.Light((3, 4, 2), ambient_strength=0.2),
                 resolution=(192, 192), system=tr.SYSTEM.LH,
                 subsystem=tr.SUBSYSTEM.OPENGL, backend="pallas")
    s.add_model(cube)
    _compare(s, [("kd", "ks")])


@pytest.mark.slow
def test_diablo_textured_shadowed_windows():
    """Flagship structure: diablo kd+norm (tangent), floor kd, shadows."""
    from tpu_renderer.models.gizmos import make_floor

    d = tr.Model.load_model(f"{BASE}/diablo3_pose/diablo3_pose.obj")
    d.textures.register("diffuse",
                        f"{BASE}/diablo3_pose/diablo3_pose_diffuse.tga",
                        normalize=False)
    d.textures.register("normals",
                        f"{BASE}/diablo3_pose/diablo3_pose_nm_tangent.tga",
                        tangent=True)
    floor = make_floor(2.0, y=-1.0)
    floor.textures.register("diffuse", f"{BASE}/floor_diffuse.tga",
                            normalize=False)
    cam = tr.Camera((0.5, 3, 5), center=(0, 0, 0), fovy=90, near=1e-4,
                    far=400)
    light = tr.Light((5, 5, 0), light_type=tr.Lightning.POINT_LIGHTNING,
                     center=(0, 0.5, 0.5), ambient_strength=0.1,
                     specular_strength=0.1, linear=1e-9, quadratic=1e-10)
    s = tr.Scene(cam, light, shadows=True, resolution=(160, 160),
                 system=tr.SYSTEM.LH, subsystem=tr.SUBSYSTEM.OPENGL,
                 backend="pallas")
    s.add_model(d)
    s.add_model(floor)
    _compare(s, [("kd", "norm"), ("kd",)])
