"""Multi-chip sharding tests on the virtual 8-device CPU mesh (conftest)."""
import numpy as np
import pytest

import jax

import tpu_renderer as tr
from tpu_renderer.models.gizmos import make_cube, make_floor
from tpu_renderer.parallel.mesh import make_render_mesh
from tpu_renderer.parallel.sharded import render_frame_sharded
from tpu_renderer.ops.pipeline import render_frame_jit


def _scene(resolution=(64, 64)):
    cube = make_cube(1.0)
    cube.shadowing = True          # gizmo factories default to non-casting
    floor = make_floor(2.0, y=-0.6)
    floor.textures.register("diffuse", "/root/reference/obj/floor_diffuse.tga",
                            normalize=False)
    light = tr.Light((3, 4, 2), light_type=tr.Lightning.POINT_LIGHTNING,
                     ambient_strength=0.1, specular_strength=0.3)
    cam = tr.Camera((2, 2.5, 4), center=(0, 0, 0), fovy=60, near=0.01, far=50,
                    backface_culling=True)
    scene = tr.Scene(cam, light, shadows=True, resolution=resolution,
                     system=tr.SYSTEM.RH, subsystem=tr.SUBSYSTEM.OPENGL)
    scene.add_model(cube)
    scene.add_model(floor)
    return scene


def _cfg_dyn(scene):
    cfg, dyn = scene._prepare()
    return cfg, dyn


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_matches_single_chip(shape):
    n_rows, n_tris = shape
    assert len(jax.devices()) >= n_rows * n_tris
    scene = _scene()
    cfg, dyn = _cfg_dyn(scene)

    single, zb1, tid1, st1 = render_frame_jit(cfg, dyn)
    mesh = make_render_mesh(jax.devices()[:n_rows * n_tris], n_tris=n_tris)
    sharded, zb2, tid2, st2 = render_frame_sharded(cfg, dyn, mesh)

    single = np.asarray(single)
    sharded = np.asarray(sharded)
    # Equal-z claims may tie-break differently across the tris axis; require
    # pixel-exact agreement on >= 99.9% and tiny diffs elsewhere.
    same = (single == sharded).all(axis=-1)
    assert same.mean() >= 0.999, f"only {same.mean():.4f} identical"
    np.testing.assert_array_equal(np.asarray(st1), np.asarray(st2))
    np.testing.assert_allclose(np.asarray(zb1), np.asarray(zb2), rtol=1e-6)


def test_stencil_content_nontrivial():
    scene = _scene()
    cfg, dyn = _cfg_dyn(scene)
    _, _, _, st = render_frame_jit(cfg, dyn)
    st = np.asarray(st)
    assert (st != 0).any(), "shadow stencil should mark some pixels"
