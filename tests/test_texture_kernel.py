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


def test_mismatched_shape_groups():
    """kd+ks share one shape, the normal map differs: two window grids.

    The second shape-group must sample in-kernel too (ModelConfig.win2,
    raster_pallas group-2 pass: synchronous window DMA, per-kind write
    gating) and stay bit-compatible with the XLA gather path.
    """
    cube = tr.Model.load_model(f"{BASE}/obj_loader_test/cube.obj")
    rng = np.random.default_rng(0)
    kd = rng.random((32, 256, 3)).astype(np.float32)
    ks = rng.random((32, 256, 3)).astype(np.float32)
    nm = (rng.random((32, 128, 3)).astype(np.float32) * 2 - 1)
    dt = np.dtype(np.float32, metadata={"tangent": False})
    for m in cube.materials.values():
        m.map_Kd = np.asarray(kd, dtype=dt)
        m.map_Ks = np.asarray(ks, dtype=dt)
        m.norm = np.asarray(nm, dtype=dt)
    cube.normal_map_is_tangent = False
    cube.bump_version()
    cam = tr.Camera((2, 2.5, 4), center=(0, 0, 0), fovy=60, near=0.01, far=50)
    s = tr.Scene(cam, tr.Light((3, 4, 2), ambient_strength=0.2),
                 resolution=(192, 192), system=tr.SYSTEM.LH,
                 subsystem=tr.SUBSYSTEM.OPENGL, backend="pallas")
    s.add_model(cube)
    cfg, _ = s._prepare()
    assert cfg.models[0].win2, "second shape-group grid not built"
    _compare(s, [("kd", "ks", "norm")])


def test_cube_kd_ks_windows():
    """Cube with same-shape diffuse + specular maps -> shared windows."""
    cube = tr.Model.load_model(f"{BASE}/obj_loader_test/cube.obj")
    cam = tr.Camera((2, 2.5, 4), center=(0, 0, 0), fovy=60, near=0.01, far=50)
    s = tr.Scene(cam, tr.Light((3, 4, 2), ambient_strength=0.2),
                 resolution=(192, 192), system=tr.SYSTEM.LH,
                 subsystem=tr.SUBSYSTEM.OPENGL, backend="pallas")
    s.add_model(cube)
    assert s._prepare()[0].models[0].win_grid, "grid layout expected"
    _compare(s, [("kd", "ks")])


def test_tiny_texture_samples_in_kernel():
    """Maps smaller than one (32, 128) window sample in-kernel under the
    shared-cell grid layout (cells zero-pad past the texture edge; wrapped
    texel coords land in exactly one cell) — the old per-face DMA layout
    required at least one full window and fell back to the XLA gather."""
    cube = tr.Model.load_model(f"{BASE}/obj_loader_test/cube.obj")
    rng = np.random.default_rng(1)
    kd = rng.random((8, 16, 3)).astype(np.float32)
    dt = np.dtype(np.float32, metadata={"tangent": False})
    for m in cube.materials.values():
        m.map_Kd = np.asarray(kd, dtype=dt)
        m.map_Ks = None
    cam = tr.Camera((2, 2.5, 4), center=(0, 0, 0), fovy=60, near=0.01,
                    far=50)
    s = tr.Scene(cam, tr.Light((3, 4, 2), ambient_strength=0.2),
                 resolution=(192, 192), system=tr.SYSTEM.LH,
                 subsystem=tr.SUBSYSTEM.OPENGL, backend="pallas")
    s.add_model(cube)
    cfg, _ = s._prepare()
    assert cfg.models[0].win_grid, "tiny texture should take the grid path"
    _compare(s, [("kd",)])


def test_dma_window_fallback_matches(monkeypatch):
    """The per-face DMA window layout (the fallback for textures past the
    shared-cell grid's 4096-texel/VMEM budget, forced here via
    TPU_RENDERER_WIN_GRID=0) must stay bit-compatible with both the XLA
    gather path and the default grid layout."""
    monkeypatch.setenv("TPU_RENDERER_WIN_GRID", "0")

    def build():
        cube = tr.Model.load_model(f"{BASE}/obj_loader_test/cube.obj")
        cam = tr.Camera((2, 2.5, 4), center=(0, 0, 0), fovy=60, near=0.01,
                        far=50)
        s = tr.Scene(cam, tr.Light((3, 4, 2), ambient_strength=0.2),
                     resolution=(192, 192), system=tr.SYSTEM.LH,
                     subsystem=tr.SUBSYSTEM.OPENGL, backend="pallas")
        s.add_model(cube)
        return s

    s = build()
    cfg, dyn = s._prepare()
    assert not cfg.models[0].win_grid, "env override ignored"
    f_dma = np.asarray(
        render_frame(dataclasses.replace(cfg, tex_kernel=True), dyn)[0])
    _compare(s, [("kd", "ks")])          # DMA layout vs XLA gather

    monkeypatch.setenv("TPU_RENDERER_WIN_GRID", "1")
    s2 = build()
    cfg2, dyn2 = s2._prepare()
    assert cfg2.models[0].win_grid
    f_grid = np.asarray(
        render_frame(dataclasses.replace(cfg2, tex_kernel=True), dyn2)[0])
    np.testing.assert_array_equal(f_dma, f_grid)


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


def test_mixed_window_layouts_keep_sampler(monkeypatch):
    """One model past the grid budget must NOT demote the whole scene to the
    XLA gather path: grid-layout models keep the in-kernel sampler while the
    oversized one gathers (pipeline.sampler_excluded_models). The mixed
    frame must stay bit-compatible with the all-gather frame."""
    from tpu_renderer.models import scene as scene_mod
    from tpu_renderer.models.gizmos import make_cube, make_floor
    from tpu_renderer.ops.pipeline import sampler_excluded_models

    # Budget between the cube's small grid (a few cells) and the floor's
    # 512^2 texture grid (64 cells ~ 0.5 MB): the floor falls back to the
    # per-face DMA layout -> mixed-layout scene.
    monkeypatch.setattr(scene_mod, "_GRID_BUDGET", 100_000)

    cube = make_cube(1.0)
    rng = np.random.default_rng(5)
    dt = np.dtype(np.float32, metadata={"tangent": False})
    for m in cube.materials.values():
        m.map_Kd = np.asarray(rng.random((32, 256, 3)), dtype=dt)
    cube.bump_version()
    floor = make_floor(2.0, y=-0.6)
    floor.textures.register("diffuse", f"{BASE}/floor_diffuse.tga",
                            normalize=False)
    cam = tr.Camera((2, 2.5, 4), center=(0, 0, 0), fovy=60, near=0.01,
                    far=50)
    s = tr.Scene(cam, tr.Light((3, 4, 2), ambient_strength=0.2),
                 resolution=(192, 192), system=tr.SYSTEM.LH,
                 subsystem=tr.SUBSYSTEM.OPENGL, backend="pallas")
    s.add_model(cube)
    s.add_model(floor)

    cfg, dyn = s._prepare()
    assert cfg.models[0].win_grid, "cube should keep the grid layout"
    assert cfg.models[1].win_kinds and not cfg.models[1].win_grid, \
        "floor should have fallen back to the DMA layout"
    assert sampler_excluded_models(cfg.models) == frozenset({1})
    assert "windows_all" in dyn, "grid models' window table must survive"
    _compare(s, [("kd",), ("kd",)])
