"""Instancing: Model.concat merged geometry + multi-model texture dedup.

The reference has no instancing — each of its models re-runs the full
Python pipeline (core.py:592-614). Here instancing is first-class:
``Model.concat`` merges transformed copies into one mesh (one vertex-stage
matmul on the MXU, one silhouette reduction), and naive multi-model scenes
share one texture atlas + window-grid block on device via Scene's packing
cache (scene.py::_pack_model / _windows_all). Both paths must render
identically.
"""
import os

import numpy as np
import pytest

import tpu_renderer as tr

DIABLO_DIR = "/root/reference/obj/diablo3_pose"
RES = (96, 96)


def _diablo(textured=True):
    m = tr.Model.load_model(os.path.join(DIABLO_DIR, "diablo3_pose.obj"))
    if textured:
        m.textures.register(
            "diffuse", os.path.join(DIABLO_DIR, "diablo3_pose_diffuse.tga"),
            normalize=False)
    return m


def _scene():
    light = tr.Light((5, 5, 0), light_type=tr.Lightning.POINT_LIGHTNING,
                     center=(0, 0.5, 0.5), ambient_strength=0.1,
                     specular_strength=0.1, linear=1e-9, quadratic=1e-10)
    camera = tr.Camera((0.5, 3, 6), center=(0, 0, 0), fovy=90, near=0.0001,
                       far=400, backface_culling=False)
    return tr.Scene(camera, light, shadows=True, resolution=RES,
                    system=tr.SYSTEM.LH, subsystem=tr.SUBSYSTEM.OPENGL)


def _instances(base, n=3):
    return [base @ tr.rotate([0, 40 * i, 0])
            @ tr.translation([1.6 * (i - (n - 1) / 2), 0, 0])
            for i in range(n)]


def test_concat_matches_multi_model():
    """Merged Model.concat geometry renders EXACTLY like the same instances
    added as separate scene models (face order, gids, depth ties, shadow
    silhouettes all line up)."""
    base = _diablo()
    insts = _instances(base)

    s_multi = _scene()
    for m in insts:
        s_multi.add_model(m)
    f_multi = s_multi.render()

    s_merged = _scene()
    s_merged.add_model(tr.Model.concat(insts))
    f_merged = s_merged.render()

    assert f_merged.shape == f_multi.shape
    np.testing.assert_array_equal(f_merged, f_multi)


def test_multi_model_window_dedup():
    """Instanced copies of one textured mesh share ONE window block: the
    scene-wide table does not grow with instance count and every instance's
    ModelConfig points at the shared offset."""
    base = _diablo()
    s1 = _scene()
    s1.add_model(base)
    cfg1, dyn1 = s1._prepare()

    s3 = _scene()
    for m in _instances(base):
        s3.add_model(m)
    cfg3, dyn3 = s3._prepare()

    assert [mc.win_offset for mc in cfg3.models] == [0, 0, 0]
    assert dyn3["windows_all"].shape == dyn1["windows_all"].shape
    # Texture atlas shared by identity across the packed models.
    stacks = {id(md["kd_stack"]) for md in dyn3["models"]}
    assert len(stacks) == 1


def test_concat_requires_shared_assets():
    base = _diablo(textured=False)
    other = _diablo(textured=False)   # separate load: different objects
    with pytest.raises(ValueError):
        tr.Model.concat([base, other])


def test_concat_offsets_vertices_only():
    base = _diablo(textured=False)
    insts = [base @ tr.translation([i, 0, 0]) for i in range(3)]
    m = tr.Model.concat(insts)
    nv = len(base.vertices)
    fa = m.face_array
    assert m.num_faces == 3 * base.num_faces
    assert (fa[: base.num_faces * 1, :, 0] == base.face_array[:, :, 0]).all()
    assert (fa[base.num_faces: 2 * base.num_faces, :, 0]
            == base.face_array[:, :, 0] + nv).all()
    # uv / normal / material index columns untouched.
    np.testing.assert_array_equal(fa[:, :, 1:],
                                  np.tile(base.face_array[:, :, 1:], (3, 1, 1)))


def test_sampler_cap_gate():
    """Past SMEM_FACE_CAP the pipeline must fall back to the XLA gather
    (sampler off) instead of tripping the kernel's SMEM assert."""
    from tpu_renderer.ops import raster_pallas as rp
    # The gate compares the padded face-batch length against the cap; this
    # pins the configured cap itself (raised from the round-3 value of
    # 32768 after measuring real SMEM headroom on v5e).
    assert rp.SMEM_FACE_CAP >= 131072
