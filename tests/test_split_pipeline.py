"""The split pipeline (multi-chunk scenes): phase-1 z-interval prune.

Scenes past FACE_CHUNK faces rasterize visibility first, prune the
G-buffer pass's bins to faces that could have won pixels
(raster_pallas.phase1_keep), and interpolate against the winner ids as an
input block (visibility_gbuffer_pallas(tid_in=...)). The frame must stay
bit-identical to the fused two-phase kernel and the XLA oracle — the
prune may only ever drop faces that won nothing.
"""
import dataclasses
import os

import numpy as np
import pytest

import tpu_renderer as tr
from tpu_renderer.models.gizmos import make_floor, make_sphere
from tpu_renderer.ops.pipeline import render_frame


@pytest.fixture(scope="module")
def scene():
    # Two overlapping spheres + textured floor: real overdraw (back sphere
    # mostly occluded) so the prune actually fires, ~600 faces -> 5 chunks
    # at the shrunken FACE_CHUNK.
    s1 = make_sphere(10, 14)
    s1.shadowing = True
    s2 = make_sphere(10, 14) @ tr.scale(0.9) @ tr.translation([0.3, 0.1, -0.8])
    floor = make_floor(3.0, y=-1.1)
    floor.textures.register("diffuse",
                            "/root/reference/obj/floor_diffuse.tga",
                            normalize=False)
    s = tr.Scene(tr.Camera((2, 2.5, 4), center=(0, 0, 0), fovy=60,
                           near=0.01, far=50),
                 tr.Light((3, 4, 2), light_type=tr.Lightning.POINT_LIGHTNING,
                          ambient_strength=0.1),
                 shadows=True, resolution=(64, 128), system=tr.SYSTEM.RH,
                 subsystem=tr.SUBSYSTEM.OPENGL)
    s.add_model(s1)
    s.add_model(s2)
    s.add_model(floor)
    return s


def test_split_matches_fused_and_xla(scene, monkeypatch):
    from tpu_renderer.ops import raster_pallas as rp

    monkeypatch.setattr(rp, "FACE_CHUNK", 128)
    cfg, dyn = scene._prepare()
    faces = sum(m.num_faces for m in scene.models)
    assert faces > 128, "scene must span multiple chunks"
    cfg_p = dataclasses.replace(cfg, backend="pallas", pallas_interpret=True,
                                tex_kernel=True)

    monkeypatch.setenv("TPU_RENDERER_SPLIT", "2")   # force: the
    # fixture camera culls backfaces, and the adaptive default
    # (pipeline._split_use) fuses culled scenes
    f_split = np.asarray(render_frame(cfg_p, dyn)[0])
    monkeypatch.setenv("TPU_RENDERER_SPLIT", "0")
    f_fused = np.asarray(render_frame(cfg_p, dyn)[0])
    f_xla = np.asarray(render_frame(cfg, dyn)[0])

    # The essential claim: the prune+split path is BIT-IDENTICAL to the
    # fused two-phase kernel. The XLA comparison allows the usual f32
    # silhouette-edge deviation (spheres at 64x128 have many edge pixels).
    np.testing.assert_array_equal(f_split, f_fused)
    assert ((f_split == f_xla).all(axis=-1)).mean() >= 0.995


@pytest.mark.parametrize("shader", ["gouraud"])
def test_split_slim_matches_fused(scene, monkeypatch, shader):
    """The slim-layout (flat/gouraud/pbr) kernels take the same split+prune
    path on multi-chunk scenes; frames must stay bit-identical."""
    from tpu_renderer.ops import raster_pallas as rp

    monkeypatch.setattr(rp, "FACE_CHUNK", 128)
    cfg, dyn = scene._prepare()
    cfg_p = dataclasses.replace(cfg, backend="pallas", pallas_interpret=True,
                                shader=shader)
    monkeypatch.setenv("TPU_RENDERER_SPLIT", "2")   # force: the
    # fixture camera culls backfaces, and the adaptive default
    # (pipeline._split_use) fuses culled scenes
    f_split = np.asarray(render_frame(cfg_p, dyn)[0])
    monkeypatch.setenv("TPU_RENDERER_SPLIT", "0")
    f_fused = np.asarray(render_frame(cfg_p, dyn)[0])
    np.testing.assert_array_equal(f_split, f_fused)


def test_phase1_keep_never_drops_winners(monkeypatch):
    """Every face id present in the final tid plane survives the prune, and
    on a scene with a fully-occluded sphere the prune actually fires.

    The frame must be several (16, 128) prune cells tall/wide for the
    z-interval test to have local resolution (at 64x128 one dilated cell
    covers everything and nothing can prune)."""
    import numpy as _np

    from tpu_renderer.ops import raster_pallas as rp
    from tpu_renderer.ops.pipeline import _build_face_batch, _cam_matrices

    front = make_sphere(10, 14)
    cam_pos = _np.array([2.0, 2.5, 4.0])
    back_pos = -0.45 * cam_pos          # on the view ray, behind the front
    back = (make_sphere(10, 14) @ tr.scale(0.5)
            @ tr.translation(list(back_pos)))
    scene = tr.Scene(tr.Camera(tuple(cam_pos), center=(0, 0, 0), fovy=60,
                               near=0.01, far=50),
                     tr.Light((3, 4, 2), ambient_strength=0.1),
                     resolution=(256, 256), system=tr.SYSTEM.RH,
                     subsystem=tr.SUBSYSTEM.OPENGL)
    scene.add_model(front)
    scene.add_model(back)

    monkeypatch.setattr(rp, "FACE_CHUNK", 128)
    cfg, dyn = scene._prepare()
    cam_m = _cam_matrices(cfg, dyn["camera"], cfg.cam_projection_type)
    faces, _ = _build_face_batch(cfg, dyn, cam_m, None)
    h, w = cfg.resolution
    bins = rp.face_bins(faces, h, w)
    zb_sign, tid = rp.visibility_pallas(faces, h, w, cfg.system,
                                        interpret=True, bins=bins[:2])
    keep = np.asarray(rp.phase1_keep(faces, zb_sign, h, w, cfg.system))
    winners = np.unique(np.asarray(tid))
    winners = winners[winners >= 0]
    assert keep[winners].all(), "prune dropped a winning face"
    # And it actually prunes something on this occluded scene.
    valid = np.asarray(faces["valid"])
    assert (~keep & valid).sum() > 0, "prune never fired"
