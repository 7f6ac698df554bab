"""Pallas kernels vs the XLA path, via the interpreter on CPU.

On TPU the Pallas backend is bit-compared against the XLA path in the round
logs; here the same comparison runs without hardware through
``interpret=True`` on a tiny scene, so CI exercises the kernel code.
"""
import dataclasses

import numpy as np
import pytest

import tpu_renderer as tr
from tpu_renderer.models.gizmos import make_cube, make_floor
from tpu_renderer.ops.pipeline import render_frame_jit


@pytest.fixture(scope="module")
def scene():
    cube = make_cube(1.0)
    cube.shadowing = True
    floor = make_floor(2.0, y=-0.6)
    floor.textures.register("diffuse", "/root/reference/obj/floor_diffuse.tga",
                            normalize=False)
    s = tr.Scene(tr.Camera((2, 2.5, 4), center=(0, 0, 0), fovy=60, near=0.01,
                           far=50, backface_culling=True),
                 tr.Light((3, 4, 2), light_type=tr.Lightning.POINT_LIGHTNING,
                          ambient_strength=0.1),
                 shadows=True, resolution=(64, 128), system=tr.SYSTEM.RH,
                 subsystem=tr.SUBSYSTEM.OPENGL)
    s.add_model(cube)
    s.add_model(floor)
    return s


def test_pallas_interpret_matches_xla(scene):
    cfg, dyn = scene._prepare()
    assert cfg.backend == "xla"  # CPU default
    xla_out = render_frame_jit(cfg, dyn)

    cfg_p = dataclasses.replace(cfg, backend="pallas", pallas_interpret=True)
    pallas_out = render_frame_jit(cfg_p, dyn)

    frame_x, zb_x, tid_x, st_x = map(np.asarray, xla_out)
    frame_p, zb_p, tid_p, st_p = map(np.asarray, pallas_out)

    assert (tid_x == tid_p).mean() >= 0.999
    np.testing.assert_array_equal(st_x, st_p)
    same = (frame_x == frame_p).all(axis=-1)
    assert same.mean() >= 0.999, same.mean()


@pytest.mark.parametrize("shader", ["flat", "gouraud", "pbr"])
def test_pallas_interpret_slim_shaders(scene, shader):
    """Slim G-buffer kernel path (flat/gouraud/pbr interpolate their 3-11
    channels in-kernel, raster_pallas._SLIM_CHANNELS) vs the XLA gather
    path."""
    cfg, dyn = scene._prepare()
    cfg_g = dataclasses.replace(cfg, shader=shader)
    xla_out = render_frame_jit(cfg_g, dyn)
    cfg_p = dataclasses.replace(cfg_g, backend="pallas", pallas_interpret=True)
    pallas_out = render_frame_jit(cfg_p, dyn)
    fx, fp = np.asarray(xla_out[0]), np.asarray(pallas_out[0])
    assert ((fx == fp).all(axis=-1)).mean() >= 0.999


def test_pallas_chunked_faces_matches_xla(scene, monkeypatch):
    """Force multi-chunk face streaming (FACE_CHUNK shrunk) — the large-mesh
    VMEM path — and compare against the XLA backend."""
    from tpu_renderer.ops import raster_pallas as rp

    monkeypatch.setattr(rp, "FACE_CHUNK", 128)
    cfg, dyn = scene._prepare()
    xla_out = render_frame_jit(cfg, dyn)
    cfg_p = dataclasses.replace(cfg, backend="pallas", pallas_interpret=True)
    pallas_out = render_frame_jit(cfg_p, dyn)
    fx, fp = np.asarray(xla_out[0]), np.asarray(pallas_out[0])
    stx, stp = np.asarray(xla_out[3]), np.asarray(pallas_out[3])
    np.testing.assert_array_equal(stx, stp)
    assert ((fx == fp).all(axis=-1)).mean() >= 0.999


def test_visibility_want_tid_false(scene):
    """want_tid=False (tris-sharded pass 1, pipeline.py): the z-buffer is
    bit-identical to the full kernel's while the tid plane — ~1/3 of each
    visit's stores — is never written (returns None)."""
    import jax.numpy as jnp

    from tpu_renderer.ops.pipeline import _build_face_batch, _cam_matrices
    from tpu_renderer.ops.raster_pallas import face_bins, visibility_pallas

    cfg, dyn = scene._prepare()
    cam_m = _cam_matrices(cfg, dyn["camera"], cfg.cam_projection_type)
    faces, _ = _build_face_batch(cfg, dyn, cam_m, None)
    h, w = cfg.resolution
    bins = face_bins(faces, h, w)
    zb_full, tid = visibility_pallas(faces, h, w, cfg.system, interpret=True,
                                     bins=bins[:2])
    zb_only, no_tid = visibility_pallas(faces, h, w, cfg.system,
                                        interpret=True, bins=bins[:2],
                                        want_tid=False)
    assert no_tid is None
    assert tid is not None and np.asarray(tid).max() >= 0
    np.testing.assert_array_equal(np.asarray(zb_full), np.asarray(zb_only))


def test_pallas_odd_resolution_matches_xla():
    """Frame heights that are not slab multiples (raster_pallas._tile_h
    rounds the per-frame tile height up to 16): outputs must slice back to
    the exact resolution and stay identical to the XLA path."""
    cube = make_cube(1.0)
    s = tr.Scene(tr.Camera((2, 2.5, 4), center=(0, 0, 0), fovy=60,
                           near=0.01, far=50),
                 tr.Light((3, 4, 2), ambient_strength=0.2),
                 resolution=(100, 104), system=tr.SYSTEM.LH,
                 subsystem=tr.SUBSYSTEM.OPENGL)
    s.add_model(cube)
    cfg, dyn = s._prepare()
    xla_out = render_frame_jit(cfg, dyn)
    cfg_p = dataclasses.replace(cfg, backend="pallas", pallas_interpret=True)
    pallas_out = render_frame_jit(cfg_p, dyn)
    fx, fp = np.asarray(xla_out[0]), np.asarray(pallas_out[0])
    assert fx.shape == (100, 104, 3)
    np.testing.assert_array_equal(fx, fp)
