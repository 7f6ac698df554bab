"""Per-triangle Face view vs the reference's Face (core.py:108-228)."""
import os
from itertools import islice

import numpy as np

from tpu_renderer.models.model import Model

DIABLO = "/root/reference/obj/diablo3_pose/diablo3_pose.obj"
RNG = np.random.default_rng(3)


def _pair(reference, textured=True):
    ours = Model.load_model(DIABLO)
    ref = reference.core.Model.load_model(DIABLO)
    if textured:
        base = os.path.dirname(DIABLO)
        for m in (ours, ref):
            m.textures.register(
                "normals", os.path.join(base, "diablo3_pose_nm_tangent.tga"),
                tangent=True)
            m.textures.register(
                "diffuse", os.path.join(base, "diablo3_pose_diffuse.tga"),
                normalize=False)
    return ours, ref


def _bar(n=6):
    b = RNG.uniform(0.05, 1, size=(n, 3))
    return b / b.sum(axis=1, keepdims=True)


def test_face_normals_and_perspective(reference):
    ours, ref = _pair(reference, textured=False)
    for fo, fr in islice(zip(ours.faces, ref.faces), 25):
        np.testing.assert_allclose(fo.unit_normal_world_space,
                                   fr.unit_normal_world_space, atol=1e-6)
        np.testing.assert_allclose(fo.unit_normal_current_space,
                                   fr.unit_normal_current_space, atol=1e-6)
        bar = _bar()
        # Fake a perspective divide: stash 1/w in the W column like
        # triangular.py:42-45 does before shading.
        fo.vertices = fo.vertices.copy()
        fr.vertices = fr.vertices.copy()
        inv_w = RNG.uniform(0.5, 2.0, size=3)
        fo.vertices[:, 3] = inv_w
        fr.vertices[:, 3] = inv_w
        np.testing.assert_allclose(fo.screen_perspective(bar),
                                   fr.screen_perspective(bar), atol=1e-6)


def test_face_texture_fetches(reference):
    ours, ref = _pair(reference)
    for fo, fr in islice(zip(ours.faces, ref.faces), 25):
        bar = _bar()
        np.testing.assert_array_equal(
            fo.get_UV((64, 64), bar), fr.get_UV((64, 64), bar))
        np.testing.assert_allclose(fo.get_object_color(bar),
                                   fr.get_object_color(bar), atol=1e-6)
        np.testing.assert_allclose(np.asarray(fo.get_specular(bar), float),
                                   np.asarray(fr.get_specular(bar), float),
                                   atol=1e-6)


def test_face_normal_mapping(reference):
    ours, ref = _pair(reference)
    for fo, fr in islice(zip(ours.faces, ref.faces), 25):
        bar = _bar()
        np.testing.assert_allclose(fo.tangent_(bar), fr.tangent_(bar),
                                   atol=1e-5)
        np.testing.assert_allclose(fo.get_normals(bar), fr.get_normals(bar),
                                   atol=1e-5)


def test_face_normal_fallbacks(reference):
    ours, ref = _pair(reference, textured=False)
    fo = next(iter(ours.faces))
    fr = next(iter(ref.faces))
    bar = _bar()
    # Vertex-normal interpolation path (no normal map registered).
    np.testing.assert_allclose(fo.get_normals(bar), fr.get_normals(bar),
                               atol=1e-6)
    # Face-normal fallback (no vertex normals at all).
    ours.normals = None
    ref.normals = None
    fo2 = next(iter(ours.faces))
    fr2 = next(iter(ref.faces))
    np.testing.assert_allclose(fo2.get_normals(bar), fr2.get_normals(bar),
                               atol=1e-6)


def test_linearize_z(reference):
    class Cam:
        near, far = 0.1, 100.0

    from tpu_renderer.models.face import Face
    depth = RNG.uniform(-1, 1, size=10)
    np.testing.assert_allclose(
        Face.linearize_z(depth, Cam),
        reference.core.Face.linearize_z(depth, Cam), atol=1e-9)
