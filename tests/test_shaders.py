"""Alternate shaders: flat, gouraud, PBR (GGX helpers), wireframe, points."""
import numpy as np
import pytest

import jax.numpy as jnp

import tpu_renderer as tr
from tpu_renderer.models.gizmos import make_cube, make_floor
from tpu_renderer.ops import shading as sh

RNG = np.random.default_rng(11)


def _scene(shader):
    cube = make_cube(1.0)
    floor = make_floor(2.0, y=-0.6)
    scene = tr.Scene(tr.Camera((2, 2.5, 4), center=(0, 0, 0), fovy=60,
                               near=0.01, far=50, backface_culling=True),
                     tr.Light((3, 4, 2), ambient_strength=0.1),
                     resolution=(96, 96), system=tr.SYSTEM.RH,
                     subsystem=tr.SUBSYSTEM.OPENGL, shader=shader)
    scene.add_model(cube)
    scene.add_model(floor)
    return scene


@pytest.mark.parametrize("shader", ["general", "flat", "gouraud", "pbr",
                                    "wireframe", "points"])
def test_shader_renders(shader):
    frame = _scene(shader).render()
    assert frame.shape == (96, 96, 3)
    assert frame.std() > 0  # something was drawn


def test_shaders_differ():
    # flat and gouraud both write 255-scale intensities (the reference's
    # quantization quirk) and saturate identically — compare the others.
    frames = {s: _scene(s).render() for s in ("general", "flat", "pbr",
                                              "wireframe")}
    names = list(frames)
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            assert (frames[a] != frames[b]).any(), (a, b)


def test_ggx_helpers_match_reference(reference):
    N = RNG.normal(size=(20, 3)); N /= np.linalg.norm(N, axis=1, keepdims=True)
    V = RNG.normal(size=(20, 3)); V /= np.linalg.norm(V, axis=1, keepdims=True)
    L = RNG.normal(size=(20, 3)); L /= np.linalg.norm(L, axis=1, keepdims=True)
    H = (V + L) / np.linalg.norm(V + L, axis=1, keepdims=True)
    rough = 0.37
    np.testing.assert_allclose(
        np.asarray(sh.distribution_ggx(jnp.asarray(N), jnp.asarray(H), rough)),
        reference.triangular.DistributionGGX(N, H, rough), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(sh.geometry_smith(jnp.asarray(N), jnp.asarray(V),
                                     jnp.asarray(L), rough)),
        reference.triangular.GeometrySmith(N, V, L, rough), rtol=1e-4)
    cos_t = np.clip((H * V).sum(1), 0, None)
    F0 = np.array([0.04, 0.04, 0.04])
    np.testing.assert_allclose(
        np.asarray(sh.fresnel_schlick(jnp.asarray(cos_t), jnp.asarray(F0))),
        reference.triangular.fresnelSchlick(cos_t, F0), rtol=1e-5)


def test_smoothstep_and_mix_match_reference(reference):
    x = RNG.uniform(-1, 2, size=50)
    np.testing.assert_allclose(
        np.asarray(sh.smoothstep(0.2, 0.8, jnp.asarray(x))),
        reference.core.Light.smoothstep(0.2, 0.8, x), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(sh.mix(1.0, 3.0, 0.25)),
        reference.triangular.mix(1.0, 3.0, 0.25))


def test_supersampling_smooths_edges():
    base = _scene("general")
    frame1 = base.render()
    ss = _scene("general")
    ss.supersample = 2
    frame2 = ss.render()
    assert frame2.shape == frame1.shape
    # SSAA produces intermediate values on silhouette edges: strictly more
    # unique colors than the aliased render.
    u1 = len(np.unique(frame1.reshape(-1, 3), axis=0))
    u2 = len(np.unique(frame2.reshape(-1, 3), axis=0))
    assert u2 > u1


def test_supersample_warns_when_ignored():
    """SSAA silently composing with neither debug shaders nor the debug-camera
    overlay was a trap (scene.py render() gate) — it must warn."""
    scene = _scene("wireframe")
    scene.supersample = 2
    with pytest.warns(RuntimeWarning, match="supersample"):
        scene.render()

    scene2 = _scene("general")
    scene2.supersample = 2
    scene2.debug_camera = tr.Camera((2, 2.5, 4), center=(0, 0, 0), fovy=60,
                                    near=0.01, far=50)
    with pytest.warns(RuntimeWarning, match="debug-camera"):
        scene2.render()


@pytest.mark.slow
def test_supersample_512():
    """512^2 SSAA: edges smooth (strictly more distinct colors), while pure-
    background regions bit-match the ss=1 render (a box filter of a constant
    is the constant)."""
    def build(ss):
        cube = make_cube(1.0)
        floor = make_floor(2.0, y=-0.6)
        scene = tr.Scene(tr.Camera((2, 2.5, 4), center=(0, 0, 0), fovy=60,
                                   near=0.01, far=50, backface_culling=True),
                         tr.Light((3, 4, 2), ambient_strength=0.1),
                         resolution=(512, 512), system=tr.SYSTEM.RH,
                         subsystem=tr.SUBSYSTEM.OPENGL, shader="general",
                         supersample=ss)
        scene.add_model(cube)
        scene.add_model(floor)
        return scene

    f1 = build(1).render()
    f2 = build(2).render()
    assert f2.shape == f1.shape
    # Pure-background pixels (background everywhere in a corner block well
    # away from the geometry) are bit-identical.
    np.testing.assert_array_equal(f1[:40, :40], f2[:40, :40])
    # Edge smoothing: the supersampled frame has strictly more unique colors.
    u1 = len(np.unique(f1.reshape(-1, 3), axis=0))
    u2 = len(np.unique(f2.reshape(-1, 3), axis=0))
    assert u2 > u1
    # And the two frames agree almost everywhere (SSAA only moves edges).
    same = (f1.astype(np.int32) - f2.astype(np.int32))
    assert (np.abs(same).max(axis=-1) <= 2).mean() > 0.97


def test_wireframe_draws_in_lh_system():
    """Regression: wireframe compared RAW viewport z against the LINEARIZED
    z-buffer; with LH (background -inf blocks background draws) the strict
    test never passed and frames were silently empty. The reference
    linearizes vertex z before its alternate shaders run
    (triangular.py:96 -> :269)."""
    cube = make_cube(1.0)
    scene = tr.Scene(tr.Camera((2, 2.5, 4), center=(0, 0, 0), fovy=60,
                               near=1e-4, far=400),
                     tr.Light((3, 4, 2)),
                     resolution=(96, 96), system=tr.SYSTEM.LH,
                     subsystem=tr.SUBSYSTEM.OPENGL, shader="wireframe")
    scene.add_model(cube)
    frame = scene.render()
    bg = frame[0, 0]
    assert int((frame != bg).any(axis=-1).sum()) > 50
