"""Alternate shaders: flat, gouraud, PBR (GGX helpers), wireframe, points.

End-to-end oracle pins: the reference's dispatch is hard-coded to
general_shading (triangular.py:127) with the alternates left as commented
calls (:121-130), so ``_render_reference_alt`` executes the reference's
rasterize loop with general_shading monkeypatched to the alternate shader —
exactly the dispatch the comments describe — and full frames are compared.
"""
import os

import numpy as np
import pytest

import jax.numpy as jnp

import tpu_renderer as tr
from tpu_renderer.models.gizmos import make_cube, make_floor
from tpu_renderer.ops import shading as sh

RNG = np.random.default_rng(11)

DIABLO = "/root/reference/obj/diablo3_pose/diablo3_pose.obj"
ALT_RES = (160, 160)
ALT_CAM = dict(position=(0.5, 3, 5), center=(0, 0, 0), fovy=90, near=0.0001,
               far=400)
ALT_LIGHT = dict(position=(5, 5, 0), center=(0, 0.5, 0.5),
                 ambient_strength=0.1, specular_strength=0.1,
                 linear=1e-9, quadratic=1e-10)
#: RH framing for the wireframe/points goldens (the LH ALT_CAM leaves the
#: mesh mostly outside the RH frustum; the reference's wireframe z test is
#: RH-oriented — see test_wireframe_golden_vs_reference).
ALT_CAM_RH = dict(position=(0, 1, 4), center=(0, 0, 0), fovy=60, near=0.01,
                  far=400)


def _render_reference_alt(reference, shader, *, backface_culling=False,
                          system=None, cam=None):
    """One reference rasterize pass over the diablo mesh with the alternate
    shader wired into the dispatch (triangular.py:121-130). Returns the
    PRE-flip float frame — the uint8 cast at core.py:640 wraps modulo 256
    for the 255-scale shaders (flat/gouraud write intensity*255 into the
    float frame), so value comparisons happen pre-quantization."""
    tri = reference.triangular
    SYSTEM = reference.transformation.SYSTEM
    system = {None: SYSTEM.LH, tr.SYSTEM.LH: SYSTEM.LH,
              tr.SYSTEM.RH: SYSTEM.RH}[system]
    model = reference.core.Model.load_model(DIABLO)
    if shader in ("wireframe", "points"):
        # With z writes on, every edge pixel z-ties with its own face's
        # interior (strict test fails -> sparse f32/f64 coin-flip noise on
        # BOTH sides). depth_test=False keeps the z-buffer at +-inf: the
        # full deterministic wireframe/point set draws, and rasterize's
        # sequential z early-outs vanish — an order-free oracle.
        model.depth_test = False
    cam = cam or ALT_CAM
    light = reference.core.Light(
        light_type=reference.Lightning.DIRECTIONAL_LIGHTNING, **ALT_LIGHT)
    camera = reference.core.Camera(backface_culling=backface_culling,
                                   **cam)
    scene = reference.core.Scene(
        camera, light, debug_camera=reference.core.Camera(**cam),
        resolution=ALT_RES, system=system,
        subsystem=reference.transformation.SUBSYSTEM.OPENGL)
    scene.add_model(model)

    h, w = ALT_RES
    frame = np.zeros((h, w, 3), dtype=np.float32)
    frame[:] = [64 / 255, 0.5, 198 / 255]            # core.py:600
    z_buffer = np.full((h, w), np.inf * scene.system, dtype=np.float64)

    if shader == "points":
        # points_only end-to-end over the reference's own vertex stage
        # (the rasterize steps of triangular.py:36-45 minus the coverage
        # early-outs): the shader itself never reads coverage or z, and
        # dispatching through rasterize would gate it on the per-face
        # pixel-coverage tests — sub-pixel faces (common at 160²) would be
        # skipped, shifting the last-writer color classes. This pins the
        # shader's own semantics (world-space cull, vertex splats, write
        # order) over the full mesh, which is what our device path computes.
        W_COL = reference.constants.W_COL
        for m in scene.models:
            for face in m.faces:
                face.vertices = face.vertices @ camera.MVP
                depth = 1 / face.vertices[W_COL]
                face.vertices *= depth
                face.vertices = face.vertices @ camera.viewport
                face.vertices[W_COL] = depth
                tri.points_only(face, camera, frame)
        return frame

    def dispatch(face, bar, light_, camera_, frame_, x, y, first_pass):
        if shader == "flat":
            tri.flat_shading(face, light_, frame_, x, y)
        elif shader == "gouraud":
            tri.gouraud(face, light_, frame_, bar, x, y)
        elif shader == "pbr":
            tri.pbr(face, light_, camera_, frame_, bar, x, y)
        elif shader == "wireframe":
            tri.wireframe_shading(face, frame_, z_buffer)
        elif shader == "points":
            tri.points_only(face, camera_, frame_)

    orig = tri.general_shading
    tri.general_shading = dispatch
    try:
        for m in scene.models:
            for face in m.faces:
                tri.rasterize(face, frame, z_buffer, light, camera,
                              debug_camera=scene.debug_camera)
    finally:
        tri.general_shading = orig
    return frame


def _ours_alt_scene(shader, *, backface_culling=False, system=tr.SYSTEM.LH,
                    cam=None):
    model = tr.Model.load_model(DIABLO)
    if shader in ("wireframe", "points"):
        model.depth_test = False        # see _render_reference_alt
    light = tr.Light(light_type=tr.Lightning.DIRECTIONAL_LIGHTNING,
                     **ALT_LIGHT)
    camera = tr.Camera(backface_culling=backface_culling, **(cam or ALT_CAM))
    scene = tr.Scene(camera, light, shadows=False, resolution=ALT_RES,
                     system=system, subsystem=tr.SUBSYSTEM.OPENGL,
                     shader=shader)
    scene.add_model(model)
    return scene


@pytest.mark.parametrize("shader,scale", [("flat", 255.0), ("gouraud", 255.0),
                                          ("pbr", 1.0)])
def test_alt_shader_golden_vs_reference(reference, ref_render, shader, scale):
    """flat / gouraud / pbr end-to-end against the executed reference
    (triangular.py:174-182, 220-266): pre-flip float frames, normalized by
    the shader's write scale, must agree within 2/255 on >=99.5% of pixels."""
    from tpu_renderer.ops.pipeline import render_core_jit

    ref = ref_render(
        f"alt_{shader}",
        dict(shader=shader, cam=ALT_CAM, light=ALT_LIGHT, res=ALT_RES),
        lambda: _render_reference_alt(reference, shader)) / scale
    cfg, dyn = _ours_alt_scene(shader)._prepare()
    ours = np.asarray(render_core_jit(cfg, dyn)[0]) / scale

    diff = np.abs(ours.astype(np.float64) - ref.astype(np.float64)).max(-1)
    frac = float((diff <= 2 / 255).mean())
    mean = float(diff.mean())
    print(f"[alt {shader}] within2={frac:.5f} mean255={mean * 255:.4f}",
          flush=True)
    assert frac >= 0.995, f"{shader}: only {frac:.4f} within 2/255"
    assert mean * 255 <= 0.5


def test_wireframe_golden_vs_reference(reference, ref_render):
    """Wireframe end-to-end: the painted-pixel mask vs the executed reference
    (triangular.py:269-274). Colors are compared as masks: the reference
    writes raw (64, 64, 128) into the float frame (its final uint8 cast then
    WRAPS modulo 256 — a quantization artifact we deliberately clip instead,
    pipeline.render_debug_frame), so the pinned semantics are WHICH pixels
    get edge color. RH system: the reference's strict ``z_buffer - z > 0``
    test (triangular.py:272) is RH-oriented — under LH the -inf background
    blocks nearly every draw on both sides. depth_test=False (see
    _render_reference_alt) keeps the comparison order-free; remaining
    deviation is f32 (device DDA) vs f64 (host) truncation flips on a thin
    set of boundary pixels."""
    ref = ref_render(
        "alt_wireframe",
        dict(shader="wireframe", system="RH", cam=ALT_CAM_RH,
             light=ALT_LIGHT, res=ALT_RES),
        lambda: _render_reference_alt(reference, "wireframe",
                                      system=tr.SYSTEM.RH, cam=ALT_CAM_RH))
    ref_mask = (ref == np.array([64, 64, 128], np.float32)).all(-1)

    ours = _ours_alt_scene("wireframe", system=tr.SYSTEM.RH,
                           cam=ALT_CAM_RH).render()
    # Our device path writes (64,64,128)/255 pre-gamma; recover the mask from
    # the quantized frame (and un-flip).
    col = (np.clip(np.array([64, 64, 128]) / 255, 0, 1) ** 0.8 * 255
           ).astype(np.uint8)
    our_mask = (ours[::-1] == col).all(-1)

    agree = (ref_mask == our_mask).mean()
    extra_ours = (our_mask & ~ref_mask).sum()
    extra_ref = (ref_mask & ~our_mask).sum()
    print(f"[alt wireframe] agree={agree:.5f} ref={ref_mask.sum()} "
          f"ours={our_mask.sum()} extra_ours={extra_ours} "
          f"extra_ref={extra_ref}", flush=True)
    assert ref_mask.sum() > 500 and our_mask.sum() > 500
    assert agree >= 0.97
    # Ours mostly subsets the reference (it only loses sequentially-painted,
    # later-occluded edges); few pixels exist only on our side.
    assert extra_ours <= 0.15 * our_mask.sum()


def test_points_golden_vs_reference(reference, ref_render):
    """Points end-to-end vs the executed reference (triangular.py:277-283):
    red/blue endpoint splats as masks (same wrap-vs-clip quantization note
    as the wireframe golden). The reference side runs points_only over its
    own vertex stage for every face (see _render_reference_alt — dispatching
    through rasterize would coverage-gate the shader), so the face set and
    write order are identical on both sides; remaining deviation is
    f32-vs-f64 truncation on vertex pixel coordinates."""
    ref = ref_render(
        "alt_points",
        dict(shader="points", system="RH", cam=ALT_CAM_RH, light=ALT_LIGHT,
             res=ALT_RES),
        lambda: _render_reference_alt(reference, "points",
                                      system=tr.SYSTEM.RH, cam=ALT_CAM_RH))
    ours = _ours_alt_scene("points", system=tr.SYSTEM.RH,
                           cam=ALT_CAM_RH).render()[::-1]

    masks = {}
    for name, raw, ourc in (("red", (255, 0, 0), (255, 0, 0)),
                            ("blue", (0, 0, 255), (0, 0, 255))):
        rm = (ref == np.array(raw, np.float32)).all(-1)
        om = (ours == np.array(ourc, np.uint8)).all(-1)
        masks[name] = (rm, om)

    total_ref = sum(m[0].sum() for m in masks.values())
    total_our = sum(m[1].sum() for m in masks.values())
    extra_ref = sum((m[0] & ~m[1]).sum() for m in masks.values())
    extra_our = sum((m[1] & ~m[0]).sum() for m in masks.values())
    agree = np.mean([(m[0] == m[1]).mean() for m in masks.values()])
    print(f"[alt points] agree={agree:.5f} ref={total_ref} ours={total_our} "
          f"extra_ref={extra_ref} extra_ours={extra_our}", flush=True)
    assert total_ref > 100 and total_our > 100
    assert agree >= 0.995
    # Same face set + write order on both sides; only f32/f64 trunc flips
    # on near-integer vertex coordinates may disagree.
    assert extra_ref <= 0.05 * total_ref
    assert extra_our <= 0.05 * total_our


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
