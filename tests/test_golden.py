"""End-to-end golden-image tests: our frames vs the NumPy reference oracle.

The reference renderer always runs its shadow passes and always draws the
debug camera's frustum overlay (SURVEY.md §2 quirks 1-2), so every oracle
scene gets shadows=True and a debug camera identical to the main camera (the
overlay then lands on the screen border, which the comparison excludes).

Tolerance: the reference mixes float64 (z-buffer, matrices) with float32 where
we are float32 throughout, so a thin set of boundary/z-fight pixels may
differ. A frame passes when >= 97.5% of interior pixels match within +-2
uint8 levels and the mean abs diff is <= 1.5.
"""
import os

import numpy as np
import pytest

import tpu_renderer as tr

DIABLO_DIR = "/root/reference/obj/diablo3_pose"
RES = (160, 160)
BORDER = 5


def _build_ours(light_kwargs, cam_kwargs, *, textures, light_type,
                resolution=RES, shadows=True):
    model = tr.Model.load_model(os.path.join(DIABLO_DIR, "diablo3_pose.obj"))
    if textures:
        model.textures.register(
            "normals", os.path.join(DIABLO_DIR, "diablo3_pose_nm_tangent.tga"),
            tangent=True)
        model.textures.register(
            "diffuse", os.path.join(DIABLO_DIR, "diablo3_pose_diffuse.tga"),
            normalize=False)
    light = tr.Light(light_type=light_type, **light_kwargs)
    camera = tr.Camera(**cam_kwargs)
    debug_camera = tr.Camera(**cam_kwargs)
    scene = tr.Scene(camera, light, shadows=shadows, debug_camera=debug_camera,
                     resolution=resolution, system=tr.SYSTEM.LH,
                     subsystem=tr.SUBSYSTEM.OPENGL)
    scene.add_model(model)
    return scene


def _build_reference(reference, light_kwargs, cam_kwargs, *, textures,
                     light_type, resolution=RES):
    model = reference.core.Model.load_model(
        os.path.join(DIABLO_DIR, "diablo3_pose.obj"))
    if textures:
        model.textures.register(
            "normals", os.path.join(DIABLO_DIR, "diablo3_pose_nm_tangent.tga"),
            tangent=True)
        model.textures.register(
            "diffuse", os.path.join(DIABLO_DIR, "diablo3_pose_diffuse.tga"),
            normalize=False)
    ref_lt = getattr(reference.Lightning, light_type.name)
    light = reference.core.Light(light_type=ref_lt, **light_kwargs)
    camera = reference.core.Camera(**cam_kwargs)
    debug_camera = reference.core.Camera(**cam_kwargs)
    scene = reference.core.Scene(
        camera, light, shadows=True, debug_camera=debug_camera,
        resolution=resolution, system=reference.transformation.SYSTEM.LH,
        subsystem=reference.transformation.SUBSYSTEM.OPENGL)
    scene.add_model(model)
    return scene


def compare(ours, ref, name, good_frac=0.998, mean_tol=0.5):
    # Measured fidelity (round 3): every golden is >= 0.9990 within ±2 with
    # mean <= 0.03, except the orthographic scene (0.9957, mean 0.077 after
    # the f64 overlay fix — see test_golden2.test_golden_orthographic); its
    # caller loosens the bound slightly.
    interior = np.s_[BORDER:-BORDER, BORDER:-BORDER]
    a = ours[interior].astype(np.int32)
    b = ref[interior].astype(np.int32)
    diff = np.abs(a - b).max(axis=-1)
    frac = float((diff <= 2).mean())
    mean = float(np.abs(a - b).mean())
    print(f"[golden {name}] within2={frac:.5f} mean={mean:.4f}", flush=True)
    if frac < good_frac or mean > mean_tol:
        from PIL import Image
        Image.fromarray(ours).save(f"/tmp/golden_{name}_ours.png")
        Image.fromarray(ref).save(f"/tmp/golden_{name}_ref.png")
        Image.fromarray((np.abs(a - b).max(-1) * 8).clip(0, 255)
                        .astype(np.uint8)).save(f"/tmp/golden_{name}_diff.png")
    assert frac >= good_frac, f"{name}: only {frac:.4f} pixels within 2 (mean {mean:.3f})"
    assert mean <= mean_tol, f"{name}: mean abs diff {mean:.3f}"


LIGHT_KW = dict(position=(5, 5, 0), center=(0, 0.5, 0.5), fovy=90,
                linear=1e-9, quadratic=1e-10, ambient_strength=0.1,
                specular_strength=0.1)
CAM_KW = dict(position=(0.5, 3, 5), center=(0, 0, 0), fovy=90, near=0.0001,
              far=400, backface_culling=False,
              projection_type=tr.PROJECTION_TYPE.PERSPECTIVE)


@pytest.mark.parametrize("name,textures,light_type", [
    ("plain_directional", False, tr.Lightning.DIRECTIONAL_LIGHTNING),
    ("textured_directional", True, tr.Lightning.DIRECTIONAL_LIGHTNING),
    ("textured_point", True, tr.Lightning.POINT_LIGHTNING),
    ("textured_spot", True, tr.Lightning.SPOT_LIGHTNING),
])
def test_golden_diablo(reference, ref_render, name, textures, light_type):
    ours = _build_ours(LIGHT_KW, CAM_KW, textures=textures,
                       light_type=light_type).render()
    ref = ref_render(
        f"diablo_{name}",
        dict(light=LIGHT_KW, cam=CAM_KW, textures=textures,
             light_type=light_type.name, res=RES),
        lambda: _build_reference(reference, LIGHT_KW, CAM_KW,
                                 textures=textures,
                                 light_type=light_type).render())
    compare(ours, ref, name)


DEBUG_CAM_KW = dict(position=(0, 3, 0.01), center=(0, 0, 0), fovy=80, near=1,
                    far=3, backface_culling=True,
                    projection_type=tr.PROJECTION_TYPE.PERSPECTIVE)


def test_golden_frustum_overlay(reference, ref_render):
    """Distinct debug camera: its wireframe frustum + clipping appear in-frame
    (reference main.py:84-92 camera2 + frustums.py overlay)."""
    model = tr.Model.load_model(os.path.join(DIABLO_DIR, "diablo3_pose.obj"))
    light = tr.Light(light_type=tr.Lightning.DIRECTIONAL_LIGHTNING, **LIGHT_KW)
    scene = tr.Scene(tr.Camera(**CAM_KW), light, shadows=True,
                     debug_camera=tr.Camera(**DEBUG_CAM_KW), resolution=RES,
                     system=tr.SYSTEM.LH, subsystem=tr.SUBSYSTEM.OPENGL)
    scene.add_model(model)
    ours = scene.render()

    def _ref():
        ref_model = reference.core.Model.load_model(
            os.path.join(DIABLO_DIR, "diablo3_pose.obj"))
        ref_light = reference.core.Light(
            light_type=reference.Lightning.DIRECTIONAL_LIGHTNING, **LIGHT_KW)
        ref_scene = reference.core.Scene(
            reference.core.Camera(**CAM_KW), ref_light, shadows=True,
            debug_camera=reference.core.Camera(**DEBUG_CAM_KW),
            resolution=RES,
            system=reference.transformation.SYSTEM.LH,
            subsystem=reference.transformation.SUBSYSTEM.OPENGL)
        ref_scene.add_model(ref_model)
        return ref_scene.render()

    ref = ref_render("frustum_overlay",
                     dict(light=LIGHT_KW, cam=CAM_KW, dbg=DEBUG_CAM_KW,
                          res=RES), _ref)
    # Thin anti-aliased lines can shift by a pixel between f32 and f64 DDA.
    compare(ours, ref, "frustum_overlay", good_frac=0.95, mean_tol=3.0)


def test_golden_backface_culling(reference, ref_render):
    cam = dict(CAM_KW, backface_culling=True)
    ours = _build_ours(LIGHT_KW, cam, textures=False,
                       light_type=tr.Lightning.DIRECTIONAL_LIGHTNING).render()
    ref = ref_render(
        "backface", dict(light=LIGHT_KW, cam=cam, textures=False, res=RES),
        lambda: _build_reference(
            reference, LIGHT_KW, cam, textures=False,
            light_type=tr.Lightning.DIRECTIONAL_LIGHTNING).render())
    compare(ours, ref, "backface")


@pytest.mark.slow
def test_golden_production_512_textured_shadowed(reference, ref_render):
    """Production-resolution fidelity: 512^2 textured diablo with shadows vs
    the executed oracle, with the windowed texture sampler FORCED on — pins
    the bench-scale path (tile boundaries, chunk streaming, window coverage)
    that the 160^2 goldens cannot exercise."""
    scene = _build_ours(LIGHT_KW, CAM_KW, textures=True,
                        light_type=tr.Lightning.POINT_LIGHTNING,
                        resolution=(512, 512))
    scene.tex_kernel = True
    ours = scene.render()
    ref = ref_render(
        "production_512",
        dict(light=LIGHT_KW, cam=CAM_KW, textures=True, light_type="POINT",
             res=(512, 512)),
        lambda: _build_reference(reference, LIGHT_KW, CAM_KW, textures=True,
                                 light_type=tr.Lightning.POINT_LIGHTNING,
                                 resolution=(512, 512)).render())
    compare(ours, ref, "production_512")
