"""Root-cause the orthographic golden's 98.5% (vs >=99.9% elsewhere).

Renders the ortho golden scene (ours vs reference) on CPU, classifies the
failing pixels (|diff| > 2), and tests hypotheses:
  - shadow-stencil flips (diff pixels where the stencil disagrees)
  - depth/shading drift (diff pixels on lit surfaces)
  - coverage (diff pixels on silhouette edges: neighbor tid varies)
"""
from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, "/root/repo/tests")
from conftest import ReferenceModules

import tpu_renderer as tr
from tests.test_golden import CAM_KW, LIGHT_KW, RES


def main():
    reference = ReferenceModules()
    OBJ = "/root/reference/obj"
    extra = dict(projection_type=tr.PROJECTION_TYPE.ORTHOGRAPHIC,
                 position=(0.5, 1.0, 2.0), fovy=30)
    cam_kw = dict(CAM_KW, **extra)
    model = tr.Model.load_model(os.path.join(OBJ, "diablo3_pose",
                                             "diablo3_pose.obj"))
    scene = tr.Scene(tr.Camera(**cam_kw),
                     tr.Light(light_type=tr.Lightning.DIRECTIONAL_LIGHTNING,
                              **LIGHT_KW),
                     shadows=True, debug_camera=tr.Camera(**cam_kw),
                     resolution=RES, system=tr.SYSTEM.LH,
                     subsystem=tr.SUBSYSTEM.OPENGL)
    scene.add_model(model)

    ref_model = reference.core.Model.load_model(
        os.path.join(OBJ, "diablo3_pose", "diablo3_pose.obj"))
    ref_scene = reference.core.Scene(
        reference.core.Camera(**cam_kw),
        reference.core.Light(
            light_type=reference.Lightning.DIRECTIONAL_LIGHTNING, **LIGHT_KW),
        shadows=True, debug_camera=reference.core.Camera(**cam_kw),
        resolution=RES, system=reference.transformation.SYSTEM.LH,
        subsystem=reference.transformation.SUBSYSTEM.OPENGL)
    ref_scene.add_model(ref_model)

    ours = np.asarray(scene.render()).astype(np.int32)
    ref = np.asarray(ref_scene.render()).astype(np.int32)

    # Same interior crop as tests.test_golden.compare (BORDER=5).
    B = 5
    ours = ours[B:-B, B:-B]
    ref = ref[B:-B, B:-B]

    diff = np.abs(ours - ref).max(axis=-1)
    bad = diff > 2
    frac = 1.0 - bad.mean()
    print(f"within +-2: {frac:.4f}  mean |diff| {np.abs(ours-ref).mean():.3f}"
          f"  bad px {bad.sum()}")

    # Diagnostic buffers captured by render() (pre-flip; frame is flipped).
    tid = np.asarray(scene.last_tid)[::-1][B:-B, B:-B]
    stencil = np.asarray(scene.last_stencil)[::-1][B:-B, B:-B]
    zb = np.asarray(scene.last_zbuf)[::-1][B:-B, B:-B]

    shadowed = stencil > 0
    geom = tid >= 0
    # Silhouette/edge pixels: any 4-neighbor differs in tid.
    t = tid
    edge = np.zeros_like(geom)
    edge[1:] |= t[1:] != t[:-1]
    edge[:-1] |= t[:-1] != t[1:]
    edge[:, 1:] |= t[:, 1:] != t[:, :-1]
    edge[:, :-1] |= t[:, :-1] != t[:, 1:]
    # Shadow-boundary pixels: any 4-neighbor differs in shadowed.
    s = shadowed
    sedge = np.zeros_like(geom)
    sedge[1:] |= s[1:] != s[:-1]
    sedge[:-1] |= s[:-1] != s[1:]
    sedge[:, 1:] |= s[:, 1:] != s[:, :-1]
    sedge[:, :-1] |= s[:, :-1] != s[:, 1:]

    n = bad.sum()
    print(f"bad on geometry      : {np.logical_and(bad, geom).sum()}/{n}")
    print(f"bad on tid edges     : {np.logical_and(bad, edge).sum()}/{n}")
    print(f"bad on shadow edges  : {np.logical_and(bad, sedge).sum()}/{n}")
    print(f"bad in shadow        : {np.logical_and(bad, shadowed).sum()}/{n}")
    interior = bad & geom & ~edge & ~sedge
    print(f"bad interior (shade) : {interior.sum()}/{n}")
    ys, xs = np.nonzero(bad)
    for y, x in list(zip(ys, xs))[:12]:
        print(f"  ({y:3d},{x:3d}) ours {ours[y, x]} ref {ref[y, x]} "
              f"tid {tid[y, x]:5d} st {stencil[y, x]:2d} edge {edge[y, x]} "
              f"sedge {sedge[y, x]} z {zb[y, x]:.6f}")


if __name__ == "__main__":
    main()
