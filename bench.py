"""Headline benchmark: fps on the 1024x1024 diablo shadow-volume scene.

BASELINE.json config 5: textured diablo3_pose over a floor, point light,
shadow volumes, animated camera orbit, one TPU chip. Prints ONE JSON line:
{"metric": ..., "value": fps, "unit": "fps", "vs_baseline": x}.

vs_baseline divides by the NumPy reference renderer's measured fps on this
machine (BASELINE_MEASURED.json, captured by running the reference at the
same resolution/scene; 11.94 s/frame on the build host).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def build_scene(resolution=(1024, 1024)):
    import tpu_renderer as tr
    from tpu_renderer.models.gizmos import make_floor

    base = "/root/reference/obj/diablo3_pose"
    diablo = tr.Model.load_model(os.path.join(base, "diablo3_pose.obj"))
    diablo.textures.register(
        "diffuse", os.path.join(base, "diablo3_pose_diffuse.tga"),
        normalize=False)
    diablo.textures.register(
        "normals", os.path.join(base, "diablo3_pose_nm_tangent.tga"),
        tangent=True)
    floor = make_floor(2.0, y=-1.0)
    floor.textures.register("diffuse", "/root/reference/obj/floor_diffuse.tga",
                            normalize=False)
    light = tr.Light((5, 5, 0), light_type=tr.Lightning.POINT_LIGHTNING,
                     center=(0, 0.5, 0.5), ambient_strength=0.1,
                     specular_strength=0.1, linear=1e-9, quadratic=1e-10)
    camera = tr.Camera((0.5, 3, 5), center=(0, 0, 0), fovy=90, near=0.0001,
                       far=400, backface_culling=False)
    scene = tr.Scene(camera, light, shadows=True, resolution=resolution,
                     system=tr.SYSTEM.LH, subsystem=tr.SUBSYSTEM.OPENGL)
    scene.add_model(diablo)
    scene.add_model(floor)
    return scene


def orbit_position(t: float, radius: float = 5.05, height: float = 3.0):
    return np.array([radius * np.sin(t) + 0.5, height, radius * np.cos(t)],
                    dtype=np.float32)


def main():
    import jax
    import jax.numpy as jnp

    from tpu_renderer.ops.pipeline import render_frame

    scene = build_scene()
    faces = sum(m.num_faces for m in scene.models)
    cfg, dyn = scene._prepare()

    n_frames = 30
    ts = 0.2 + 0.1 * jnp.arange(n_frames, dtype=jnp.float32)
    radius, height_ = 5.05, 3.0
    positions = jnp.stack([radius * jnp.sin(ts) + 0.5,
                           jnp.full_like(ts, height_),
                           radius * jnp.cos(ts)], axis=1)   # (N, 3) on device

    @jax.jit
    def step(d, pos):
        d = dict(d, camera=dict(d["camera"], position=pos))
        return render_frame(cfg, d)[0]

    # Compile + warm (the orbit is a traced argument: no recompiles).
    np.asarray(step(dyn, positions[0]))

    # Device throughput: pipeline every frame, sync once at the end. This is
    # the renderer's frame rate; the development environment reaches the TPU
    # through a network tunnel whose per-sync latency (~30 ms) and ~28 MB/s
    # download bandwidth would otherwise dominate the measurement.
    t0 = time.time()
    frames = [step(dyn, positions[i]) for i in range(n_frames)]
    last = np.asarray(frames[-1])
    dt_throughput = (time.time() - t0) / n_frames

    # End-to-end: every frame downloaded to host (includes tunnel transfer).
    t0 = time.time()
    for i in range(5):
        np.asarray(step(dyn, positions[i]))
    dt_e2e = (time.time() - t0) / 5

    fps = 1.0 / dt_throughput
    mtri_s = faces * fps / 1e6

    baseline_fps = None
    baseline_path = os.path.join(os.path.dirname(__file__),
                                 "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline_fps = json.load(f).get("fps")

    result = {
        "metric": "fps@1024x1024 diablo shadow-volume scene (camera orbit)",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / baseline_fps, 2) if baseline_fps else None,
        "mtri_per_s": round(mtri_s, 3),
        "frames": n_frames,
        "e2e_fps_with_host_download": round(1.0 / dt_e2e, 3),
    }
    print(json.dumps(result))
    return last


if __name__ == "__main__":
    main()
