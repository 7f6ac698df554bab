"""Triangle-count scaling probe: N instanced textured diablos at 1024².

Measures fps / Mtri/s on the real TPU as the face count scales past the
sampler's SMEM word2 cap, and (--check) pins the Pallas frame against the
XLA gather oracle at a scale the goldens never reach.

Instances share ONE texture atlas + window grid via Scene._pack_model's
texture cache (keyed on materials/uv/faces identity), so device memory and
the VMEM-resident grid stay O(1) in instance count.

Usage: python tools/exp_highpoly.py [N_INSTANCES] [--check] [--no-shadows]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def build_highpoly_scene(n_instances=20, resolution=(1024, 1024),
                         shadows=True, textured=True, merged=True,
                         cull=False):
    """A grid of instanced textured diablos + floor.

    merged=True (default): one Model.concat mega-mesh — ONE vertex-stage
    matmul / silhouette reduction (the TPU-native instancing path).
    merged=False: n separate scene models sharing texture atlas + window
    grid via the packing dedup cache (the naive-API path).
    """
    import tpu_renderer as tr
    from tpu_renderer.models.gizmos import make_floor

    base = "/root/reference/obj/diablo3_pose"
    diablo = tr.Model.load_model(os.path.join(base, "diablo3_pose.obj"))
    if textured:
        diablo.textures.register(
            "diffuse", os.path.join(base, "diablo3_pose_diffuse.tga"),
            normalize=False)
        diablo.textures.register(
            "normals", os.path.join(base, "diablo3_pose_nm_tangent.tga"),
            tangent=True)
    # Compute the edge table once on the base so instanced shallow copies
    # share it instead of re-deriving it per instance.
    diablo.edge_table

    light = tr.Light((5, 8, 0), light_type=tr.Lightning.POINT_LIGHTNING,
                     center=(0, 0.5, 0.5), ambient_strength=0.1,
                     specular_strength=0.1, linear=1e-9, quadratic=1e-10)
    camera = tr.Camera((0.5, 4.5, 8.5), center=(0, 0, 0), fovy=90,
                       near=0.0001, far=400, backface_culling=cull)
    scene = tr.Scene(camera, light, shadows=shadows, resolution=resolution,
                     system=tr.SYSTEM.LH, subsystem=tr.SUBSYSTEM.OPENGL)
    # Grid layout, slight scale/Y-rotation variation so silhouettes differ.
    side = int(np.ceil(np.sqrt(n_instances)))
    spacing = 2.2
    insts = []
    for i in range(n_instances):
        r, c = divmod(i, side)
        x = (c - (side - 1) / 2) * spacing
        z = (r - (side - 1) / 2) * spacing
        insts.append(diablo @ tr.scale(0.9 + 0.2 * ((i * 7) % 5) / 4)
                     @ tr.rotate([0, (i * 37) % 360, 0])
                     @ tr.translation([x, 0, z]))
    if merged:
        scene.add_model(tr.Model.concat(insts))
    else:
        for inst in insts:
            scene.add_model(inst)
    floor = make_floor(1.2 * side * spacing, y=-1.0)
    floor.textures.register("diffuse",
                            "/root/reference/obj/floor_diffuse.tga",
                            normalize=False)
    scene.add_model(floor)
    return scene


def main():
    args = [a for a in sys.argv[1:]]
    n_inst = next((int(a) for a in args if a.isdigit()), 20)
    check = "--check" in args
    shadows = "--no-shadows" not in args
    merged = "--multi" not in args
    cull = "--cull" in args

    import jax
    import jax.numpy as jnp
    from tpu_renderer.ops.pipeline import render_frame

    t0 = time.time()
    scene = build_highpoly_scene(n_inst, shadows=shadows, merged=merged,
                                 cull=cull)
    faces = sum(m.num_faces for m in scene.models)
    cfg, dyn = scene._prepare()
    print(f"scene: {n_inst} instances, {faces} faces, "
          f"pack {time.time()-t0:.1f}s; "
          f"win_offsets={sorted(set(mc.win_offset for mc in cfg.models))}",
          flush=True)

    @jax.jit
    def step(d, pos):
        d = dict(d, camera=dict(d["camera"], position=pos))
        return render_frame(cfg, d)[0]

    pos0 = jnp.asarray(scene.camera.position, jnp.float32)
    positions = jnp.stack([pos0 + jnp.array([0.01 * i, 0, 0], jnp.float32)
                           for i in range(10)])
    t0 = time.time()
    f0 = np.asarray(step(dyn, positions[0]))
    print(f"compile+first frame {time.time()-t0:.1f}s mean={f0.mean():.2f}",
          flush=True)

    rounds = []
    for _ in range(5):
        t0 = time.time()
        frames = [step(dyn, positions[i]) for i in range(10)]
        np.asarray(frames[-1][:8, :128])
        rounds.append((time.time() - t0) / 10)
    fps = 1.0 / min(rounds)
    print(f"fps best={fps:.1f} median={1.0/sorted(rounds)[2]:.1f} "
          f"mtri/s={faces * fps / 1e6:.2f} "
          f"rounds={[round(1.0/r, 1) for r in rounds]}", flush=True)

    if check:
        import dataclasses
        cfg_x = dataclasses.replace(cfg, backend="xla", tex_kernel=False)
        fx = np.asarray(jax.jit(lambda d: render_frame(cfg_x, dict(
            d, camera=dict(d["camera"], position=positions[0])))[0])(dyn))
        match = float((f0 == fx).all(axis=-1).mean())
        print(f"pallas_xla_match={match:.6f}", flush=True)
        from PIL import Image
        Image.fromarray(f0).save("/tmp/highpoly_pallas.png")
        Image.fromarray(fx).save("/tmp/highpoly_xla.png")


if __name__ == "__main__":
    main()
