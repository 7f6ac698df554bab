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
                         cull=False, cam_height=4.5):
    """A grid of instanced textured diablos + floor (shared with bench.py).

    merged=True (default): one Model.concat mega-mesh — ONE vertex-stage
    matmul / silhouette reduction (the TPU-native instancing path).
    merged=False: n separate scene models sharing texture atlas + window
    grid via the packing dedup cache (the naive-API path).
    """
    from bench import build_highpoly_scene as _build
    return _build(n_instances, resolution=resolution, shadows=shadows,
                  textured=textured, merged=merged, cull=cull,
                  cam_height=cam_height)


def main():
    args = [a for a in sys.argv[1:]]
    n_inst = next((int(a) for a in args if a.isdigit()), 20)
    check = "--check" in args
    shadows = "--no-shadows" not in args
    merged = "--multi" not in args
    cull = "--cull" in args
    cam_height = 1.5 if "--low" in args else 4.5

    import jax
    import jax.numpy as jnp
    from tpu_renderer.ops.pipeline import render_frame

    t0 = time.time()
    scene = build_highpoly_scene(n_inst, shadows=shadows, merged=merged,
                                 cull=cull, cam_height=cam_height)
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
