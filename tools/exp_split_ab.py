"""A/B: fused two-phase kernel vs split+prune pipeline on the FLAGSHIP.

The split path is auto-on only past FACE_CHUNK faces; TPU_RENDERER_SPLIT=2
forces it, so this measures whether the phase-1 z-interval prune pays at
5.5k faces (the diablo has no backface culling in the flagship config —
~half its faces always lose — but backfaces sit just behind frontfaces,
inside the per-cell z range, so the prune rate is the open question).

Both variants trace in ONE process (the env var is read at trace time) —
cross-process TPU contention can't skew the comparison.

Usage: python tools/exp_split_ab.py [--highpoly N [--cull] [--low]]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax"))


def main():
    import jax
    import jax.numpy as jnp

    from bench import build_highpoly_scene, build_scene
    from tpu_renderer.ops.pipeline import render_frame

    if "--highpoly" in sys.argv:
        n = int(sys.argv[sys.argv.index("--highpoly") + 1])
        scene = build_highpoly_scene(
            n, cull="--cull" in sys.argv,
            cam_height=1.5 if "--low" in sys.argv else 4.5)
    else:
        scene = build_scene()
    cfg, dyn = scene._prepare()
    t0 = time.time()

    def make_step(split_env):
        os.environ["TPU_RENDERER_SPLIT"] = split_env

        @jax.jit
        def step(d, pos):
            d = dict(d, camera=dict(d["camera"], position=pos))
            return render_frame(cfg, d)[0]

        return step

    pos0 = jnp.asarray(scene.camera.position, jnp.float32)
    positions = jnp.stack([pos0 + jnp.array([0.01 * i, 0, 0], jnp.float32)
                           for i in range(15)])

    results = {}
    for label, env in (("fused", "0"), ("split", "2")):
        step = make_step(env)
        np.asarray(step(dyn, positions[0]))      # compile (env read at trace)
        print(f"{label}: compiled at {time.time()-t0:.0f}s", flush=True)
        rounds = []
        for _ in range(5):
            t1 = time.time()
            frames = [step(dyn, positions[i]) for i in range(15)]
            np.asarray(frames[-1][:8, :128])
            rounds.append((time.time() - t1) / 15)
        results[label] = rounds
        print(f"{label}: best={1/min(rounds):.1f} "
              f"median={1/sorted(rounds)[2]:.1f} fps "
              f"rounds={[round(1/r,1) for r in rounds]}", flush=True)

    f, s = 1 / min(results["fused"]), 1 / min(results["split"])
    print(f"split/fused speedup: {s/f:.3f}x", flush=True)


if __name__ == "__main__":
    main()
