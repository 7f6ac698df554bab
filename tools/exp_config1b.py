"""Bisect config 1's per-call overhead: is tree_map(jnp.asarray, dyn) even
producing different objects, and does the raw-vs-asarray gap survive
interleaved A/B timing (TPU contention control)?"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from exp_config1 import build_s1  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from tpu_renderer.ops.pipeline import render_frame

    scene = build_s1()
    cfg, dyn = scene._prepare()
    dyn2 = jax.tree_util.tree_map(jnp.asarray, dyn)

    l1 = jax.tree_util.tree_leaves_with_path(dyn)
    l2 = jax.tree_util.tree_leaves(dyn2)
    diff = [(jax.tree_util.keystr(p), type(a).__name__, a.dtype,
             getattr(a, "weak_type", None))
            for (p, a), b in zip(l1, l2) if a is not b]
    print(f"leaves replaced by asarray: {len(diff)}/{len(l2)}")
    for name, t, dt, wk in diff[:20]:
        print(f"  {name}: {t} dtype={dt} weak={wk}")

    @jax.jit
    def step(d, pos):
        d = dict(d, camera=dict(d["camera"], position=pos))
        return render_frame(cfg, d)[0]

    pos0 = jnp.asarray(scene.camera.position, jnp.float32)
    positions = jnp.broadcast_to(pos0, (15, 3))

    def run(d):
        t0 = time.time()
        frames = [step(d, positions[i]) for i in range(15)]
        np.asarray(frames[-1][:8, :128])
        return (time.time() - t0) / 15 * 1e3

    np.asarray(step(dyn, positions[0]))
    np.asarray(step(dyn2, positions[0]))
    for trial in range(4):
        a = run(dyn)
        b = run(dyn2)
        print(f"trial {trial}: raw {a:.2f} ms  asarray {b:.2f} ms")


if __name__ == "__main__":
    main()
