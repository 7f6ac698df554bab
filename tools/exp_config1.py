"""Probe config 1's host-side per-call cost: which dyn leaves are not
TPU-resident jax arrays, and what does each cost per jitted call?

Round-3 finding under investigation: bench --all config 1 (gouraud 512,
no shadows) collapsed 109 -> 31 fps while its device time is ~1.8 ms; the
raw `_prepare` output costs ~33 ms/frame vs ~4 ms after
`tree_map(jnp.asarray, dyn)` (previous session, crashed before isolating
the leaves).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_s1():
    import tpu_renderer as tr

    base = "/root/reference/obj/diablo3_pose"
    d = tr.Model.load_model(os.path.join(base, "diablo3_pose.obj"))
    cam = tr.Camera((0.5, 3, 5), center=(0, 0, 0), fovy=90, near=1e-4, far=400)
    s1 = tr.Scene(cam, tr.Light((5, 5, 0)), resolution=(512, 512),
                  system=tr.SYSTEM.LH, subsystem=tr.SUBSYSTEM.OPENGL,
                  shader="gouraud")
    s1.add_model(d)
    return s1


def main():
    import jax
    import jax.numpy as jnp

    from tpu_renderer.ops.pipeline import render_frame

    scene = build_s1()
    cfg, dyn = scene._prepare()

    leaves, treedef = jax.tree_util.tree_flatten_with_path(dyn)
    tpu = jax.devices()[0]
    print(f"default backend: {jax.default_backend()}, device: {tpu}")
    n_off = 0
    for path, leaf in leaves:
        name = jax.tree_util.keystr(path)
        if isinstance(leaf, jax.Array):
            devs = list(leaf.devices())
            committed = getattr(leaf, "_committed", None)
            where = f"jax.Array on {devs} committed={committed}"
            off = devs != [tpu]
        else:
            where = f"{type(leaf).__module__}.{type(leaf).__name__}"
            off = True
        if off:
            n_off += 1
            print(f"  OFF-DEVICE {name}: {where} shape={getattr(leaf, 'shape', '?')}")
    print(f"off-device leaves: {n_off}/{len(leaves)}")

    @jax.jit
    def step(d, pos):
        d = dict(d, camera=dict(d["camera"], position=pos))
        return render_frame(cfg, d)[0]

    pos0 = jnp.asarray(scene.camera.position, jnp.float32)
    positions = jnp.broadcast_to(pos0, (15, 3))

    def timeit(label, d):
        np.asarray(step(d, positions[0]))
        t0 = time.time()
        frames = [step(d, positions[i]) for i in range(15)]
        np.asarray(frames[-1][:8, :128])
        dt = (time.time() - t0) / 15
        print(f"{label}: {dt*1e3:.2f} ms/frame ({1/dt:.1f} fps)")

    timeit("raw _prepare dyn   ", dyn)
    dyn2 = jax.tree_util.tree_map(jnp.asarray, dyn)
    timeit("tree_map asarray   ", dyn2)
    dyn3 = jax.device_put(dyn, tpu)
    timeit("device_put(dyn,tpu)", dyn3)


if __name__ == "__main__":
    main()
