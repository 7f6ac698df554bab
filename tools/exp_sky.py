"""Device trace of BASELINE config 4 (skybox multi-model, 512^2)."""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpu_renderer.utils.profiling import trace, summarize_device_trace

REPS = 6


def main():
    import os
    import tpu_renderer as tr
    from tpu_renderer.models.gizmos import make_cube
    from tpu_renderer.ops import pipeline as pp

    base = "/root/reference/obj/diablo3_pose"
    d4 = tr.Model.load_model(os.path.join(base, "diablo3_pose.obj"))
    d4 = d4 @ tr.scale(0.8) @ tr.translation([0.3, 0, 0]) @ tr.rotate(
        [0, 20, 0])
    c4 = make_cube(0.6) @ tr.translation([-1, 0, 0.5])
    sky = tr.CubeMap(**{s: f"/root/reference/obj/skybox/{s}.jpg"
                        for s in ("back", "bottom", "front", "left", "right",
                                  "top")})
    s4 = tr.Scene(tr.Camera((1.5, 2, 3.5), center=(0, 0, 0), fovy=70,
                            near=0.01, far=100),
                  tr.Light((4, 5, 1), ambient_strength=0.15),
                  resolution=(512, 512), system=tr.SYSTEM.LH,
                  subsystem=tr.SUBSYSTEM.OPENGL, skymap=sky)
    s4.add_model(d4)
    s4.add_model(c4)
    cfg, dyn = s4._prepare()
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)

    @jax.jit
    def program(dyn, rs):
        outs = []
        for r in range(REPS):
            d = dict(dyn)
            cam = dict(d["camera"])
            cam["position"] = cam["position"] + (rs[r] >> 30).astype(
                jnp.float32)
            d["camera"] = cam
            outs.append(pp.render_frame(cfg, d)[0][:8, :128, 0])
        return jnp.concatenate([o.astype(jnp.float32).reshape(-1)
                                for o in outs])

    rs = jnp.arange(REPS, dtype=jnp.int32)
    np.asarray(program(dyn, rs))
    logdir = "/tmp/exp_sky"
    import shutil
    shutil.rmtree(logdir, ignore_errors=True)
    with trace(logdir):
        np.asarray(program(dyn, rs))
    rows = summarize_device_trace(logdir)
    tot = 0.0
    by_src = {}
    for ms, name, src in rows:
        tot += ms / REPS
        key = src or name.split(".")[0]
        by_src[key] = by_src.get(key, 0.0) + ms / REPS
    for key, ms in sorted(by_src.items(), key=lambda kv: -kv[1])[:14]:
        print(f"{ms:8.3f} ms  {key[:90]}")
    print(f"{tot:8.3f} ms TOTAL device")


if __name__ == "__main__":
    main()
