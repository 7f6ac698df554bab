"""Device-op breakdown of the FULL flagship frame via the profiler.

Runs render_frame 6x inside one jitted program (rep index mixed into the
camera so XLA can't CSE), traces, and prints per-op device ms sorted.
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpu_renderer.utils.profiling import trace, summarize_device_trace

REPS = int(__import__("os").environ.get("FT_REPS", 6))


def main():
    from bench import build_scene
    from tpu_renderer.ops import pipeline as pp

    if "--highpoly" in sys.argv:
        from exp_highpoly import build_highpoly_scene
        n = int(sys.argv[sys.argv.index("--highpoly") + 1])
        scene = build_highpoly_scene(
            n, shadows="--no-shadows" not in sys.argv,
            cull="--cull" in sys.argv,
            cam_height=1.5 if "--low" in sys.argv else 4.5)
    else:
        scene = build_scene()
    cfg, dyn = scene._prepare()
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)

    @jax.jit
    def program(dyn, rs):
        # Reps CHAIN through a consumed output scalar (acc is a frame byte,
        # <= 255, so abs(acc) >> 30 == 0): without the data dependency XLA
        # overlaps two fused-kernel instances and their combined scoped VMEM
        # (2 x ~9.7 MB at TILE_H=256) trips the 16 MB compiler limit.
        acc = jnp.int32(0)
        outs = []
        for r in range(REPS):
            d = dict(dyn)
            cam = dict(d["camera"])
            cam["position"] = (cam["position"]
                               + (rs[r] >> 30).astype(jnp.float32)
                               + (jnp.abs(acc) >> 30).astype(jnp.float32))
            d["camera"] = cam
            o = pp.render_frame(cfg, d)[0][:8, :128, 0]
            acc = o[0, 0].astype(jnp.int32)
            outs.append(o)
        return jnp.concatenate([o.astype(jnp.float32).reshape(-1)
                                for o in outs])

    rs = jnp.arange(REPS, dtype=jnp.int32)
    np.asarray(program(dyn, rs))
    logdir = "/tmp/exp_fulltrace"
    import shutil
    shutil.rmtree(logdir, ignore_errors=True)
    with trace(logdir):
        np.asarray(program(dyn, rs))
    rows = summarize_device_trace(logdir)
    tot = 0.0
    by_src = {}
    names = {}
    for ms, name, src in rows:
        tot += ms / REPS
        key = src or name.split(".")[0]
        by_src[key] = by_src.get(key, 0.0) + ms / REPS
        names.setdefault(key, name.split(".")[0])
    for key, ms in sorted(by_src.items(), key=lambda kv: -kv[1]):
        if ms < 0.01:
            continue
        print(f"{ms:8.3f} ms  {key[:70]}  [{names[key][:40]}]")
    print(f"{tot:8.3f} ms TOTAL device")


if __name__ == "__main__":
    main()
