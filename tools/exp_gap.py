"""Locate the fused kernel's in-frame vs chained-harness gap (~6.0 vs ~4.2 ms).

Three contexts, one mode ("full"), all traced; the kernel op's device ms is
what we compare:
  outside : bins/faces/attrs precomputed as device arrays (exp_fused setup)
  inside  : bins + face batch recomputed INSIDE the program before each rep
            (mimics render_frame's producer fusions)
  frame   : the real render_frame (reference point)

RESOLVED (round 3): there never was an input-block stall. The round-2
exp_fused chained reps through ``aff + (acc >> 30)`` where ``acc`` was
tid[0, 0] — the BACKGROUND pixel, -1 — and -1 >> 30 is -1, so reps 2+ ran
with every affine coefficient shifted by -1.0: coverage collapsed, phase 1
skipped its interp/sampling work, and the "warm" reps measured 3.7 ms vs
the true 6.0 (this harness: outside = first instance 6.0, corrupted rest
3.7; inside = camera-perturbed by a genuine 0, all instances 6.0 — matching
the in-frame trace). The 4.2 ms "phase sum" ledger was an artifact.
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpu_renderer.ops import raster_pallas as rp

H = W = 1024
REPS = 6


def main():
    from bench import build_scene
    from tpu_renderer.ops import pipeline as pp
    import shutil
    from tpu_renderer.utils.profiling import trace, summarize_device_trace

    scene = build_scene()
    cfg, dyn = scene._prepare()
    _wg = all(mc.win_grid for mc in cfg.models if mc.win_kinds)
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)
    sign = cfg.system
    n_kinds = max(len(mc.win_kinds) for mc in cfg.models)
    windows = dyn["windows_all"]

    def setup(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
        bins = rp.face_bins(faces, H, W)
        return faces, attrs, bins[:2]

    mode = sys.argv[1] if len(sys.argv) > 1 else "outside"

    if mode == "frame":
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
        args = (dyn, jnp.arange(REPS, dtype=jnp.int32))
    elif mode == "inside":
        @jax.jit
        def program(dyn, rs):
            acc = jnp.int32(0)
            outs = []
            for r in range(REPS):
                d = dict(dyn)
                cam = dict(d["camera"])
                cam["position"] = cam["position"] + (
                    (rs[r] + acc) >> 30).astype(jnp.float32)
                d["camera"] = cam
                faces, attrs, bins = setup(d)
                o = rp.visibility_gbuffer_pallas(
                    faces, attrs, H, W, sign, bins=bins,
                    with_tex_tables=False, windows=windows, n_kinds=n_kinds,
                    win_grid=_wg)
                acc = o[1][0, 0]
                outs.append(o[1][:8, :1])
            return jnp.concatenate(outs)
        args = (dyn, jnp.arange(REPS, dtype=jnp.int32))
    else:
        faces, attrs, bins = jax.tree_util.tree_map(
            jnp.asarray, jax.jit(setup)(dyn))

        @jax.jit
        def program(faces, attrs):
            acc = jnp.int32(0)
            outs = []
            for _ in range(REPS):
                fc = dict(faces, aff=faces["aff"]
                          + (jnp.abs(acc) >> 30).astype(jnp.float32))
                o = rp.visibility_gbuffer_pallas(
                    fc, attrs, H, W, sign, bins=bins, with_tex_tables=False,
                    windows=windows, n_kinds=n_kinds, win_grid=_wg)
                acc = o[1][0, 0]
                outs.append(o[1][:8, :1])
            return jnp.concatenate(outs)
        args = (faces, attrs)

    np.asarray(program(*args))
    ld = f"/tmp/exp_gap_{mode}"
    shutil.rmtree(ld, ignore_errors=True)
    with trace(ld):
        np.asarray(program(*args))
    rows = summarize_device_trace(ld)
    kern = sum(ms for ms, name, src in rows
               if "raster_pallas.py:13" in (src or ""))
    tot = sum(ms for ms, _, _ in rows)
    print(f"{mode:8s} kernel {kern / REPS:7.3f} ms/call   "
          f"program total {tot / REPS:7.3f} ms/rep")
    for ms, name, src in sorted(rows, key=lambda r: -r[0])[:6]:
        print(f"    {ms / REPS:7.3f} {src or name}")


if __name__ == "__main__":
    main()
