"""Why is the fused kernel 6.0 ms in-frame but 4.2 ms standalone?

A/B the SAME fused visibility+gbuffer+sampler call in two contexts:
  pre : faces/attrs/bins materialized as program inputs (exp_fused style)
  in  : faces/attrs/bins computed inside the program per rep (frame style)

If `in` reproduces the in-frame 6.0 ms, the ~1.8 ms gap is input
production/layout (XLA layout of the intermediates feeding the kernel),
not kernel compute.
"""
from __future__ import annotations

import shutil
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpu_renderer.ops import raster_pallas as rp
from tpu_renderer.utils.profiling import trace, summarize_device_trace

H = W = 1024
REPS = 6


def main():
    from bench import build_scene
    from tpu_renderer.ops import pipeline as pp

    scene = build_scene()
    cfg, dyn = scene._prepare()
    _wg = all(mc.win_grid for mc in cfg.models if mc.win_kinds)
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)
    sign = cfg.system
    n_kinds = max(len(mc.win_kinds) for mc in cfg.models)
    windows = dyn["windows_all"]

    @jax.jit
    def setup(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
        bins = rp.face_bins(faces, H, W)
        return faces, attrs, bins[:2]

    faces0, attrs0, bins0 = jax.tree_util.tree_map(jnp.asarray, setup(dyn))

    def call(faces, attrs, bins):
        # with_tex_tables=False matches the in-frame flagship call
        # (needs_tables is False when the sampler covers every kind).
        return rp.visibility_gbuffer_pallas(
            faces, attrs, H, W, sign, bins=bins, windows=windows, win_grid=_wg,
            n_kinds=n_kinds, with_tex_tables=False)

    def chain(out, faces):
        # Chain reps through a consumed input: aff reaches fdata (sx does
        # NOT — pack_faces reads aff/inv_w/bbox/clip only; chaining through
        # sx lets XLA CSE all reps into one kernel instance).
        eps = (out[1][0, 0] >> 30).astype(jnp.float32)
        faces = dict(faces)
        faces["aff"] = faces["aff"] + eps
        return faces

    @jax.jit
    def prog_pre(faces, attrs, bins):
        outs = []
        for _ in range(REPS):
            o = call(faces, attrs, bins)
            outs.append(o[0][:8, :1])
            faces = chain(o, faces)
        return jnp.concatenate(outs)

    @jax.jit
    def prog_in(d):
        outs = []
        eps = jnp.float32(0)
        for _ in range(REPS):
            cam = dict(d["camera"])
            cam["position"] = cam["position"] + eps
            dd = dict(d)
            dd["camera"] = cam
            cam_m = pp._cam_matrices(cfg, cam, cfg.cam_projection_type)
            faces, attrs = pp._build_face_batch(cfg, dd, cam_m, None)
            bins = rp.face_bins(faces, H, W)
            o = call(faces, attrs, bins[:2])
            outs.append(o[0][:8, :1])
            eps = (o[1][0, 0] >> 30).astype(jnp.float32)
        return jnp.concatenate(outs)

    def measure(name, fn, *args):
        np.asarray(fn(*args))
        ld = f"/tmp/exp_fctx_{name}"
        shutil.rmtree(ld, ignore_errors=True)
        with trace(ld):
            np.asarray(fn(*args))
        rows = summarize_device_trace(ld)
        tot = sum(ms for ms, _, _ in rows) / REPS
        print(f"{tot:8.3f} ms/rep total  {name}")
        for ms, cnt, nm in sorted(rows, reverse=True)[:10]:
            print(f"    {ms:7.3f} ms (x{cnt})  {nm[:90]}")

    @jax.jit
    def prog_mixb(faces, attrs):
        # faces/attrs are program inputs; bins computed in-program.
        outs = []
        for _ in range(REPS):
            bins = rp.face_bins(faces, H, W)
            o = call(faces, attrs, bins[:2])
            outs.append(o[0][:8, :1])
            faces = chain(o, faces)
        return jnp.concatenate(outs)

    @jax.jit
    def prog_mixf(d, bins):
        # bins are program inputs; faces/attrs computed in-program.
        outs = []
        eps = jnp.float32(0)
        for _ in range(REPS):
            cam = dict(d["camera"])
            cam["position"] = cam["position"] + eps
            dd = dict(d)
            dd["camera"] = cam
            cam_m = pp._cam_matrices(cfg, cam, cfg.cam_projection_type)
            faces, attrs = pp._build_face_batch(cfg, dd, cam_m, None)
            o = call(faces, attrs, bins)
            outs.append(o[0][:8, :1])
            eps = (o[1][0, 0] >> 30).astype(jnp.float32)
        return jnp.concatenate(outs)

    @jax.jit
    def prog_inb(d):
        # Like prog_in, but an optimization barrier decouples the vertex
        # stage from the kernel call (tests producer-fusion/layout effects).
        outs = []
        eps = jnp.float32(0)
        for _ in range(REPS):
            cam = dict(d["camera"])
            cam["position"] = cam["position"] + eps
            dd = dict(d)
            dd["camera"] = cam
            cam_m = pp._cam_matrices(cfg, cam, cfg.cam_projection_type)
            faces, attrs = pp._build_face_batch(cfg, dd, cam_m, None)
            bins = rp.face_bins(faces, H, W)
            faces, attrs, bins2 = jax.lax.optimization_barrier(
                (faces, attrs, bins[:2]))
            o = call(faces, attrs, bins2)
            outs.append(o[0][:8, :1])
            eps = (o[1][0, 0] >> 30).astype(jnp.float32)
        return jnp.concatenate(outs)

    import os
    which = os.environ.get("VARIANTS", "in,inb").split(",")
    progs = {"in": (prog_in, (dyn,)), "inb": (prog_inb, (dyn,)),
             "pre": (prog_pre, (faces0, attrs0, bins0)),
             "mixb": (prog_mixb, (faces0, attrs0)),
             "mixf": (prog_mixf, (dyn, bins0))}
    for name in which:
        fn, args = progs[name]
        measure(name, fn, *args)


if __name__ == "__main__":
    main()
