"""Does splitting the frame into prep + render programs fix the fused
kernel's context slowdown?

  mono : one jit program computes faces/attrs/bins AND runs the kernel
  split: program A materializes faces/attrs/bins as outputs; program B
         consumes them as inputs and runs the kernel

Each variant runs 6 separate executions (no chaining needed across
executions), traced; prints per-instance kernel ms.
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

    def build(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
        bins = rp.face_bins(faces, H, W)
        return faces, attrs, bins[:2]

    def call(faces, attrs, bins):
        o = rp.visibility_gbuffer_pallas(
            faces, attrs, H, W, sign, bins=bins, windows=windows, win_grid=_wg,
            n_kinds=n_kinds, with_tex_tables=False)
        return o[0][:8, :1]

    prep = jax.jit(build)
    render = jax.jit(call)

    @jax.jit
    def mono(d):
        return call(*build(d))

    def measure(name, fn):
        np.asarray(fn())                      # warm / compile
        ld = f"/tmp/exp_split_{name}"
        shutil.rmtree(ld, ignore_errors=True)
        with trace(ld):
            for _ in range(REPS):
                out = fn()
            np.asarray(out)
        rows = summarize_device_trace(ld)
        agg = {}
        for ms, cnt, nm in rows:
            agg[nm] = agg.get(nm, 0.0) + ms
        tot = sum(agg.values()) / REPS
        print(f"{tot:8.3f} ms/exec total  {name}")
        for nm, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:4]:
            print(f"    {ms / REPS:7.3f} ms/exec  {nm[:90]}")

    def run_mono():
        return mono(dyn)

    def run_split():
        faces, attrs, bins = prep(dyn)
        return render(faces, attrs, bins)

    measure("mono", run_mono)
    measure("split", run_split)
    measure("mono2", run_mono)
    measure("split2", run_split)


if __name__ == "__main__":
    main()
