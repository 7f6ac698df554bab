"""Compile-and-diff: fused kernel's custom-call context, pre vs in-program.

Prints the tpu_custom_call lines (+ operand producers) of both programs'
optimized HLO so layout/copy/alias differences are visible.
"""
from __future__ import annotations

import re
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpu_renderer.ops import raster_pallas as rp

H = W = 1024


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

    faces0, attrs0, bins0 = jax.tree_util.tree_map(np.asarray, setup(dyn))

    def call(faces, attrs, bins):
        return rp.visibility_gbuffer_pallas(
            faces, attrs, H, W, sign, bins=bins, windows=windows, win_grid=_wg,
            n_kinds=n_kinds, with_tex_tables=False)

    @jax.jit
    def prog_pre(faces, attrs, bins):
        o = call(faces, attrs, bins)
        return o[0][:8, :1], o[1][0, 0]

    @jax.jit
    def prog_in(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
        bins = rp.face_bins(faces, H, W)
        o = call(faces, attrs, bins[:2])
        return o[0][:8, :1], o[1][0, 0]

    def dump(name, lowered):
        txt = lowered.compile().as_text()
        print(f"===== {name} =====")
        lines = txt.splitlines()
        ops = {}
        for ln in lines:
            m = re.match(r"\s*(?:ROOT )?%([\w.\-]+) = ", ln)
            if m:
                ops[m.group(1)] = ln.strip()
        for ln in lines:
            if "tpu_custom_call" in ln:
                args = re.search(r"custom-call\(([^)]*)\)", ln)
                print("CALL:", ln.strip()[:240])
                if args:
                    for a in args.group(1).split(", "):
                        a = a.strip().lstrip("%")
                        prod = ops.get(a, "<?>")
                        print(f"  operand {a}: {prod[:220]}")
        n_s1 = sum("S(1)" in ln for ln in lines)
        print(f"[{name}] S(1) annotations: {n_s1}  lines: {len(lines)}")

    dump("pre", prog_pre.lower(faces0, attrs0, bins0))
    dump("in", prog_in.lower(dyn))


if __name__ == "__main__":
    main()
