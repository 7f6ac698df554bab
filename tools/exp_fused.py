"""Phase decomposition of the fused visibility+gbuffer+sampler kernel.

  full  : everything
  nosamp: z pass + interp, no texture sampling
  nogb  : z pass + phase-1 win scan only (no interp, no sampling)
  zonly : z pass only

Run WITH A MODE ARGUMENT (one process per mode): compiling several mode
variants of the kernel into one process trips the 16 MB scoped-VMEM
compiler limit that a single variant stays under.
  for m in full nosamp nogb zonly; do python tools/exp_fused.py $m; done
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpu_renderer.ops import raster_pallas as rp
from tools.exp_trace import run_traced_each

H = W = 1024


def main():
    from bench import build_scene
    from tpu_renderer.ops import pipeline as pp

    scene = build_scene()
    cfg, dyn = scene._prepare()
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)
    sign = cfg.system
    n_kinds = max(len(mc.win_kinds) for mc in cfg.models)

    @jax.jit
    def setup(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
        bins = rp.face_bins(faces, H, W)
        return faces, attrs, bins[:2]

    faces, attrs, bins = jax.tree_util.tree_map(jnp.asarray, setup(dyn))
    windows = dyn["windows_all"]

    def run(r, mode):
        fc = dict(faces, valid=faces["valid"] & (r >= 0))
        outs = rp.visibility_gbuffer_pallas(
            fc, attrs, H, W, sign, bins=bins, with_tex_tables=False,
            windows=windows, n_kinds=n_kinds, mode=mode)
        return outs[1]

    modes = sys.argv[1:] or ["full", "nosamp", "nogb", "zonly"]
    run_traced_each(
        [(m, lambda r, _, m=m: run(r, m)) for m in modes], (0,))


if __name__ == "__main__":
    main()
