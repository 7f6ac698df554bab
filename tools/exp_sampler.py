"""Isolate the sampler kernel's cost components on the flagship frame.

Variants of sample_textures_pallas:
  full      : as shipped
  nodma     : skip all window DMAs (sample from stale scratch)
  nosweep   : DMAs + slab scan, but skip the gather sweep
  noscan    : bins loop only (no slab work at all)
Each runs with a perturbed tid input so reps can't CSE.
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
    _wg = all(mc.win_grid for mc in cfg.models if mc.win_kinds)
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)
    sign = cfg.system
    n_kinds = max(len(mc.win_kinds) for mc in cfg.models)

    @jax.jit
    def setup(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
        bins = rp.face_bins(faces, H, W)
        zb, tid, gb = rp.visibility_gbuffer_pallas(
            faces, attrs, H, W, sign, bins=bins[:2], with_tex_tables=False)
        return faces, bins[:2], tid, gb[rp.GB_IU], gb[rp.GB_IV]

    faces, bins, tid, iu, iv = jax.tree_util.tree_map(jnp.asarray,
                                                      setup(dyn))
    windows = dyn["windows_all"]

    def run(r, mode):
        t = tid + (r >> 30)
        samp, mask = rp.sample_textures_pallas(
            faces, bins, windows, t, iu, iv, H, W, n_kinds, mode=mode,
            win_grid=_wg)
        return mask

    run_traced_each(
        [(m, lambda r, _, m=m: run(r, m))
         for m in ("full", "nodma", "nosweep", "noscan")], (0,))


if __name__ == "__main__":
    main()
