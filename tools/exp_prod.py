"""Trace the PRODUCTION kernels on identical flagship inputs.

fused      : visibility_gbuffer_pallas (grid (ty,tx,2), 3 outputs)
split      : visibility_pallas + gbuffer_pallas (two kernels, same math)
sampler    : sample_textures_pallas
stencil    : stencil_pallas (compact quads)
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpu_renderer.ops import raster_pallas as rp
from tools.exp_trace import run_traced

H = W = 1024


def main():
    from bench import build_scene
    from tpu_renderer.ops import pipeline as pp
    from tpu_renderer.ops.shadow import prepare_quads

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
        zb_sign, tid = rp.visibility_pallas(faces, H, W, sign, bins=bins[:2])
        screen, counts, ok, n_sil, cap = prepare_quads(cfg, d, cam_m)
        cap = max(cap)  # largest compaction level (tuple since r5)
        qdata, qi = rp.pack_quads(screen[:cap], counts[:cap], ok[:cap],
                                  H, W, d["camera"]["near"],
                                  d["camera"]["far"])
        return faces, attrs, bins[:2], zb_sign, tid, qdata, qi

    faces, attrs, bins, zb_sign, tid, qdata, qi = jax.tree_util.tree_map(
        jnp.asarray, setup(dyn))
    windows = dyn["windows_all"]
    near = float(np.asarray(dyn["camera"]["near"]))
    far = float(np.asarray(dyn["camera"]["far"]))
    zbuf = zb_sign * sign

    def mix(fc, r):
        # Perturb a harmless traced input so reps don't CSE: valid &= r >= 0.
        return dict(fc, valid=fc["valid"] & (r >= 0))

    def fused(r, fc):
        zb, t, gb = rp.visibility_gbuffer_pallas(
            mix(fc, r), attrs, H, W, sign, bins=bins,
            with_tex_tables=False)
        return t

    def split(r, fc):
        fc = mix(fc, r)
        zb, t = rp.visibility_pallas(fc, H, W, sign, bins=bins)
        gb = rp.gbuffer_pallas(fc, attrs, t, H, W, bins=bins,
                               with_tex_tables=False)
        return gb[:1, :8, :1]

    def sampler(r, fc):
        samp, mask = rp.sample_textures_pallas(
            mix(fc, r), bins, windows, tid, zb_sign, zbuf, H, W, n_kinds,
            win_grid=_wg)
        return mask

    def stencil(r, fc):
        qd = qdata + (r >> 30).astype(jnp.float32)
        return rp.stencil_pallas(qd, qi, zbuf, H, W, sign, near, far)

    # sampler iu/iv: use the real G-buffer channels.
    @jax.jit
    def gbuf(fc):
        return rp.visibility_gbuffer_pallas(fc, attrs, H, W, sign, bins=bins,
                                            with_tex_tables=False)[2]
    gb = jnp.asarray(gbuf(faces))
    iu, iv = jnp.asarray(gb[rp.GB_IU]), jnp.asarray(gb[rp.GB_IV])

    def sampler2(r, fc):
        samp, mask = rp.sample_textures_pallas(
            mix(fc, r), bins, windows, tid, iu, iv, H, W, n_kinds,
            win_grid=_wg)
        return mask

    run_traced([("fused", fused), ("split", split),
                ("sampler", sampler2), ("stencil", stencil)], (faces,))


if __name__ == "__main__":
    main()
