"""Trace the shadow-path XLA glue at flagship scale: what costs 4 ms?

Pieces: prepare_quads, compact cond, pack_quads, _bin_quads, zmax prep,
stencil_pallas (bins + kernel).
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpu_renderer.ops import raster_pallas as rp
from tools.exp_trace import run_traced_each as run_traced

H = W = 1024


def main():
    from bench import build_scene
    from tpu_renderer.ops import pipeline as pp
    from tpu_renderer.ops.shadow import prepare_quads

    scene = build_scene()
    cfg, dyn = scene._prepare()
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)
    sign = cfg.system

    @jax.jit
    def setup(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
        bins = rp.face_bins(faces, H, W)
        zb_sign, tid = rp.visibility_pallas(faces, H, W, sign, bins=bins[:2])
        screen, counts, ok, n_sil, cap = prepare_quads(cfg, d, cam_m)
        cap = max(cap)  # largest compaction level (tuple since r5)
        return cam_m, zb_sign, screen, counts, ok, n_sil, cap

    cam_m, zb_sign, screen, counts, ok, n_sil, cap = setup(dyn)
    cap = int(cap)
    print(f"E_total={screen.shape[0]} sil_cap={cap} n_sil={int(n_sil)}")
    cam_m, zb_sign, screen, counts, ok = jax.tree_util.tree_map(
        jnp.asarray, (cam_m, zb_sign, screen, counts, ok))
    zbuf = zb_sign * sign
    near = float(np.asarray(dyn["camera"]["near"]))
    far = float(np.asarray(dyn["camera"]["far"]))

    scr_c, cnt_c, ok_c = screen[:cap], counts[:cap], ok[:cap]

    def mixf(a, r):
        return a + (r >> 30).astype(a.dtype)

    def prep(r, d):
        d = dict(d)
        cam = dict(d["camera"])
        cam["position"] = cam["position"] + (r >> 30).astype(jnp.float32)
        d["camera"] = cam
        cm = pp._cam_matrices(cfg, cam, cfg.cam_projection_type)
        s, c, o, n, _ = prepare_quads(cfg, d, cm)
        return s[:8, :1, :1]

    def packq(r, d):
        qd, qi = rp.pack_quads(mixf(scr_c, r), cnt_c, ok_c, H, W, near, far)
        return qd[:8, :1]

    @jax.jit
    def packed(scr):
        return rp.pack_quads(scr, cnt_c, ok_c, H, W, near, far)

    qdata, qi = jax.tree_util.tree_map(jnp.asarray, packed(scr_c))

    n_ty, n_tx = H // rp.TILE_H, W // rp.TILE_W
    zb_pad = (zbuf * sign)
    finite = zb_pad < 3e38
    sub = min(rp._STEN_SUB, rp._STEN_TH)
    zmax_sub = jnp.asarray(jnp.where(finite, zb_pad, -jnp.inf).reshape(
        -1, sub, n_tx, rp.TILE_W).max(axis=(1, 3)))

    def zprep(r, d):
        zp = mixf(zb_pad, r)
        fin = zp < 3e38
        zm = jnp.where(fin, zp, -jnp.inf).reshape(
            n_ty, rp.TILE_H, n_tx, rp.TILE_W).max(axis=(1, 3))
        return zm[:8, :1]

    def binq(r, d):
        cnt, ix = rp._bin_quads(mixf(qdata, r), qi, H, W,
                                zmax_sub=zmax_sub, sign=sign,
                                near=near, far=far)
        return ix[:8, :1]

    def sten(r, d):
        return rp.stencil_pallas(mixf(qdata, r), qi, mixf(zbuf, r), H, W,
                                 sign, near, far)

    run_traced([("prepare_quads", prep), ("pack_quads", packq),
                ("zmax_prep", zprep), ("bin_quads", binq),
                ("stencil_full", sten)], (dyn,))


if __name__ == "__main__":
    main()
