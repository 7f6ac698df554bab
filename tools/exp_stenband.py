"""Sub-slab band statistics for stencil visits on the crowd scene.

For each kept (tile, quad) pair, how many of the tile's _STEN_TH/_STEN_SUB
sub-slabs does the quad actually cover (per _bin_quads' exact coverage +
z-occlusion keep)? The stencil kernel currently pays full-tile vector work
per visit; if the mean covered band is ~1-2 of 4 sub-slabs, encoding the
band in the bin entry cuts the kernel's vector work proportionally.

Usage: python tools/exp_stenband.py [N_INST] [CAM_H]
"""
from __future__ import annotations

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax"))

H = W = 1024


def main():
    from bench import build_highpoly_scene
    from tpu_renderer.ops import pipeline as pp
    from tpu_renderer.ops import raster_pallas as rp
    from tpu_renderer.ops.shadow import prepare_quads

    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cam_h = float(sys.argv[2]) if len(sys.argv) > 2 else 4.5
    scene = build_highpoly_scene(n_inst, cam_height=cam_h)
    cfg, dyn = scene._prepare()
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)
    sign = cfg.system

    @jax.jit
    def stats(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, _ = pp._build_face_batch(cfg, d, cam_m, None)
        bins = rp.face_bins(faces, H, W)
        zb_sign, _ = rp.visibility_pallas(faces, H, W, sign, bins=bins[:2])
        screen, counts_q, ok, n_sil, sil_cap = prepare_quads(cfg, d, cam_m)
        cap = max(sil_cap)
        qdata, qi = rp.pack_quads(screen[:cap], counts_q[:cap], ok[:cap],
                                  H, W, d["camera"]["near"],
                                  d["camera"]["far"])
        e0 = qdata.shape[0]
        chunk = min(rp.FACE_CHUNK, -(-e0 // 128) * 128)
        qd = rp._pad_rows_to(qdata, chunk)
        qip = rp._pad_rows_to(qi, chunk)
        n_ty = -(-H // rp._STEN_TH)
        n_tx = -(-W // rp.TILE_W)
        zb_pad = jnp.full((n_ty * rp._STEN_TH, n_tx * rp.TILE_W), jnp.inf,
                          jnp.float32).at[:H, :W].set(zb_sign * sign)
        finite = zb_pad < 3e38
        sub = min(rp._STEN_SUB, rp._STEN_TH)
        S = rp._STEN_TH // sub
        zmax_sub = jnp.where(finite, zb_pad, -jnp.inf).reshape(
            n_ty * S, sub, n_tx, rp.TILE_W).max(axis=(1, 3))
        hist = jnp.zeros(S + 1, jnp.int32)
        tot_band = jnp.int32(0)
        tot_pairs = jnp.int32(0)
        for c in range(qd.shape[0] // chunk):
            sl = slice(c * chunk, (c + 1) * chunk)
            keep_sub = rp._bin_quads(
                qd[sl], qip[sl], H, W, zmax_sub=zmax_sub, sign=sign,
                near=d["camera"]["near"], far=d["camera"]["far"],
                debug_keep=True)                     # (TyS, Tx, E)
            ks = keep_sub.reshape(n_ty, S, n_tx, -1)
            any_k = ks.any(axis=1)
            si = jnp.arange(S, dtype=jnp.int32)[None, :, None, None]
            lo = jnp.min(jnp.where(ks, si, S), axis=1)
            hi = jnp.max(jnp.where(ks, si, -1), axis=1)
            band = jnp.where(any_k, hi - lo + 1, 0)
            nsub = ks.sum(axis=1)                     # covered sub-slabs
            hist = hist + jnp.stack(
                [jnp.where(any_k, band == b, False).sum(dtype=jnp.int32)
                 for b in range(S + 1)])
            tot_band = tot_band + jnp.where(any_k, band, 0).sum(
                dtype=jnp.int32)
            tot_pairs = tot_pairs + any_k.sum(dtype=jnp.int32)
        return hist, tot_band, tot_pairs

    hist, tot_band, tot_pairs = [np.asarray(x) for x in stats(dyn)]
    print(f"cam_h={cam_h}: visits={int(tot_pairs)} "
          f"mean_band={int(tot_band) / max(int(tot_pairs), 1):.2f} "
          f"band_hist(1..S)={hist[1:].tolist()}")


if __name__ == "__main__":
    main()
