"""Measure phase1_keep's keep-rate and stencil bin-count distribution on the
crowd scene (VERDICT r4 #2: is the z-interval prune biting at 100k faces?).

Prints, per camera height (4.5 = overview/low occlusion, 1.5 = through the
crowd/high depth complexity):
- phase-1 keep fraction (faces surviving the z-interval prune),
- stencil bin stats: counts.max() over (chunk, tile) — what the round-5
  idx-cap slicing keys on — and the mean active entries per tile.

Run on the TPU (or CPU with a small n_inst).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax"))

import jax
import jax.numpy as jnp

from bench import build_highpoly_scene

n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 20

for cam_h in (4.5, 1.5):
    s = build_highpoly_scene(n_inst, cam_height=cam_h)
    cfg, dyn = s._prepare()

    from tpu_renderer.ops import raster_pallas as rp
    from tpu_renderer.ops.pipeline import (_build_face_batch, _cam_matrices,
                                           render_frame)
    from tpu_renderer.ops.shadow import prepare_quads

    @jax.jit
    def stats(d):
        cam_m = _cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, _ = _build_face_batch(cfg, d, cam_m, None)
        height, width = cfg.resolution
        sign = cfg.system
        bins = rp.face_bins(faces, height, width)
        zb_sign, tid = rp.visibility_pallas(faces, height, width, sign,
                                            bins=bins[:2])
        keep = rp.phase1_keep(faces, zb_sign, height, width, sign)
        bins1 = rp.face_bins(faces, height, width, keep=keep)
        visits0 = bins[0].sum()
        visits1 = bins1[0].sum()
        valid = faces["valid"]
        # Stencil side: quads after compaction, then bin counts.
        prepared = prepare_quads(cfg, d, cam_m)
        screen, counts_q, ok, n_sil, sil_cap = prepared
        sil_cap = max(sil_cap)
        scr = screen[:sil_cap]
        qdata, qi = rp.pack_quads(scr, counts_q[:sil_cap], ok[:sil_cap],
                                  height, width, d["camera"]["near"],
                                  d["camera"]["far"])
        e0 = qdata.shape[0]
        chunk = min(rp.FACE_CHUNK, -(-e0 // 128) * 128)
        qd = rp._pad_rows_to(qdata, chunk)
        qip = rp._pad_rows_to(qi, chunk)
        n_ty = -(-height // rp._STEN_TH)
        n_tx = -(-width // rp.TILE_W)
        zb_pad = jnp.full((n_ty * rp._STEN_TH, n_tx * rp.TILE_W), jnp.inf,
                          jnp.float32).at[:height, :width].set(zb_sign)
        finite = zb_pad < 3e38
        sub = min(rp._STEN_SUB, rp._STEN_TH)
        zmax_sub = jnp.where(finite, zb_pad, -jnp.inf).reshape(
            n_ty * (rp._STEN_TH // sub), sub, n_tx, rp.TILE_W).max(
                axis=(1, 3))
        bc = []
        for c in range(qd.shape[0] // chunk):
            sl = slice(c * chunk, (c + 1) * chunk)
            cnt, _ = rp._bin_quads(qd[sl], qip[sl], height, width,
                                   zmax_sub=zmax_sub, sign=sign,
                                   near=d["camera"]["near"],
                                   far=d["camera"]["far"])
            bc.append(cnt)
        bc = jnp.stack(bc)
        return ((keep & valid).sum(), valid.sum(), visits0, visits1, n_sil,
                jnp.int32(e0), bc.max(), bc.mean(), jnp.int32(chunk))

    out = [np.asarray(x) for x in stats(dyn)]
    kept, valid, v0, v1, n_sil, e0, bmax, bmean, chunk = out
    print(f"cam_h={cam_h}: keep {int(kept)}/{int(valid)} valid "
          f"({int(kept)/max(int(valid),1):.1%}) | phase1 visits "
          f"{int(v0)} -> {int(v1)} ({int(v1)/max(int(v0),1):.1%}) | "
          f"n_sil={int(n_sil)} quad_rows={int(e0)} chunk={int(chunk)} "
          f"sten-bin counts max={int(bmax)} mean={float(bmean):.1f}")
