"""Trace-based A/B of phase-0 kernel structures (see exp_trace.run_traced).

Variants:
  base      : full-tile visit, unconditional clip (round-2 structure)
  slabclip  : 16-row slabs + clip-skip branches (current production)
  zero      : base with zeroed counts -> per-program floor
  scalar    : loop visits every face but does only scalar reads + 1-row write
              -> loop + scalar-read floor
  big       : base on 128x256 tiles (32 programs instead of 128)
"""
from __future__ import annotations

import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from tpu_renderer.ops import raster_pallas as rp
from tpu_renderer.ops.raster_pallas import (
    _FSLAB, _I_COLS, _cdiv, _face_slabs, _face_tile_cov, _pad_rows_to,
    _visit_claim, _window_mask, pack_faces)
from tools.exp_trace import run_traced

H = W = 1024


def make_vis(variant, tile_h=64, tile_w=128):
    n_ty = _cdiv(H, tile_h)
    n_tx = _cdiv(W, tile_w)
    sign = -1

    def build(r, counts, idx, fdata, idata):
        chunk = fdata.shape[0]
        counts = counts + (r >> 30)          # defeat CSE across reps
        if variant == "zero":
            counts = counts * 0

        def kernel(counts_ref, idx_ref, fdata_ref, idata_ref, zb_ref,
                   tid_ref):
            ty = pl.program_id(0)
            tx = pl.program_id(1)
            count = counts_ref[ty * n_tx + tx]
            y0i = ty * tile_h
            x0 = (tx * tile_w).astype(jnp.float32)
            rows_t = jax.lax.broadcasted_iota(
                jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32) + \
                y0i.astype(jnp.float32)
            cols_t = jax.lax.broadcasted_iota(
                jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32) + x0
            rows_s = jax.lax.broadcasted_iota(
                jnp.int32, (_FSLAB, tile_w), 0).astype(jnp.float32)
            cols_s = jax.lax.broadcasted_iota(
                jnp.int32, (_FSLAB, tile_w), 1).astype(jnp.float32) + x0

            zb_ref[:] = jnp.full((tile_h, tile_w), jnp.inf, jnp.float32)
            tid_ref[:] = jnp.full((tile_h, tile_w), -1, jnp.int32)

            def claim_full(cov, z, flags, f):
                zs = z * sign
                upd = cov & (zb_ref[:] >= zs)
                tid_ref[:] = jnp.where(upd, idata_ref[f, 5], tid_ref[:])
                zb_ref[:] = jnp.where(upd & ((flags & 4) > 0), zs, zb_ref[:])

            if variant in ("base", "zero", "big"):
                def body(k, _):
                    f = idx_ref[0, k, 0]
                    flags = idata_ref[f, 4]
                    cov, z = _face_tile_cov(fdata_ref, f, rows_t, cols_t,
                                            False, with_clip=True)
                    cov &= _window_mask(idata_ref, f, rows_t, cols_t)
                    cov &= (flags & 1) > 0
                    claim_full(cov, z, flags, f)
                    return 0
            elif variant == "slabclip":
                def body(k, _):
                    f = idx_ref[0, k, 0]
                    flags = idata_ref[f, 4]
                    s_base, n_slabs = _face_slabs(idata_ref, f, y0i)

                    def slab(si, _):
                        s0 = jnp.minimum(s_base + si * _FSLAB,
                                         tile_h - _FSLAB)
                        rows = rows_s + (y0i + s0).astype(jnp.float32)

                        def apply(cov, z):
                            zs = z * sign
                            zb_s = zb_ref[pl.ds(s0, _FSLAB), :]
                            upd = cov & (zb_s >= zs)
                            tid_ref[pl.ds(s0, _FSLAB), :] = jnp.where(
                                upd, idata_ref[f, 5],
                                tid_ref[pl.ds(s0, _FSLAB), :])
                            zb_ref[pl.ds(s0, _FSLAB), :] = jnp.where(
                                upd & ((flags & 4) > 0), zs, zb_s)

                        _visit_claim(fdata_ref, idata_ref, f, flags, rows,
                                     cols_s, False, apply)
                        return 0

                    jax.lax.fori_loop(0, n_slabs, slab, 0)
                    return 0
            elif variant == "scalar":
                def body(k, _):
                    f = idx_ref[0, k, 0]
                    acc = idata_ref[f, 4] + idata_ref[f, 5]
                    for j in range(12):
                        acc += fdata_ref[f, j].astype(jnp.int32)
                    tid_ref[0, :] = jnp.full((tile_w,), acc, jnp.int32)
                    return 0

            jax.lax.fori_loop(0, count, body, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_ty, n_tx),
            in_specs=[
                pl.BlockSpec((1, chunk, 1),
                             lambda ty, tx, s: (ty * n_tx + tx, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, fdata.shape[1]),
                             lambda ty, tx, s: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, _I_COLS), lambda ty, tx, s: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_h, tile_w), lambda ty, tx, s: (ty, tx),
                             memory_space=pltpu.VMEM),
            ] * 2,
        )
        zb, tid = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((H, W), jnp.float32),
                jax.ShapeDtypeStruct((H, W), jnp.int32),
            ],
        )(counts, idx, fdata, idata)
        return tid

    return build


def main():
    from bench import build_scene
    from tpu_renderer.ops import pipeline as pp

    scene = build_scene()
    cfg, dyn = scene._prepare()
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)

    @jax.jit
    def setup(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, _ = pp._build_face_batch(cfg, d, cam_m, None)
        fdata, idata = pack_faces(faces, False)
        bins = rp.face_bins(faces, H, W)
        return fdata, idata, bins[0][0], bins[1][0]   # single chunk

    fdata, idata, counts, idx = jax.tree_util.tree_map(
        jnp.asarray, setup(dyn))
    g0 = fdata.shape[0]
    chunk = min(rp.FACE_CHUNK, -(-g0 // 128) * 128)
    fdata = jnp.asarray(_pad_rows_to(fdata, chunk))
    idata = jnp.asarray(_pad_rows_to(idata, chunk))

    # 128x256-tile bins: rebin with the big tile grid.
    @jax.jit
    def setup_big(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, _ = pp._build_face_batch(cfg, d, cam_m, None)
        c, i = rp.bin_primitives(faces["bbox"], faces["valid"], H, W,
                                 tile_h=128, tile_w=256)
        return c, i[:, :, None]
    counts_b, idx_b = jax.tree_util.tree_map(jnp.asarray, setup_big(dyn))

    variants = [
        ("base", make_vis("base")),
        ("slabclip", make_vis("slabclip")),
        ("zero", make_vis("zero")),
        ("scalar", make_vis("scalar")),
    ]
    run_traced(variants, (counts, idx, fdata, idata))
    print("--- big tiles (128x256, 32 programs) ---")
    run_traced([("big", make_vis("big", 128, 256))],
               (counts_b, idx_b, fdata, idata))


if __name__ == "__main__":
    main()
