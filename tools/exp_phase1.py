"""Trace-based A/B of the G-buffer phase-1 structure.

Theory: `pl.when(jnp.any(win))` per visit forces a vector->scalar reduce
round-trip that stalls the scalar core's run-ahead every iteration; phase 0
(no data-dependent branch) runs at ~80 cyc/visit while the fused kernel
spends ~5 ms in phase 1.

Variants (phase 1 only, given tid from the production kernel):
  when_full : current structure pre-slab (when(any(win)), full-tile puts)
  when_slab : current production (when(any(win)) per 16-row slab)
  nowhen_slab: no branch at all — unconditional masked puts on slabs
  nowhen_full: no branch, full-tile puts
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from tpu_renderer.ops import raster_pallas as rp
from tpu_renderer.ops.raster_pallas import (
    GB_CHANNELS, _FSLAB, _I_COLS, _cdiv, _face_slabs, _gb_interp_face,
    _pad_rows_to, pack_face_attrs, pack_faces)
from tools.exp_trace import run_traced

H = W = 1024
TILE_H, TILE_W = rp.TILE_H, rp.TILE_W


def make_gb(variant, X):
    n_ty = _cdiv(H, TILE_H)
    n_tx = _cdiv(W, TILE_W)

    def build(r, counts, idx, fdata, idata, tid):
        chunk = fdata.shape[0]
        counts = counts + (r >> 30)

        def kernel(counts_ref, idx_ref, fdata_ref, idata_ref, tid_ref,
                   gb_ref):
            ty = pl.program_id(0)
            tx = pl.program_id(1)
            count = counts_ref[ty * n_tx + tx]
            y0i = ty * TILE_H
            x0 = (tx * TILE_W).astype(jnp.float32)
            rows_t = jax.lax.broadcasted_iota(
                jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32) + \
                y0i.astype(jnp.float32)
            cols_t = jax.lax.broadcasted_iota(
                jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32) + x0
            rows_s = jax.lax.broadcasted_iota(
                jnp.int32, (_FSLAB, TILE_W), 0).astype(jnp.float32)
            cols_s = jax.lax.broadcasted_iota(
                jnp.int32, (_FSLAB, TILE_W), 1).astype(jnp.float32) + x0

            gb_ref[:] = jnp.zeros((GB_CHANNELS, TILE_H, TILE_W), jnp.float32)

            def gbody(k, _):
                f = idx_ref[0, k, 0]
                gid = idata_ref[f, 5]

                if variant.endswith("full"):
                    win = tid_ref[:] == gid

                    def put(ch, val):
                        gb_ref[ch, :, :] = jnp.where(win, val,
                                                     gb_ref[ch, :, :])

                    if variant == "when_full":
                        @pl.when(jnp.any(win))
                        def _():
                            _gb_interp_face(fdata_ref, f, X, rows_t, cols_t,
                                            put, False)
                    else:
                        _gb_interp_face(fdata_ref, f, X, rows_t, cols_t,
                                        put, False)
                else:
                    s_base, n_slabs = _face_slabs(idata_ref, f, y0i)

                    def slab(si, _):
                        s0 = jnp.minimum(s_base + si * _FSLAB,
                                         TILE_H - _FSLAB)
                        win = tid_ref[pl.ds(s0, _FSLAB), :] == gid
                        rows = rows_s + (y0i + s0).astype(jnp.float32)

                        def put(ch, val):
                            gb_ref[ch, pl.ds(s0, _FSLAB), :] = jnp.where(
                                win, val, gb_ref[ch, pl.ds(s0, _FSLAB), :])

                        if variant == "when_slab":
                            @pl.when(jnp.any(win))
                            def _():
                                _gb_interp_face(fdata_ref, f, X, rows,
                                                cols_s, put, False)
                        else:
                            _gb_interp_face(fdata_ref, f, X, rows, cols_s,
                                            put, False)
                        return 0

                    jax.lax.fori_loop(0, n_slabs, slab, 0)
                return 0

            jax.lax.fori_loop(0, count, gbody, 0)

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
                pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, s: (ty, tx),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((GB_CHANNELS, TILE_H, TILE_W),
                             lambda ty, tx, s: (0, ty, tx),
                             memory_space=pltpu.VMEM),
            ],
        )
        (gb,) = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((GB_CHANNELS, H, W),
                                            jnp.float32)],
        )(counts, idx, fdata, idata, tid)
        return gb

    return build


def main():
    from bench import build_scene
    from tpu_renderer.ops import pipeline as pp

    scene = build_scene()
    cfg, dyn = scene._prepare()
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)
    sign = cfg.system

    @jax.jit
    def setup(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
        fdata0 = pack_faces(faces, False)
        fdata = jnp.concatenate([fdata0, pack_face_attrs(attrs)], axis=1)
        bins = rp.face_bins(faces, H, W)
        _, tid = rp.visibility_pallas(faces, H, W, sign, bins=bins[:2])
        return fdata, idata, bins[0][0], bins[1][0], tid, fdata0.shape[1]

    fdata, idata, counts, idx, tid, X = jax.tree_util.tree_map(
        jnp.asarray, setup(dyn))
    X = int(X)
    print("X (base cols) =", X)
    g0 = fdata.shape[0]
    chunk = min(rp.FACE_CHUNK, -(-g0 // 128) * 128)
    fdata = jnp.asarray(_pad_rows_to(fdata, chunk))
    idata = jnp.asarray(_pad_rows_to(idata, chunk))

    variants = [(v, make_gb(v, X))
                for v in ("when_full", "when_slab", "nowhen_slab",
                          "nowhen_full")]
    run_traced(variants, (counts, idx, fdata, idata, tid))


if __name__ == "__main__":
    main()
