"""Within-process A/B of phase-0 (z+id) kernel structures on flagship data.

Variants:
  A: full-tile visit, unconditional clip (round-2 baseline structure)
  B: full-tile visit, clip-skip branch (flags bit 8)
  C: 16-row slab loop, clip-skip branch (current production structure)
  D: full-tile, no clip at all (lower bound for the clip cost)
  E: full-tile, clip always, but no window mask / flag tests (op floor probe)
"""
from __future__ import annotations

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")

from tpu_renderer.ops import raster_pallas as rp
from tpu_renderer.ops.raster_pallas import (
    TILE_H, TILE_W, _FSLAB, _I_COLS, _cdiv, _face_slabs, _face_tile_cov,
    _pad_rows_to, _visit_claim, _window_mask, pack_faces)


def make_vis(variant, height, width, sign):
    n_ty = _cdiv(height, TILE_H)
    n_tx = _cdiv(width, TILE_W)

    def build(faces, bins):
        fdata = pack_faces(faces, False)
        g0 = fdata.shape[0]
        chunk = min(rp.FACE_CHUNK, -(-g0 // 128) * 128)
        fdata = _pad_rows_to(fdata, chunk)
        idata = _pad_rows_to(idata, chunk)
        counts, idx = bins
        n_chunks = fdata.shape[0] // chunk
        counts1 = jnp.concatenate([counts.reshape(-1),
                                   jnp.zeros(1, jnp.int32)])

        def kernel(counts_ref, idx_ref, fdata_ref, idata_ref, zb_ref,
                   tid_ref):
            ty = pl.program_id(0)
            tx = pl.program_id(1)
            c = pl.program_id(2)
            count = counts_ref[c * (n_ty * n_tx) + ty * n_tx + tx]
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

            @pl.when(c == 0)
            def _():
                zb_ref[:] = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)
                tid_ref[:] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)

            def claim_full(cov, z, flags, f):
                zs = z * sign
                upd = cov & (zb_ref[:] >= zs)
                tid_ref[:] = jnp.where(upd, idata_ref[f, 5], tid_ref[:])
                zb_ref[:] = jnp.where(upd & ((flags & 4) > 0), zs, zb_ref[:])

            if variant == "A":
                def body(k, _):
                    f = idx_ref[0, 0, k, 0]
                    flags = idata_ref[f, 4]
                    cov, z = _face_tile_cov(fdata_ref, f, rows_t, cols_t,
                                            False, with_clip=True)
                    cov &= _window_mask(idata_ref, f, rows_t, cols_t)
                    cov &= (flags & 1) > 0
                    claim_full(cov, z, flags, f)
                    return 0
            elif variant == "B":
                def body(k, _):
                    f = idx_ref[0, 0, k, 0]
                    flags = idata_ref[f, 4]
                    _visit_claim(fdata_ref, idata_ref, f, flags, rows_t,
                                 cols_t, False,
                                 lambda cov, z: claim_full(cov, z, flags, f))
                    return 0
            elif variant == "C":
                def body(k, _):
                    f = idx_ref[0, 0, k, 0]
                    flags = idata_ref[f, 4]
                    s_base, n_slabs = _face_slabs(idata_ref, f, y0i)

                    def slab(si, _):
                        s0 = jnp.minimum(s_base + si * _FSLAB,
                                         TILE_H - _FSLAB)
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
            elif variant == "D":
                def body(k, _):
                    f = idx_ref[0, 0, k, 0]
                    flags = idata_ref[f, 4]
                    cov, z = _face_tile_cov(fdata_ref, f, rows_t, cols_t,
                                            False, with_clip=False)
                    cov &= _window_mask(idata_ref, f, rows_t, cols_t)
                    cov &= (flags & 1) > 0
                    claim_full(cov, z, flags, f)
                    return 0
            elif variant == "E":
                def body(k, _):
                    f = idx_ref[0, 0, k, 0]
                    flags = idata_ref[f, 4]
                    cov, z = _face_tile_cov(fdata_ref, f, rows_t, cols_t,
                                            False, with_clip=True)
                    claim_full(cov, z, flags, f)
                    return 0

            jax.lax.fori_loop(0, count, body, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_ty, n_tx, n_chunks),
            in_specs=[
                pl.BlockSpec((1, 1, chunk, 1),
                             lambda ty, tx, c, s: (c, ty * n_tx + tx, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, fdata.shape[1]),
                             lambda ty, tx, c, s: (c, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk, _I_COLS), lambda ty, tx, c, s: (c, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, c, s: (ty, tx),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, c, s: (ty, tx),
                             memory_space=pltpu.VMEM),
            ],
        )
        zb, tid = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((n_ty * TILE_H, n_tx * TILE_W),
                                     jnp.float32),
                jax.ShapeDtypeStruct((n_ty * TILE_H, n_tx * TILE_W),
                                     jnp.int32),
            ],
        )(counts1, idx, fdata, idata)
        return zb[:height, :width], tid[:height, :width]

    return build


def main():
    from bench import build_scene
    from tpu_renderer.ops import pipeline as pp

    scene = build_scene()
    cfg, dyn = scene._prepare()
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)
    H, W = cfg.resolution
    sign = cfg.system

    @jax.jit
    def setup(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
        bins = rp.face_bins(faces, H, W)
        return faces, bins[:2]

    faces, bins = jax.tree_util.tree_map(jnp.asarray, setup(dyn))

    # Probe the floors: zeroed counts = pure grid/program overhead;
    # halved counts = per-visit linearity check.
    fnA = jax.jit(make_vis("A", H, W, sign))
    for label, cnts in (("zero-counts", jnp.zeros_like(bins[0])),
                        ("half-counts", bins[0] // 2),
                        ("full-counts", bins[0])):
        out = fnA(faces, (cnts, bins[1]))
        np.asarray(out[0]).ravel()[:4]
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            outs = [fnA(faces, (cnts, bins[1])) for _ in range(50)]
            np.asarray(outs[-1][0]).ravel()[:4]
            best = min(best, (time.time() - t0) / 50)
        print(f"A {label}: {best*1e3:7.3f} ms")

    ref = None
    for v in ("A", "B", "C", "D", "E", "A", "B", "C"):
        fn = jax.jit(make_vis(v, H, W, sign))
        out = fn(faces, bins)
        np.asarray(out[0]).ravel()[:4]
        best = np.inf
        for _ in range(3):
            t0 = time.time()
            outs = [fn(faces, bins) for _ in range(50)]
            np.asarray(outs[-1][0]).ravel()[:4]
            best = min(best, (time.time() - t0) / 50)
        if v == "A" and ref is None:
            ref = jax.tree_util.tree_map(np.asarray, out)
        match = ""
        if ref is not None and v in "BC":
            o = jax.tree_util.tree_map(np.asarray, out)
            match = f"  tid_match={float((o[1] == ref[1]).mean()):.6f}"
        print(f"variant {v}: {best*1e3:7.3f} ms{match}")


if __name__ == "__main__":
    main()
