"""Additive wall-clock ledger of the 100k-face crowd frame (bench row 5).

Per-op traces double-count ops nested in lax.cond (CLAUDE.md), so this
measures STAGED SUB-PROGRAMS by wall clock in one process (chained reps,
pipelined enqueue, one sync) and prints the stage diffs:

  setup   : cam matrices + face batch + bins (vertex/frustum/sort)
  vis     : + visibility_pallas (phase 0)
  keep    : + phase1_keep + re-bin (split-pipeline glue)
  gb      : + phase-1 G-buffer/sampler kernel
  noshad  : full render_frame, shadows off
  full    : full render_frame, shadows on

Usage: python tools/exp_crowd_budget.py [N_INST] [CAM_H]
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax"))

H = W = 1024
REPS = 8
ROUNDS = 4


def main():
    import dataclasses

    from bench import build_highpoly_scene
    from tpu_renderer.ops import pipeline as pp
    from tpu_renderer.ops import raster_pallas as rp
    from tpu_renderer.ops.pipeline import render_frame

    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cam_h = float(sys.argv[2]) if len(sys.argv) > 2 else 4.5
    scene = build_highpoly_scene(n_inst, cam_height=cam_h)
    cfg, dyn = scene._prepare()
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)
    sign = cfg.system
    cfg_ns = dataclasses.replace(cfg, shadows=False)

    excluded = pp.sampler_excluded_models(cfg.models)
    _texm = [mc for i, mc in enumerate(cfg.models)
             if mc.win_kinds and i not in excluded]
    n_kinds = max((len(mc.win_kinds) for mc in _texm), default=0)
    win_grid = bool(_texm) and all(mc.win_grid for mc in _texm)
    two_groups = any(mc.win2 for i, mc in enumerate(cfg.models)
                     if i not in excluded)

    def stage(depth):
        def fn(d, bump):
            cam = dict(d["camera"], position=d["camera"]["position"] + bump)
            d = dict(d, camera=cam)
            cam_m = pp._cam_matrices(cfg, d["camera"],
                                     cfg.cam_projection_type)
            faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
            bins = rp.face_bins(faces, H, W,
                                with_debug=cfg.has_debug_camera)
            if depth == 0:
                return bins[0].sum() + faces["bbox"][0, 0]
            zb_sign, tid = rp.visibility_pallas(
                faces, H, W, sign, with_debug=cfg.has_debug_camera,
                bins=bins[:2])
            if depth == 1:
                return tid[0, 0] + zb_sign[0, 0].astype(jnp.int32)
            keep = rp.phase1_keep(faces, zb_sign, H, W, sign)
            bins1 = rp.face_bins(faces, H, W,
                                 with_debug=cfg.has_debug_camera, keep=keep)
            if depth == 2:
                return bins1[0].sum() + tid[0, 0]
            outs = rp.visibility_gbuffer_pallas(
                faces, attrs, H, W, sign,
                with_debug=cfg.has_debug_camera,
                with_tex_tables=bool(excluded), windows=d["windows_all"],
                n_kinds=n_kinds, two_groups=two_groups, win_grid=win_grid,
                bins=bins1[:2], tid_in=tid)
            gbuffer, samp, samp_mask = outs
            return (gbuffer[0, 0, 0].astype(jnp.int32) + samp[0, 0, 0]
                    + tid[0, 0])
        return fn

    def frame(cfg_v):
        def fn(d, bump):
            cam = dict(d["camera"], position=d["camera"]["position"] + bump)
            d = dict(d, camera=cam)
            return render_frame(cfg_v, d)[0][0, 0, 0].astype(jnp.int32)
        return fn

    def shadow_stage(depth):
        """setup + vis + shadow sub-chain (no gb): prep / pack+bin / kernel."""
        from tpu_renderer.ops.shadow import prepare_quads

        def fn(d, bump):
            cam = dict(d["camera"], position=d["camera"]["position"] + bump)
            d = dict(d, camera=cam)
            cam_m = pp._cam_matrices(cfg, d["camera"],
                                     cfg.cam_projection_type)
            faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
            bins = rp.face_bins(faces, H, W,
                                with_debug=cfg.has_debug_camera)
            zb_sign, tid = rp.visibility_pallas(
                faces, H, W, sign, with_debug=cfg.has_debug_camera,
                bins=bins[:2])
            screen, counts, ok, n_sil, sil_cap = prepare_quads(cfg, d, cam_m)
            if depth == 0:
                return (screen[0, 0, 0].astype(jnp.int32) + counts[0]
                        + tid[0, 0])
            cap = max(sil_cap)
            qdata, qi = rp.pack_quads(screen[:cap], counts[:cap], ok[:cap],
                                      H, W, d["camera"]["near"],
                                      d["camera"]["far"])
            if depth == 1:
                return qdata[0, 0].astype(jnp.int32) + qi[0, 0] + tid[0, 0]
            st = rp.stencil_pallas(qdata, qi, zb_sign * sign, H, W, sign,
                                   d["camera"]["near"], d["camera"]["far"])
            return st[0, 0] + tid[0, 0]
        return fn

    def bins_stage():
        """setup + vis + pack + the stencil call's XLA prep (bin each chunk
        raw, concat, global sort, cap-slice) WITHOUT the kernel — the wall
        split of stencil_pallas's ~26 ms into prep vs kernel."""
        from tpu_renderer.ops.shadow import prepare_quads

        def fn(d, bump):
            cam = dict(d["camera"], position=d["camera"]["position"] + bump)
            d = dict(d, camera=cam)
            cam_m = pp._cam_matrices(cfg, d["camera"],
                                     cfg.cam_projection_type)
            faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
            bins = rp.face_bins(faces, H, W,
                                with_debug=cfg.has_debug_camera)
            zb_sign, tid = rp.visibility_pallas(
                faces, H, W, sign, with_debug=cfg.has_debug_camera,
                bins=bins[:2])
            screen, counts_q, ok, n_sil, sil_cap = prepare_quads(cfg, d,
                                                                 cam_m)
            cap0 = max(sil_cap)
            qdata, qi = rp.pack_quads(screen[:cap0], counts_q[:cap0],
                                      ok[:cap0], H, W, d["camera"]["near"],
                                      d["camera"]["far"])
            e0 = qdata.shape[0]
            chunk = min(rp.FACE_CHUNK, -(-e0 // 128) * 128)
            qd = rp._pad_rows_to(qdata, chunk)
            qip = rp._pad_rows_to(qi, chunk)
            n_ty = -(-H // rp._STEN_TH)
            n_tx = -(-W // rp.TILE_W)
            zb_pad = jnp.full((n_ty * rp._STEN_TH, n_tx * rp.TILE_W),
                              jnp.inf, jnp.float32
                              ).at[:H, :W].set(zb_sign * sign)
            finite = zb_pad < 3e38
            sub = min(rp._STEN_SUB, rp._STEN_TH)
            zmax_sub = jnp.where(finite, zb_pad, -jnp.inf).reshape(
                n_ty * (rp._STEN_TH // sub), sub, n_tx, rp.TILE_W
                ).max(axis=(1, 3))
            counts_l, idx_l = [], []
            for c in range(qd.shape[0] // chunk):
                sl = slice(c * chunk, (c + 1) * chunk)
                cnt, ix = rp._bin_quads(qd[sl], qip[sl], H, W,
                                        zmax_sub=zmax_sub, sign=sign,
                                        near=d["camera"]["near"],
                                        far=d["camera"]["far"],
                                        q_base=c * chunk, sort=False)
                counts_l.append(cnt)
                idx_l.append(ix)
            counts = sum(counts_l)
            entries = jnp.concatenate(idx_l, axis=1)
            idx = jax.lax.sort(entries, dimension=1)[..., None]
            sliced = idx[:, :8192, :]
            return (counts.sum() + sliced[0, 0, 0] + sliced[-1, -1, 0]
                    + tid[0, 0])
        return fn

    def gb_variant(windows_on, tables_on):
        """setup + vis + keep + gb with the sampler or gather toggled —
        how much of the gb stage is texture sampling vs interpolation."""
        def fn(d, bump):
            cam = dict(d["camera"], position=d["camera"]["position"] + bump)
            d = dict(d, camera=cam)
            cam_m = pp._cam_matrices(cfg, d["camera"],
                                     cfg.cam_projection_type)
            faces, attrs = pp._build_face_batch(cfg, d, cam_m, None)
            bins = rp.face_bins(faces, H, W,
                                with_debug=cfg.has_debug_camera)
            zb_sign, tid = rp.visibility_pallas(
                faces, H, W, sign, with_debug=cfg.has_debug_camera,
                bins=bins[:2])
            keep = rp.phase1_keep(faces, zb_sign, H, W, sign)
            bins1 = rp.face_bins(faces, H, W,
                                 with_debug=cfg.has_debug_camera, keep=keep)
            outs = rp.visibility_gbuffer_pallas(
                faces, attrs, H, W, sign,
                with_debug=cfg.has_debug_camera,
                with_tex_tables=tables_on,
                windows=d["windows_all"] if windows_on else None,
                n_kinds=n_kinds if windows_on else 0,
                two_groups=two_groups, win_grid=win_grid,
                bins=bins1[:2], tid_in=tid)
            if windows_on:
                gbuffer, samp, samp_mask = outs
                return (gbuffer[0, 0, 0].astype(jnp.int32) + samp[0, 0, 0]
                        + tid[0, 0])
            return outs[0, 0, 0].astype(jnp.int32) + tid[0, 0]
        return fn

    progs = [("setup", stage(0)), ("vis", stage(1)), ("keep", stage(2)),
             ("gb", stage(3)), ("noshad", frame(cfg_ns)),
             ("full", frame(cfg)),
             ("s_prep", shadow_stage(0)), ("s_pack", shadow_stage(1)),
             ("s_sten", shadow_stage(2)), ("s_bins", bins_stage()),
             ("gb_nosamp", gb_variant(False, False))]
    only = os.environ.get("STAGES")
    if only:
        sel = only.split(",")
        progs = [(n, f) for n, f in progs if n in sel]

    results = {}
    for name, fn in progs:
        @jax.jit
        def program(d, rs, fn=fn):
            acc = jnp.int32(0)
            for r in range(REPS):
                acc = acc + fn(d, ((rs[r] + jnp.abs(acc)) >> 30)
                               .astype(jnp.float32))
            return acc
        rs = jnp.arange(REPS, dtype=jnp.int32)
        np.asarray(program(dyn, rs))          # compile + warm
        best = np.inf
        for _ in range(ROUNDS):
            t0 = time.time()
            np.asarray(program(dyn, rs))
            best = min(best, (time.time() - t0) / REPS)
        results[name] = best * 1e3
        print(f"{name:8s} {best * 1e3:8.2f} ms/frame")

    print("--- diffs")

    def diff(b, a, label):
        if a in results and b in results:
            print(f"{b:9s} - {a:9s} = {results[b] - results[a]:7.2f} ms"
                  f"  ({label})")

    diff("vis", "setup", "visibility")
    diff("keep", "vis", "keep+rebin counts")
    diff("gb", "keep", "phase-1 gb kernel")
    diff("noshad", "gb", "shading+glue")
    diff("full", "noshad", "shadow total")
    diff("s_prep", "vis", "prepare_quads")
    diff("s_pack", "s_prep", "pack_quads")
    diff("s_sten", "s_pack", "bin+sort+stencil kernel")
    diff("s_bins", "s_pack", "stencil XLA prep (bin+sort+slice)")
    diff("s_sten", "s_bins", "stencil kernel alone")
    diff("gb", "gb_nosamp", "sampler share of phase 1")


if __name__ == "__main__":
    main()
