"""Stencil-kernel tile-height sweep at the round-4 tile geometry.

Round 3 scanned _STEN_TH when the face kernels ran 256-row tiles; TILE_H is
now per-frame (one 1024-row tile at the flagship), so re-scan. All variants
run in ONE process on identical inputs (TPU contention is ±40% across
processes); each height re-traces through the UNJITTED stencil_pallas so the
module global is re-read. Outputs are asserted identical across heights.
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

H = W = 1024
REPS = 8


def main():
    from bench import build_scene
    from tpu_renderer.ops import pipeline as pp
    from tpu_renderer.ops import raster_pallas as rp
    from tpu_renderer.ops.shadow import prepare_quads
    from tpu_renderer.utils.profiling import trace, summarize_device_trace
    import shutil

    if "--highpoly" in sys.argv:
        sys.path.insert(0, "/root/repo/tools")
        from exp_highpoly import build_highpoly_scene
        n = int(sys.argv[sys.argv.index("--highpoly") + 1])
        scene = build_highpoly_scene(n)
    else:
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
        zbuf = zb_sign * sign
        screen, counts, ok, n_sil, sil_cap = prepare_quads(cfg, d, cam_m)
        sil_cap = max(sil_cap)  # largest compaction level (tuple since r5)
        return (zbuf, screen[:sil_cap], counts[:sil_cap], ok[:sil_cap])

    zbuf, screen, counts, ok = jax.tree_util.tree_map(jnp.asarray, setup(dyn))
    near = dyn["camera"]["near"]
    far = dyn["camera"]["far"]
    sten_raw = rp.stencil_pallas.__wrapped__

    results = {}
    for th in (64, 128, 256, 512, 1024):
        rp._STEN_TH = th

        @jax.jit
        def program(zbuf):
            acc = jnp.int32(0)
            outs = []
            for _ in range(REPS):
                zb = zbuf + (acc >> 30).astype(jnp.float32)
                qdata, qi = rp.pack_quads(screen, counts, ok, H, W, near, far)
                st = sten_raw(qdata, qi, zb, H, W, sign, near, far)
                acc = st[0, 0]
                outs.append(st)
            return jnp.concatenate([o[:8, :1] for o in outs]), outs[-1]

        chk, st_full = program(zbuf)
        chk = np.asarray(chk)
        results[th] = np.asarray(st_full)
        ld = f"/tmp/exp_stenth_{th}"
        shutil.rmtree(ld, ignore_errors=True)
        with trace(ld):
            np.asarray(program(zbuf)[0])
        rows = summarize_device_trace(ld)
        kern = sum(ms for ms, _, nm in rows if "stencil" in nm or
                   "custom" in nm.lower()) / REPS
        tot = sum(ms for ms, _, _ in rows) / REPS
        print(f"STEN_TH={th:5d}: {tot:7.3f} ms/call total "
              f"(kernel-ish {kern:.3f})", flush=True)

    base = results[128]
    for th, st in results.items():
        assert (st == base).all(), f"stencil diverges at STEN_TH={th}"
    print("outputs identical across heights")


if __name__ == "__main__":
    main()
