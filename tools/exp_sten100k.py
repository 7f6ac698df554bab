"""Standalone stencil timing on the 100k-face crowd scene: global vs chunked.

The round-5 single-table ("global") stencil path loads the whole quad table
VMEM-resident and sorts bin entries once per tile; this A/Bs it against the
chunked-grid path IN ONE PROCESS (TPU contention is ±40% across processes)
by monkeypatching rp._STEN_GLOBAL_ROWS between jits. Reps chain through a
consumed input (zbuf += consumed scalar) to defeat CSE/overlap.

Usage: python tools/exp_sten100k.py [N_INST] [CAM_H]
"""
from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax"))

H = W = 1024
REPS = 6


def main():
    from bench import build_highpoly_scene
    from tpu_renderer.ops import pipeline as pp
    from tpu_renderer.ops import raster_pallas as rp
    from tpu_renderer.ops.shadow import prepare_quads
    from tpu_renderer.utils.profiling import trace, summarize_device_trace

    n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    cam_h = float(sys.argv[2]) if len(sys.argv) > 2 else 4.5
    scene = build_highpoly_scene(n_inst, cam_height=cam_h)
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
        cap = max(sil_cap)
        return (zbuf, screen[:cap], counts[:cap], ok[:cap], n_sil)

    zbuf, screen, counts, ok, n_sil = jax.tree_util.tree_map(
        jnp.asarray, setup(dyn))
    near = dyn["camera"]["near"]
    far = dyn["camera"]["far"]
    print(f"n_sil={int(n_sil)} quad_rows={screen.shape[0]}")

    def measure(name, global_rows):
        saved = rp._STEN_GLOBAL_ROWS
        rp._STEN_GLOBAL_ROWS = global_rows
        # stencil_pallas is itself @jax.jit: drop its cached trace or the
        # monkeypatched gate never re-evaluates (both arms would run the
        # first-traced path).
        rp.stencil_pallas.clear_cache()

        @jax.jit
        def program(zbuf):
            acc = jnp.int32(0)
            outs = []
            for _ in range(REPS):
                zb = zbuf + (acc >> 30).astype(jnp.float32)
                qdata, qi = rp.pack_quads(screen, counts, ok, H, W, near,
                                          far)
                st = rp.stencil_pallas(qdata, qi, zb, H, W, sign, near, far)
                acc = st[0, 0]
                outs.append(st[:8, :1])
            return jnp.concatenate(outs)

        out = np.asarray(program(zbuf))
        ld = f"/tmp/exp_sten100k_{name}"
        shutil.rmtree(ld, ignore_errors=True)
        with trace(ld):
            np.asarray(program(zbuf))
        rows = summarize_device_trace(ld)
        rp._STEN_GLOBAL_ROWS = saved
        # Nested-cond double counting inflates "cond" lines; the per-op
        # rows below are still comparable A/B (same nesting shape).
        print(f"--- {name}")
        noncond = sum(ms for ms, name, _ in rows if "cond" not in str(name))
        print(f"    non-cond device total {noncond / REPS:7.3f} ms/call")
        for ms, name, src in sorted(rows, reverse=True)[:40]:
            print(f"    {ms / REPS:7.3f} ms  {str(name)[:28]:28s} "
                  f"{str(src)[:70]}")
        return out

    a = measure("global", 65536)
    b = measure("chunked", 0)
    a2 = measure("global2", 65536)
    print("outputs identical:", bool((a == b).all() and (a == a2).all()))


if __name__ == "__main__":
    main()
