"""Line-level device profile of the shadow prep path (pipeline.py:754 cond).

The in-frame trace lumps pack_quads + _bin_quads + zmax tiles under the
lax.cond source line (~2.8 ms at 1024²); this harness runs the identical
computation at top level so summarize_device_trace attributes per line.
Reps are chained through the stencil output (CLAUDE.md measurement traps).
"""
from __future__ import annotations

import shutil
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tpu_renderer.ops import raster_pallas as rp
from tpu_renderer.ops import pipeline as pp
from tpu_renderer.ops.shadow import prepare_quads
from tpu_renderer.utils.profiling import trace, summarize_device_trace

H = W = 1024
REPS = 6


def main():
    from bench import build_scene

    scene = build_scene()
    cfg, dyn = scene._prepare()
    dyn = jax.tree_util.tree_map(jnp.asarray, dyn)
    sign = cfg.system
    near = dyn["camera"]["near"]
    far = dyn["camera"]["far"]

    @jax.jit
    def setup(d):
        cam_m = pp._cam_matrices(cfg, d["camera"], cfg.cam_projection_type)
        _, zbuf, _, _ = pp.render_frame(cfg, d)
        prepared = prepare_quads(cfg, d, cam_m)
        screen, counts, ok, n_sil, sil_cap = prepared
        sil_cap = max(sil_cap)  # largest compaction level (tuple since r5)
        return screen[:sil_cap], counts[:sil_cap], ok[:sil_cap], zbuf, n_sil

    screen, counts, ok, zbuf, n_sil = jax.tree_util.tree_map(
        jnp.asarray, setup(dyn))
    print(f"quad rows (sil_cap prefix): {screen.shape[0]}  "
          f"n_sil={int(n_sil)}  pmax={screen.shape[1]}")

    @jax.jit
    def program(screen, counts, ok, zbuf):
        acc = jnp.float32(0.0)
        outs = []
        for _ in range(REPS):
            sc = screen + acc
            qdata, qi = rp.pack_quads(sc, counts, ok, H, W, near, far)
            st = rp.stencil_pallas(qdata, qi, zbuf, H, W, sign, near, far)
            # st[0,0] is tiny-int; *1e-20 keeps the perturbation a true 0
            # without collapsing geometry.
            acc = st[0, 0].astype(jnp.float32) * 1e-20
            outs.append(st[:8, :1])
        return jnp.concatenate(outs)

    np.asarray(program(screen, counts, ok, zbuf))
    ld = "/tmp/exp_shadowprep"
    shutil.rmtree(ld, ignore_errors=True)
    with trace(ld):
        np.asarray(program(screen, counts, ok, zbuf))
    rows = summarize_device_trace(ld)
    tot = sum(ms for ms, _, _ in rows)
    print(f"TOTAL {tot / REPS:7.3f} ms/rep")
    for ms, name, src in sorted(rows, key=lambda r: -r[0])[:16]:
        print(f"  {ms / REPS:7.3f} {src or name}")


if __name__ == "__main__":
    main()
