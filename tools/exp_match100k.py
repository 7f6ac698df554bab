"""Localize the 100k-face Pallas-vs-XLA frame divergence.

BENCH_ALL_r05 config 5 recorded pallas_xla_match=0.9669 (the first time the
high-poly pin actually ran on TPU). Which buffer diverges, and is the split
pipeline (TPU_RENDERER_SPLIT) implicated? Run with TPU_RENDERER_SPLIT=0/1 to
compare.

Usage: python tools/exp_match100k.py [n_instances]
"""
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from bench import build_highpoly_scene
from tpu_renderer.ops.pipeline import render_frame

n_inst = int(sys.argv[1]) if len(sys.argv) > 1 else 20
tex_off = "--tex-off" in sys.argv
print(f"split={os.environ.get('TPU_RENDERER_SPLIT', '1')} n_inst={n_inst} "
      f"tex_off={tex_off}")

s = build_highpoly_scene(n_inst)
cfg, dyn = s._prepare()
if tex_off:
    cfg = dataclasses.replace(cfg, tex_kernel=False)
cfgx = dataclasses.replace(cfg, backend="xla", tex_kernel=False)

fp = jax.jit(lambda d: render_frame(cfg, d))(dyn)
fp = [np.asarray(a) for a in fp]
fx = jax.jit(lambda d: render_frame(cfgx, d))(dyn)
fx = [np.asarray(a) for a in fx]

frame_m = (fp[0] == fx[0]).all(-1)
zb_m = fp[1] == fx[1]
tid_m = fp[2] == fx[2]
st_m = fp[3] == fx[3]
for n, m in [("frame", frame_m), ("zbuf", zb_m), ("tid", tid_m),
             ("stencil", st_m)]:
    print(f"{n}: match {m.mean():.6f}  ({(~m).sum()} px differ)")

bad = ~frame_m
if bad.any():
    ys, xs = np.nonzero(bad)
    print(f"frame mismatch bbox rows [{ys.min()},{ys.max()}] "
          f"cols [{xs.min()},{xs.max()}]")
    # The frame is row-flipped relative to tid/zbuf/stencil — flip the mask
    # before indexing the unflipped buffers.
    bad = bad[::-1]
    print(f"of mismatched frame px: tid differs {(~tid_m[bad]).mean():.3f}  "
          f"zbuf differs {(~zb_m[bad]).mean():.3f}  "
          f"stencil differs {(~st_m[bad]).mean():.3f}")
    ys2, xs2 = np.nonzero(bad)
    for i in range(0, min(5 * (len(ys2) // 5 + 1), len(ys2)),
                   max(1, len(ys2) // 5)):
        y, x = ys2[i], xs2[i]
        print(f"  px(tid-space) ({y},{x}): tid {fp[2][y, x]}/{fx[2][y, x]} "
              f"frame {fp[0][::-1][y, x]}/{fx[0][::-1][y, x]}")
    # tid pairs at mismatches (sample)
    tp, tx = fp[2][bad], fx[2][bad]
    pairs, counts = np.unique(np.stack([tp, tx], 1), axis=0,
                              return_counts=True)
    order = np.argsort(-counts)[:10]
    print("top (tid_pallas, tid_xla) pairs:", [(tuple(pairs[i]), int(counts[i]))
                                               for i in order])
    # stencil pairs at mismatches
    sp, sx_ = fp[3][bad], fx[3][bad]
    pairs, counts = np.unique(np.stack([sp, sx_], 1), axis=0,
                              return_counts=True)
    order = np.argsort(-counts)[:10]
    print("top (sten_pallas, sten_xla) pairs:", [(tuple(pairs[i]),
                                                  int(counts[i]))
                                                 for i in order])
