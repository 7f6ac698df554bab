"""CPU repro hunt for the crowd-scene sampler miss (BENCH r05 config 5,
pallas_xla_match 0.9669: floor face unsampled over a distant band).

Renders a big floor (crowd-scene proportions) + one diablo with the grid
sampler forced on, Pallas interpret vs the XLA gather oracle, and reports
per-buffer matches. Run under JAX_PLATFORMS=cpu.
"""
import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import tpu_renderer as tr
from tpu_renderer.models.gizmos import make_floor
from tpu_renderer.ops.pipeline import render_frame

size = float(sys.argv[1]) if len(sys.argv) > 1 else 15.84
res = int(sys.argv[2]) if len(sys.argv) > 2 else 256

base = "/root/reference/obj/diablo3_pose"
d = tr.Model.load_model(os.path.join(base, "diablo3_pose.obj"))
d.textures.register("diffuse", os.path.join(base, "diablo3_pose_diffuse.tga"),
                    normalize=False)
floor = make_floor(size, y=-1.0)
floor.textures.register("diffuse", "/root/reference/obj/floor_diffuse.tga",
                        normalize=False)
light = tr.Light((5, 8, 0), light_type=tr.Lightning.POINT_LIGHTNING,
                 center=(0, 0.5, 0.5), ambient_strength=0.1)
cam = tr.Camera((0.5, 4.5, 8.5), center=(0, 0, 0), fovy=90, near=0.0001,
                far=400, backface_culling=True)
s = tr.Scene(cam, light, shadows=False, resolution=(res, res),
             system=tr.SYSTEM.LH, subsystem=tr.SUBSYSTEM.OPENGL,
             backend="pallas")
s.add_model(d)
s.add_model(floor)
cfg, dyn = s._prepare()
cfg_p = dataclasses.replace(cfg, tex_kernel=True)
cfg_x = dataclasses.replace(cfg, backend="xla", tex_kernel=False,
                            pallas_interpret=False)

fp = [np.asarray(a) for a in render_frame(cfg_p, dyn)]
fx = [np.asarray(a) for a in render_frame(cfg_x, dyn)]
frame_m = (fp[0] == fx[0]).all(-1)
tid_m = fp[2] == fx[2]
print(f"size={size} res={res} frame match {frame_m.mean():.6f} "
      f"({(~frame_m).sum()} px)  tid match {tid_m.mean():.6f}")
bad = ~frame_m
if bad.any():
    ys, xs = np.nonzero(bad)
    print(f"bbox rows [{ys.min()},{ys.max()}] cols [{xs.min()},{xs.max()}]")
    badt = bad[::-1]
    tp, tx_ = fp[2][badt], fx[2][badt]
    pairs, counts = np.unique(np.stack([tp, tx_], 1), axis=0,
                              return_counts=True)
    order = np.argsort(-counts)[:6]
    print("top tid pairs:", [(tuple(pairs[i]), int(counts[i]))
                             for i in order])
    ys2, xs2 = np.nonzero(badt)
    for i in range(0, len(ys2), max(1, len(ys2) // 4)):
        y, x = ys2[i], xs2[i]
        print(f"  ({y},{x}): tid {fp[2][y, x]}/{fx[2][y, x]} "
              f"frame {fp[0][::-1][y, x]}/{fx[0][::-1][y, x]}")
