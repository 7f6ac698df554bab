"""A/B the Sutherland-Hodgman clip cost at flagship scale (1536 quads).

Variants: current; roll-based next-vertex; roll + sort-based compaction.
"""
from __future__ import annotations

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from tools.exp_trace import run_traced_each

E = 1536
PM = 12


def clip_current(padded, counts, planes):
    from tpu_renderer.ops.frustum import clip_polygon
    return jax.vmap(lambda v, c: clip_polygon(v, c, planes))(padded, counts)


def _one_plane_roll(verts, count, plane, compact):
    n = verts.shape[1]
    idx = jnp.arange(n)
    active = idx[None, :] < count[:, None]
    wrap = idx[None, :] + 1 >= count[:, None]
    cur = verts
    nxt = jnp.where(wrap[..., None], verts[:, 0:1], jnp.roll(verts, -1,
                                                             axis=1))
    dist_cur = jnp.einsum("epc,c->ep", cur, plane)
    dist_nxt = jnp.einsum("epc,c->ep", nxt, plane)
    cur_vis = dist_cur >= 0
    nxt_vis = dist_nxt >= 0
    direction = cur - nxt
    denom = jnp.einsum("epc,c->ep", direction, plane)
    parallel = jnp.abs(denom) < 1e-10
    weight = -dist_nxt / jnp.where(parallel, 1.0, denom)
    ip = nxt + weight[..., None] * direction
    ip_valid = (~parallel) & (weight >= 0) & (weight <= 1)
    emit_cur = active & cur_vis
    emit_ip = active & (cur_vis ^ nxt_vis) & ip_valid
    cand = jnp.stack([cur, ip], axis=2).reshape(-1, 2 * n, 4)
    flags = jnp.stack([emit_cur, emit_ip], axis=2).reshape(-1, 2 * n)
    pos = jnp.cumsum(flags, axis=1) - 1
    out_count = flags.sum(axis=1)
    pos = jnp.where(flags, pos, -1)
    if compact == "matmul":
        onehot = (pos[:, None, :] == jnp.arange(n)[None, :, None]).astype(
            cand.dtype)
        out = jnp.einsum("eij,ejc->eic", onehot, cand,
                         precision="highest")
    else:
        # sort candidates by output position (invalid -> end), take first n.
        key = jnp.where(flags, pos, 2 * n)
        ordered = jax.lax.sort([key] + [cand[..., c] for c in range(4)],
                               dimension=1, num_keys=1)
        out = jnp.stack(ordered[1:], axis=-1)[:, :n]
    return out, out_count.astype(jnp.int32)


def clip_roll(padded, counts, planes, compact):
    v, c = padded, counts
    for k in range(planes.shape[0]):
        v, c = _one_plane_roll(v, c, planes[k], compact)
    return v, c


def main():
    rng = np.random.RandomState(0)
    quad = rng.randn(E, 4, 4).astype(np.float32) * 2
    quad[..., 3] = 1.0
    padded = np.zeros((E, PM, 4), np.float32)
    padded[:, :4] = quad
    counts = np.full(E, 4, np.int32)
    planes = np.array([[1, 0, 0, 3], [-1, 0, 0, 3], [0, 1, 0, 3],
                       [0, -1, 0, 3], [0, 0, 1, 3], [0, 0, -1, 3]],
                      np.float32)
    planes /= np.linalg.norm(planes[:, :3], axis=1, keepdims=True)
    padded, counts, planes = map(jnp.asarray, (padded, counts, planes))

    # correctness first
    v0, c0 = jax.jit(clip_current)(padded, counts, planes)
    v1, c1 = jax.jit(lambda p, c, pl: clip_roll(p, c, pl, "matmul"))(
        padded, counts, planes)
    v2, c2 = jax.jit(lambda p, c, pl: clip_roll(p, c, pl, "sort"))(
        padded, counts, planes)
    print("matmul match:", bool(jnp.array_equal(c0, c1)),
          float(jnp.max(jnp.abs(v0 - v1))))
    print("sort   match:", bool(jnp.array_equal(c0, c2)),
          float(jnp.max(jnp.abs(v0 - v2))))

    def mixf(a, r):
        return a + (r >> 30).astype(a.dtype)

    run_traced_each(
        [("current", lambda r, p: clip_current(mixf(p, r), counts,
                                               planes)[0][:8, 0, :1]),
         ("roll_matmul", lambda r, p: clip_roll(mixf(p, r), counts, planes,
                                                "matmul")[0][:8, 0, :1]),
         ("roll_sort", lambda r, p: clip_roll(mixf(p, r), counts, planes,
                                              "sort")[0][:8, 0, :1])],
        (padded,))


if __name__ == "__main__":
    main()
