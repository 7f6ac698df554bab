"""Stencil shadow volumes, batched on device.

The reference's dominant cost (README.md:4): pass 2 of Scene.render extrudes
every silhouette edge into a quad and rasterizes it into a signed stencil
buffer with Python loops (core.py:608-622, triangular.py:286-370). Here the
whole thing is one traced computation:

1. **Silhouette extraction** — the reference XORs the 3 edges of every
   light-facing face into a set (triangular.py:294-302). With the precomputed
   EdgeTable (models/model.py) this becomes: parity of the light-facing mask
   segment-summed over unique-edge ids (odd = silhouette), with the surviving
   edge's vertex order taken from the *last* light-facing incidence
   (segment_max), matching the set's add/discard order semantics. The facing
   test is ``normal @ light.position > 0`` — position, not direction — exactly
   like triangular.py:295.
2. **Extrusion** (core.py:613-621) — replicated arithmetically, including the
   reference's homogeneous quirk for directional lights where the appended
   w=1 makes the extruded points w=2 (projectively halving the extrusion).
   Spot lights take the directional branch, as in the reference's if/else.
3. **Clipping** — each quad is Sutherland–Hodgman-clipped against all six
   world-space frustum planes (triangular.py:320), vectorized with the
   fixed-size clipper (ops/frustum.py) under vmap.
4. **Stencil rasterization** (triangular.py:319-368) — point-in-convex-polygon
   by per-edge cross-product sign (front: all > 0, back: all < 0), plane-
   equation depth + linearization, sign-aware z-test against the final
   z-buffer, then a **signed, order-independent sum**: +1 for front faces, -1
   for back faces. Order independence is what makes this a clean parallel
   reduction instead of the reference's sequential read-modify-write.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_renderer.ops.frustum import clip_polygon
from tpu_renderer.ops.lightning import Lightning
from tpu_renderer.ops.transforms import matmul, normalize
from tpu_renderer.ops.vertex import linearize_z

__all__ = ["silhouette_edges", "extrude_quads", "shadow_stencil"]

#: Padded vertex capacity for a quad clipped by 6 planes (4 + 6 = 10 max).
QUAD_PMAX = 12


def silhouette_edges(verts, vid, pad_valid, inc_edge, inc_dir, inc_valid,
                     light_position, num_edges, axis_name=None,
                     inc_order_base=0):
    """Per-edge silhouette mask + directed vertex ids.

    verts: (V, 4); vid: (Fp, 3); pad_valid: (Fp,); inc_edge/(inc_dir)/(inc_valid):
    (3Fp,) / (3Fp, 2) / (3Fp,) incidence arrays; num_edges: static padded count.
    Returns (silhouette (E,) bool, a_vid (E,), b_vid (E,)).

    With ``axis_name`` set, faces (and their incidences) are sharded over that
    mesh axis: per-shard parity counts psum and the last-light-facing incidence
    pmaxes, so every shard sees the *global* silhouette. ``inc_order_base``
    offsets local incidence indices into the global order so the "last face
    wins" direction semantics stay global.
    """
    world = verts[vid][..., :3]
    n = jnp.cross(world[:, 1] - world[:, 0], world[:, 2] - world[:, 0])
    light_facing = (n @ light_position > 0) & pad_valid          # (Fp,)

    inc_lf = jnp.repeat(light_facing, 3) & inc_valid             # (3Fp,)
    parity = jax.ops.segment_sum(inc_lf.astype(jnp.int32), inc_edge,
                                 num_segments=num_edges)
    order = jnp.where(
        inc_lf,
        jnp.arange(inc_lf.shape[0], dtype=jnp.int32) + inc_order_base, -1)
    last = jax.ops.segment_max(order, inc_edge, num_segments=num_edges)
    # segment_max fills empty segments with the dtype minimum; normalize to -1.
    last = jnp.maximum(last, -1)

    if axis_name is not None:
        parity = jax.lax.psum(parity, axis_name)
        last = jax.lax.pmax(last, axis_name)

    silhouette = (parity & 1) == 1
    ab = _gather_incidence_dir(inc_dir, last, axis_name, inc_order_base)
    return silhouette, ab[:, 0], ab[:, 1]


def _gather_incidence_dir(inc_dir, last, axis_name, inc_order_base):
    """Directed vertex pair of the globally-last light-facing incidence.

    Single shard: a plain gather. Sharded: each shard contributes its local
    row when it owns the winning global incidence index, combined with pmax
    (losing shards contribute -1).
    """
    if axis_name is None:
        return inc_dir[jnp.clip(last, 0)]
    local = last - inc_order_base
    owns = (local >= 0) & (local < inc_dir.shape[0])
    ab = inc_dir[jnp.clip(local, 0)]
    ab = jnp.where(owns[:, None], ab, -1)
    return jax.lax.pmax(ab, axis_name)


def extrude_quads(verts, a_vid, b_vid, light, light_type):
    """Silhouette edges -> shadow quads (A, B, D, C), reference core.py:613-621."""
    A = verts[a_vid]                                             # (E, 4)
    B = verts[b_vid]
    if light_type == Lightning.POINT_LIGHTNING:
        lp = jnp.concatenate([light["position"], jnp.ones(1, jnp.float32)])
        C = A + 1000.0 * normalize(A - lp)
        D = B + 1000.0 * normalize(B - lp)
    else:
        # Directional/spot: w gets +1 on top of the vertex's w=1 — the
        # reference's tuple-append quirk, preserved for pixel parity.
        direction = normalize(light["position"] - light["center"]).ravel()
        ext = jnp.concatenate([direction * -1000.0, jnp.ones(1, jnp.float32)])
        C = A + ext
        D = B + ext
    return jnp.stack([A, B, D, C], axis=1)                       # (E, 4, 4)


def quad_edge_coeffs(sx, sy, counts, front):
    """Edge half-plane functions of a convex screen polygon, orientation
    folded in: inside requires A*x + B*y + K > 0 on every edge. Inactive
    edge slots encode (0, 0, 1) — an always-true test — so consumers need
    no per-edge active mask. Shared (same f32 ops, hence bit-identical
    values) by pack_quads / the Pallas stencil kernel and the XLA
    _quad_fragments path. sx, sy: (..., 12); counts, front: (...,)."""
    fs = jnp.where(front, 1.0, -1.0)[..., None]
    slots = jnp.arange(sx.shape[-1])
    wrap = slots + 1 >= counts[..., None]
    px1 = jnp.where(wrap, sx[..., 0:1], jnp.roll(sx, -1, axis=-1))
    py1 = jnp.where(wrap, sy[..., 0:1], jnp.roll(sy, -1, axis=-1))
    A = (py1 - sy) * fs
    B = -(px1 - sx) * fs
    K = -(sx * A + sy * B)
    active = slots < counts[..., None]
    return (jnp.where(active, A, 0.0), jnp.where(active, B, 0.0),
            jnp.where(active, K, 1.0))


def _masked_bound_box(xs, ys, active, height, width):
    """bound_box (transformation.py:35-43) over the active polygon vertices."""
    big = jnp.float32(jnp.inf)
    min_x = jnp.maximum(jnp.min(jnp.where(active, xs, big), axis=-1), 0)
    max_x = jnp.minimum(jnp.max(jnp.where(active, xs, -big), axis=-1), width)
    min_y = jnp.maximum(jnp.min(jnp.where(active, ys, big), axis=-1), 0)
    max_y = jnp.minimum(jnp.max(jnp.where(active, ys, -big), axis=-1), height)
    valid = ~((min_x > max_x) | (min_y > max_y))
    box = jnp.ceil(jnp.stack([min_x, max_x, min_y, max_y], -1)).astype(jnp.int32)
    return box, valid


def _quad_fragments(poly, count, ok, zb_sign, rows, cols, sign, near, far,
                    height, width):
    """Signed stencil contribution of ONE clipped shadow polygon, full frame.

    poly: (QUAD_PMAX, 4) world-space clipped polygon; count: active verts;
    ok: scalar bool (silhouette ∧ count >= 3); zb_sign: (H, W) final z-buffer
    in sign space. Returns (H, W) int32 in {-1, 0, +1}.
    """
    n = poly.shape[0]
    slots = jnp.arange(n)
    active = slots < count

    sx = poly[:, 0]
    sy = poly[:, 1]

    # Plane from the first three vertices (triangular.py:328-333).
    a3 = poly[0, :3]
    nrm = jnp.cross(a3 - poly[1, :3], a3 - poly[2, :3])
    is_front = nrm[2] < 0
    Ax, By, Cz = nrm[0], nrm[1], nrm[2]
    D = -(a3 @ nrm)

    # No bbox window test: the polygon is convex and its ceil'd bbox
    # CONTAINS the strict-edge-test interior (a pixel at or beyond the
    # extreme vertex of a convex polygon cannot be strictly inside every
    # half-plane), so the reference's bbox crop (transformation.py:35-43)
    # only bounds ITERATION, never coverage. The Pallas stencil kernel
    # drops the same test — identical mask expressions keep the backends
    # bit-identical. box_valid still gates fully-off-frame polygons.
    _, box_valid = _masked_bound_box(sx, sy, active, height, width)

    # Point-in-convex-polygon by edge half-planes (triangular.py:305-316):
    # orientation folded into the coefficients (multiplying by ±1.0 is exact
    # in f32, so front/back semantics are unchanged); inactive slots encode
    # an always-true test. Same coefficient values and the same evaluation
    # expression as the Pallas stencil kernel — bit-identical stencils.
    eA, eB, eK = quad_edge_coeffs(sx, sy, count, is_front)
    inside = jnp.ones(rows.shape[0:1] + cols.shape[1:2], bool)
    for i in range(n):
        inside &= (eA[i] * cols + eB[i] * rows + eK[i]) > 0

    # Plane-equation depth + linearization (triangular.py:351-354), in the
    # divide-free multiply-compare form the Pallas stencil kernel uses (same
    # coefficient and evaluation expressions — identical stencils):
    # zb >= sign*lin(zraw) <=> (zb*q - sign*nf2 >= 0) == (q > 0) with
    # q = (far+near) - zraw*(far-near). Background pixels (z-buffer never
    # written) are excluded: shading never reads the stencil there (pass 3
    # shades face pixels only, core.py:624), and the restriction enables the
    # Pallas path's z-occlusion binning prune.
    czs = jnp.where(Cz == 0, 1.0, Cz)
    zx, zy, zd = -Ax / czs, -By / czs, -D / czs
    zraw = zx * cols + zy * rows + zd
    nf2 = 2.0 * near * far
    qden = (far + near) - zraw * (far - near)
    # Divide-free z test: zb >= sign*nf2/qden rewritten multiply-side.
    # Corner (accepted): when qden < 0 the >= boundary flips to >, and the
    # multiply rounds ~1 ulp differently from the reference's divide — only
    # exact-equality boundary pixels can differ, within golden tolerance.
    # Pallas stencil_pallas uses the identical expression, so the two
    # backends stay bit-identical regardless.
    pass_z = (((zb_sign * qden - sign * nf2 >= 0) == (qden > 0))
              & (zb_sign < 3e38))

    contrib = jnp.where(is_front, jnp.int32(1), jnp.int32(-1))
    mask = inside & pass_z & ok & box_valid
    return jnp.where(mask, contrib, 0)


def prepare_quads(cfg, dyn, cam_m, axis_name=None, shard_idx=0):
    """Silhouette -> extruded quads -> world clip -> screen projection.

    Returns (screen (L, QUAD_PMAX, 4), counts (L,), ok (L,), n_sil, caps)
    or None when no model casts shadows; ``n_sil`` is the traced GLOBAL
    silhouette count and ``caps`` an ascending tuple of static per-shard
    compaction capacities (silhouette rows live in ``screen[:c]`` for the
    smallest level c with ``n_sil <= c * n_shards``; None when compaction
    didn't apply). Shared by the XLA scan rasterizer below and the Pallas
    stencil kernel (ops/raster_pallas.py), whose callers pick the smallest
    covering level with a nested lax.cond so binning + rasterization run on
    the tightest compact prefix.

    With ``axis_name`` set (triangle sharding), the returned tables are
    per-shard: the globally-identical silhouette-first order (parity counts
    psum inside silhouette_edges, so every shard sees the same global
    silhouette) is split evenly over shards and each shard
    Sutherland–Hodgman-clips + projects ONLY its slice — O(E / n_shards)
    per chip, O(silhouette / n_shards) in the common compacted case. The
    stencil rasterizer consumes local tables directly and the caller psums
    partial stencils; no further splitting is needed.
    """
    light = dyn["light"]
    quads, flags = [], []
    for mc, md in zip(cfg.models, dyn["models"]):
        if not mc.shadowing or mc.num_edges == 0:
            continue
        sil, a_vid, b_vid = silhouette_edges(
            md["verts"], md["vid"], md["pad_valid"], md["inc_edge"],
            md["inc_dir"], md["inc_valid"], light["position"], mc.num_edges,
            axis_name=axis_name,
            inc_order_base=shard_idx * md["inc_edge"].shape[0])
        quads.append(extrude_quads(md["verts"], a_vid, b_vid, light,
                                   cfg.light_type))
        flags.append(sil)
    if not quads:
        return None

    quad = jnp.concatenate(quads, axis=0)                        # (E, 4, 4)
    sil = jnp.concatenate(flags, axis=0)                         # (E,)
    e_total = quad.shape[0]

    n_sh = jax.lax.axis_size(axis_name) if axis_name is not None else 1

    def _prep(quad_sel, sil_sel):
        padded = jnp.zeros((quad_sel.shape[0], QUAD_PMAX, 4), jnp.float32)
        padded = padded.at[:, :4].set(quad_sel)
        counts = jnp.full(quad_sel.shape[0], 4, jnp.int32)
        planes = cam_m["frustum_planes"]
        clipped, counts = jax.vmap(
            lambda v, c: clip_polygon(v, c, planes))(padded, counts)
        ok = sil_sel & (counts >= 3)
        # Project to screen: MVP -> /w -> viewport (triangular.py:325-327).
        ndc = matmul(clipped, cam_m["MVP"])
        screen = matmul(ndc / ndc[..., 3:4], cam_m["viewport"])
        return screen, counts, ok

    # Compact to silhouette edges before the expensive clip/project stages.
    # Typical silhouettes are ~15-25% of unique edges; a fifth covers normal
    # frames, a third the heavy ones, with a conditional full-list fallback
    # for pathological geometry — lax.cond executes only the taken branch.
    # Capacities align to 64 * n_shards so per-shard slices stay 64-aligned.
    align = 64 * n_sh
    cap = max(align, -(-e_total // 3 // align) * align)
    n_sil = sil.sum()

    if n_sh == 1 and cap >= e_total:
        # Small single-chip scene: clip everything, no compaction layer.
        screen, counts, ok = _prep(quad, sil)
        return screen, counts, ok, n_sil, None

    # Pad the edge list so it splits evenly into 64-aligned shard slices.
    e_pad_total = -(-e_total // align) * align
    if e_pad_total > e_total:
        pad = e_pad_total - e_total
        quad = jnp.concatenate(
            [quad, jnp.zeros((pad, 4, 4), quad.dtype)])
        sil = jnp.concatenate([sil, jnp.zeros(pad, bool)])
    fs = e_pad_total // n_sh
    shard = (jax.lax.axis_index(axis_name) if axis_name is not None
             else 0)

    if cap >= e_total:
        # Sharded but not worth compacting: each shard clips its raw slab.
        screen, counts, ok = _prep(
            jax.lax.dynamic_slice_in_dim(quad, shard * fs, fs),
            jax.lax.dynamic_slice_in_dim(sil, shard * fs, fs))
        return screen, counts, ok, n_sil, None

    order = jnp.argsort(~sil, stable=True)                       # global

    def _sel_prep(start, size):
        sel = jax.lax.dynamic_slice_in_dim(order, start, size)
        screen, counts, ok = _prep(quad[sel], sil[sel])
        pad = fs - size
        if pad:
            # Pad back to the per-shard layout so the cond branches match.
            screen = jnp.concatenate(
                [screen, jnp.zeros((pad, QUAD_PMAX, 4), screen.dtype)])
            counts = jnp.concatenate([counts, jnp.zeros(pad, counts.dtype)])
            ok = jnp.concatenate([ok, jnp.zeros(pad, bool)])
        return screen, counts, ok

    def compact_path(cap_k):
        sck = cap_k // n_sh
        return lambda _: _sel_prep(shard * sck, sck)

    def full_path(_):
        return _sel_prep(shard * fs, fs)

    cap1 = max(align, -(-e_total // 5 // align) * align)
    if cap1 < cap:
        screen, counts, ok = jax.lax.cond(
            n_sil <= cap1, compact_path(cap1),
            lambda _: jax.lax.cond(n_sil <= cap, compact_path(cap),
                                   full_path, None), None)
        sil_caps = (cap1 // n_sh, cap // n_sh)
    else:
        screen, counts, ok = jax.lax.cond(
            n_sil <= cap, compact_path(cap), full_path, None)
        sil_caps = (cap // n_sh,)
    return screen, counts, ok, n_sil, sil_caps


def shadow_stencil(cfg, dyn, cam_m, zbuf, row0=0, quad_slice=None,
                   axis_name=None, shard_idx=0):
    """Full-frame signed stencil buffer for all shadow-casting models.

    Honors Model.shadowing (the reference never consults it, SURVEY.md §2
    quirk 2) and Scene(shadows=) — this function only runs when shadows are on.

    ``row0`` offsets pixel rows for frame-row sharding (the local frame shape
    comes from ``zbuf``; bound-box clamps stay in global coordinates).
    ``quad_slice`` = (start, size) rasterizes only a contiguous quad subset.
    With ``axis_name`` set, prepare_quads already returns per-shard tables
    (each shard clipped/projected only its slice of the global
    silhouette-first order), so this rasterizes the local table as-is and
    the caller psums partial stencils over the mesh axis.
    """
    height, width = cfg.resolution
    local_height = zbuf.shape[0]
    sign = cfg.system
    near = dyn["camera"]["near"]
    far = dyn["camera"]["far"]

    prepared = prepare_quads(cfg, dyn, cam_m, axis_name, shard_idx)
    if prepared is None:
        return jnp.zeros((local_height, width), jnp.int32)
    screen, counts, ok = prepared[:3]

    if quad_slice is not None:
        start, size = quad_slice
        screen = jax.lax.dynamic_slice_in_dim(screen, start, size, axis=0)
        counts = jax.lax.dynamic_slice_in_dim(counts, start, size, axis=0)
        ok = jax.lax.dynamic_slice_in_dim(ok, start, size, axis=0)

    rows = jnp.arange(local_height, dtype=jnp.float32)[:, None] + row0
    cols = jnp.arange(width, dtype=jnp.float32)[None, :]
    zb_sign = zbuf * sign

    chunk = cfg.chunk
    E = screen.shape[0]
    pad = (-E) % chunk
    if pad:
        screen = jnp.concatenate(
            [screen, jnp.zeros((pad, QUAD_PMAX, 4), screen.dtype)])
        counts = jnp.concatenate([counts, jnp.zeros(pad, counts.dtype)])
        ok = jnp.concatenate([ok, jnp.zeros(pad, bool)])

    nchunk = screen.shape[0] // chunk
    xs = (screen.reshape(nchunk, chunk, QUAD_PMAX, 4),
          counts.reshape(nchunk, chunk),
          ok.reshape(nchunk, chunk))

    def body(stencil, chunk_xs):
        scr, cnt, okc = chunk_xs
        for k in range(chunk):
            stencil = stencil + _quad_fragments(
                scr[k], cnt[k], okc[k], zb_sign, rows, cols, sign,
                near, far, height, width)
        return stencil, None

    stencil0 = jnp.zeros((local_height, width), jnp.int32)
    stencil, _ = jax.lax.scan(body, stencil0, xs)
    return stencil
