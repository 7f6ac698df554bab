"""Pallas TPU tile-binned rasterizer: the production visibility/stencil path.

Where the XLA path (ops/raster_xla.py) streams every face over the full frame
(O(F·H·W)), this kernel does the classic tiled-GPU decomposition on the TPU's
terms (SURVEY.md §7 design stance):

- **Binning (XLA):** every face's clamped integer bbox is intersected with a
  (TILE_H x TILE_W) screen grid; per tile, a compacted face-id list + count.
  Capacity is the full face count, so nothing ever drops; the kernel loops
  exactly ``count[tile]`` times.
- **Kernel (Pallas):** grid = screen tiles; each program owns its pixel block
  exclusively (no contention — the z-buffer resolve is tile-local). Per tile:
  one incremental loop over the binned faces resolves depth AND winner id
  simultaneously (claims against the running z-buffer with last-tie overwrite
  — provably equal to the reference's two-pass z-write + final-re-test
  semantics, triangular.py:99-118), fully vectorized over the 8k-pixel block
  on the VPU; the G-buffer variant adds a second loop interpolating shading
  attributes for winning pixels only.
- **Clip test, linearized:** the reference's per-pixel perspective-corrected
  clip test ``-w < x,y,z < w`` (triangular.py:80-91) is algebraically
  ``sign(S) * (bar @ (inv_w_i * cond_ij)) > 0`` with S = bar @ inv_w — six
  (twelve with a debug camera) extra interpolated planes instead of a divide,
  MXU/VPU-friendly and exact up to f32 rounding.

The same structure rasterizes shadow-volume quads into the signed stencil
(clipped polygons of up to 12 vertices, per-edge cross-sign coverage,
plane-equation depth — triangular.py:305-368).

Face/quad data is packed into two dense per-primitive tables (float payload +
int payload) resident in VMEM; per-primitive scalars are read with dynamic row
indexing.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["bin_primitives", "pack_faces", "visibility_pallas",
           "pack_quads", "stencil_pallas", "face_bins",
           "sample_textures_pallas", "TILE_H", "TILE_W"]

# Face-kernel tile shape. The per-(face,tile) visit cost is scalar-bound
# (~148 cyc, tools/exp_visit.py) and slab ranges already restrict each
# visit's vector work to the face's bbox rows, so taller tiles cut visits
# (fewer tile-row crossings) and per-tile fixed costs at ZERO extra vector
# work. MEASURED on the flagship 1024² (round 3): 64 -> 128 -> 256 rows =
# 94.1 -> 99.3 -> 106.6 fps; with the VMEM-resident grid sampler the
# lever extends all the way (bench 256/512/1024 = 122.9/127.1/128.9 fps),
# so the tile height is PER-FRAME (_tile_h): one tile row up to
# TILE_H_MAX for big frames, frame-height tiles for small ones (no
# padding: a 160² golden keeps 160-row tiles). Tall tiles compile only
# with the raised per-kernel VMEM limit (see the pallas_call
# compiler_params: the scoped default is a 16 MB compiler guard, v5e
# hardware has 128 MB). The packed bin-entry slab fields
# (_BIN_SB/_BIN_NSL below) are sized STATICALLY for TILE_H_MAX:
# s_base/8 needs log2(TILE_H_MAX/8) bits.
TILE_H_MAX = int(__import__("os").environ.get("TILE_H", 1024))  # env: exp
#: Back-compat alias: the tallest tile any frame uses (tools/tests import
#: TILE_H to size scratch); per-call heights come from _tile_h(height).
TILE_H = TILE_H_MAX
TILE_W = 128


def _tile_h(height):
    """Per-frame face-kernel tile height: the whole frame up to TILE_H_MAX,
    rounded up to a slab multiple (16) so slab windows stay aligned."""
    return min(TILE_H_MAX, max(16, -(-height // 16) * 16))

# Float payload layout for faces (pack_faces):
#   [0:9] affine barycentric/z coefficients (av bv cv aw bw cw az bz cz),
#   [9:12] per-vertex 1/w, [12:16] bbox as f32 (x0 x1 y0 y1),
#   [16:34] e_cam (3 verts x 6 clip conds), [34:52] e_dbg (optional).
# Kernels read the row as ONE dynamic (1, 128) VMEM load and pick scalars
# with constant-lane dynamic_gather broadcasts (~2x cheaper per visit than
# dynamic scalar reads, tools/exp_visit.py) — pack_faces pads rows to 128.
_F_BASE = 16
_F_CLIP = 18

# Int payload layout for faces: [0:4] bbox, [4] flags (1 valid | 2 clip_en |
# 4 z_write | 8 needs per-pixel clip), [5] gid.
_I_COLS = 8


def _cdiv(a, b):
    return -(-a // b)


# Packed bin-entry layout (bin_primitives with flags): one i32 carries the
# sort key (bit 30: 1 = no overlap, sorts last), the chunk-local index, the
# face_flags word, and the face's slab range in the tile (s_base/8, count).
# Key above index above the rest makes the VALUE ordering the (key, face
# order) ordering, so one single-operand lax.sort both compacts and
# preserves the reference's face-order tie-breaking.
_BIN_KEY = 30
_BIN_F = 17              # requires FACE_CHUNK <= 2**13
_BIN_FLAGS = 13
# Slab fields are sized from TILE_H_MAX so every per-frame tile height
# packs identically: s_base/8 needs log2(TILE_H_MAX/8) bits (7 at 1024),
# the count keeps 3 bits with 7 as the "to end of tile" sentinel.
_SB_BITS = (TILE_H_MAX // 8 - 1).bit_length()
_BIN_SB = _BIN_FLAGS - _SB_BITS
_BIN_NSL = _BIN_SB - 3
_SB_MASK = (1 << _SB_BITS) - 1
_BIN_FMASK = (1 << 13) - 1
assert _BIN_NSL >= 0, \
    f"TILE_H_MAX {TILE_H_MAX} slab base overflows the bin entry"

# The maximum composed entry must stay below 2**31 or widened fields would
# wrap into the sign bit and corrupt the sort order. Bits below _BIN_NSL
# are unused headroom: fail loudly at import if any field widens past it.
_MAX_ENTRY = ((1 << _BIN_KEY) | (_BIN_FMASK << _BIN_F)
              | (((1 << (_BIN_F - _BIN_FLAGS)) - 1) << _BIN_FLAGS)
              | (_SB_MASK << _BIN_SB)
              | (7 << _BIN_NSL))      # 3-bit slab count
assert _MAX_ENTRY < 2 ** 31, (
    f"packed bin entry may overflow i32: max {_MAX_ENTRY} >= 2^31")


def bin_primitives(bbox, active, height, width, tile_h=None, tile_w=TILE_W,
                   edge_coeffs=None, row0=0, flags=None):
    """Tile/primitive intersection lists.

    bbox: (N, 4) int32 ceil'd clamped [x0, x1, y0, y1) windows; active: (N,).
    Returns (counts (T,) int32, idx (T, N) int32) with T = tiles, row-major
    (ty, tx). Capacity equals N: drop-free by construction.

    ``edge_coeffs`` = (A, B, K, mask): optional (N, E)-shaped affine edge
    functions (value at pixel (x, y) = A*x + B*y + K, inside requires >= 0 on
    every unmasked edge). When given, a tile is kept only if every edge's
    maximum over the tile rectangle is >= 0 — exact convex-coverage pruning
    (the maximum of an affine function over a rectangle sits at a corner and
    separates per axis).

    ``row0`` offsets the tile grid into the global frame for row-sharded
    rendering: primitives stay in global coordinates (bit-identical math to
    single-chip), only the tile windows shift.
    """
    n = bbox.shape[0]
    if tile_h is None:
        tile_h = _tile_h(height)
    n_ty = _cdiv(height, tile_h)
    n_tx = _cdiv(width, tile_w)
    ty = jnp.arange(n_ty)
    tx = jnp.arange(n_tx)
    # (T_y, T_x, N) overlap of [b0,b1)x[b2,b3) with each tile's pixel range.
    b0, b1, b2, b3 = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    ov_x = ((b0[None, :] < (tx[:, None] + 1) * tile_w) &
            (b1[None, :] > tx[:, None] * tile_w))            # (T_x, N)
    ov_y = ((b2[None, :] < row0 + (ty[:, None] + 1) * tile_h) &
            (b3[None, :] > row0 + ty[:, None] * tile_h))     # (T_y, N)
    overlap = (ov_y[:, None, :] & ov_x[None, :, :] &
               active[None, None, :])
    if edge_coeffs is not None:
        A, B, K, mask = edge_coeffs
        tx0 = (tx * tile_w).astype(jnp.float32)
        ty0 = (ty * tile_h).astype(jnp.float32) + row0
        x_part = tx0[:, None, None] * A + tile_w * jnp.maximum(A, 0)
        y_part = ty0[:, None, None] * B + tile_h * jnp.maximum(B, 0)
        cm = y_part[:, None] + x_part[None, :] + K[None, None]
        cm = jnp.where(mask[None, None], cm, jnp.inf)
        # Coefficients are unit-normalized (signed pixel distance): an
        # eighth-pixel slack absorbs any fp disagreement with the kernel's
        # barycentric coverage test.
        overlap &= cm.min(axis=-1) >= -0.125
    _check_pack_limits(n)
    counts = overlap.reshape(n_ty * n_tx, n).sum(axis=1, dtype=jnp.int32)
    if flags is None:
        key = (~overlap).reshape(n_ty * n_tx, n).astype(jnp.int32)
        payload = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[None, None], overlap.shape)
        _, idx = jax.lax.sort([key, payload.reshape(n_ty * n_tx, n)],
                              dimension=1, num_keys=1, is_stable=True)
        return counts, idx
    # Pack everything a kernel visit needs as scalars into the entry
    # itself — per-visit dynamic scalar reads from a VMEM table cost
    # ~38 cycles EACH (tools/exp_visit.py); one read + a shift/mask
    # decode replaces five. The _FSLAB-slab range of the face's bbox in
    # the tile is precomputed here (8-aligned base / 8, count <= 4).
    rlo_t = jnp.clip(bbox[None, :, 2] - row0
                     - (ty * tile_h)[:, None], 0, tile_h)
    rhi_t = jnp.clip(bbox[None, :, 3] - row0
                     - (ty * tile_h)[:, None], 0, tile_h)
    s_base = rlo_t & ~7
    n_slabs = (rhi_t - s_base + _FSLAB - 1) >> _FSLAB_SHIFT
    # The 3-bit slab-count field saturates at 7; a saturated count means
    # "through the end of the tile" (decoded in _for_each_slab). With
    # _FSLAB=16 counts never exceed 4, so this is future-proofing for
    # narrower slabs; overshoot would be harmless anyway (visits are
    # coverage-masked and idempotent).
    n_slabs = jnp.minimum(n_slabs, 7)
    pay_y = ((s_base >> 3) << _BIN_SB) | (n_slabs << _BIN_NSL)   # (Ty, N)
    pay_n = ((jnp.arange(n, dtype=jnp.int32) << _BIN_F)
             | (flags << _BIN_FLAGS))
    entries = (pay_y[:, None] + pay_n[None, None]
               + ((~overlap).astype(jnp.int32) << _BIN_KEY))
    idx = jax.lax.sort(entries.reshape(n_ty * n_tx, n), dimension=1)
    return counts, idx


def _face_edge_coeffs(faces_padded):
    """Affine edge functions of each triangle, inside = all >= 0.

    The barycentric coverage test ``u, v, w >= 0`` is equivalent to the three
    edge functions with consistent orientation; build them directly from the
    screen coordinates (sign fixed by the doubled signed area).
    """
    sx = faces_padded["sx"]
    sy = faces_padded["sy"]
    # Doubled signed area: cross(b - a, c - a).
    area = ((sx[:, 1] - sx[:, 0]) * (sy[:, 2] - sy[:, 0]) -
            (sy[:, 1] - sy[:, 0]) * (sx[:, 2] - sx[:, 0]))
    s = jnp.sign(area)[:, None]
    ax = sx
    ay = sy
    bx = jnp.roll(sx, -1, axis=1)
    by = jnp.roll(sy, -1, axis=1)
    # Edge (a -> b): E(p) = cross(b - a, p - a); the opposite vertex (and the
    # interior) gets sign(area), so scaling by it makes inside = all E >= 0.
    A = -(by - ay) * s
    B = (bx - ax) * s
    K = -(ax * A + ay * B)
    # Normalize to signed pixel distance so the pruning slack is in pixels.
    inv_len = 1.0 / jnp.maximum(jnp.sqrt(A * A + B * B), 1e-30)
    A, B, K = A * inv_len, B * inv_len, K * inv_len
    mask = jnp.broadcast_to((area != 0)[:, None], A.shape)
    return A, B, K, mask


def _conds(clip):                                 # (G, 3, 4) -> (G, 3, 6)
    x, y, z, w = clip[..., 0], clip[..., 1], clip[..., 2], clip[..., 3]
    return jnp.stack([x + w, w - x, y + w, w - y, z + w, w - z], axis=-1)


def face_flags(faces, with_debug):
    """Per-face kernel flag word: 1 valid | 2 clip_en | 4 z_write | 8 needs
    per-pixel clip. Bit 8: a clip-enabled face with all three vertices
    strictly inside every clip space (every inv_w-scaled condition > 0,
    which also forces w > 0 and hence S > 0 on covered pixels) passes the
    interpolated test at every interior pixel by convexity — the kernels
    skip the 6-plane evaluation for it, exactly. clip_en=False faces skip
    the test like the XLA path (raster_xla.py:93, triangular.py:80).

    Shared by pack_faces and face_bins (the bin lists carry the flags in
    their packed entries, see bin_primitives)."""
    e_cam = _conds(faces["clip"]) * faces["inv_w"][..., None]
    all_inside = jnp.all(e_cam > 0, axis=(1, 2))
    if with_debug:
        e_dbg = _conds(faces["clip_dbg"]) * faces["inv_w"][..., None]
        all_inside &= jnp.all(e_dbg > 0, axis=(1, 2))
    needs_ppc = faces["clip_en"] & ~all_inside
    return (faces["valid"].astype(jnp.int32)
            | (faces["clip_en"].astype(jnp.int32) << 1)
            | (faces["z_write"].astype(jnp.int32) << 2)
            | (needs_ppc.astype(jnp.int32) << 3))


def pack_faces(faces, with_debug):
    """faces dict (ops/vertex.gather_faces layout) -> fdata f32.

    The clip planes are pre-scaled per vertex: e[i, j] = inv_w[i] * cond[i, j]
    with cond = (x+w, w-x, y+w, w-y, z+w, w-z) of the clip-space vertex.
    """
    g = faces["sx"].shape[0]
    # Layout: see _F_BASE comment above.
    cols = [faces["aff"], faces["inv_w"],
            faces["bbox"].astype(jnp.float32)]
    e_cam = _conds(faces["clip"]) * faces["inv_w"][..., None]
    cols.append(e_cam.reshape(g, 18))
    if with_debug:
        e_dbg = _conds(faces["clip_dbg"]) * faces["inv_w"][..., None]
        cols.append(e_dbg.reshape(g, 18))
    return jnp.concatenate(cols, axis=1)


def _face_row(fdata_ref, f, shape):
    """Per-visit face-row accessor: one dynamic (1, 128) VMEM load, scalars
    picked as constant-lane dynamic_gather broadcasts (a VREG lane shuffle,
    ~2x cheaper per visit than dynamic scalar reads — tools/exp_visit.py).
    ``shape`` must have exactly 128 lanes; fdata rows are 128-padded."""
    row = jnp.broadcast_to(fdata_ref[pl.ds(f, 1), :], shape)
    zero = jax.lax.broadcasted_iota(jnp.int32, shape, 1) * 0

    def co(c):
        return jnp.take_along_axis(row, zero + c, axis=1)
    return co


def _face_tile_cov(co, rows, cols, with_debug, with_clip):
    """Coverage ∧ sign-space depth for one face over a (TH, TW) tile block.

    Affine evaluation — the same coefficients and expression as
    raster_xla.face_fragments, so the backends stay bit-identical. ``co(c)``
    broadcasts fdata column c (see _face_row).
    """
    v = co(0) * cols + co(1) * rows + co(2)
    w = co(3) * cols + co(4) * rows + co(5)
    u = 1.0 - v - w
    cov = (u >= 0) & (v >= 0) & (w >= 0)

    if with_clip:
        s = u * co(9) + v * co(10) + w * co(11)
        n_spaces = 2 if with_debug else 1
        ok = s != 0                      # S == 0 -> reference NaN -> dropped
        for space in range(n_spaces):
            base = _F_BASE + space * _F_CLIP
            for j in range(6):
                q = (u * co(base + j) + v * co(base + 6 + j) +
                     w * co(base + 12 + j))
                # q/S > 0  <=>  (q > 0) == (S > 0), S != 0.
                ok &= (q > 0) == (s > 0)
        cov &= ok

    z = co(6) * cols + co(7) * rows + co(8)
    return cov, z


def _window_mask(co, rows, cols):
    return ((cols >= co(12)) & (cols < co(13)) &
            (rows >= co(14)) & (rows < co(15)))


def _visit_claim(fdata_ref, f, flags, rows, cols, with_debug, apply):
    """Coverage ∧ window for face f on a pixel block, then ``apply(cov, z)``.

    The per-pixel clip test reads 18 (36 with a debug camera) plane
    coefficients. pack_faces precomputes whether the face needs it (flags
    bit 8 — clip-enabled and not wholly inside); the two pl.when branches let
    the common all-inside face skip that work (lax.cond with vector carries
    doesn't lower in Mosaic, but ref-mutating pl.when does).
    """
    ppc = (flags & 8) > 0
    co = _face_row(fdata_ref, f, rows.shape)

    def run(with_clip):
        cov, z = _face_tile_cov(co, rows, cols, with_debug,
                                with_clip=with_clip)
        cov &= _window_mask(co, rows, cols)
        cov &= (flags & 1) > 0
        apply(cov, z)

    @pl.when(ppc)
    def _():
        run(True)

    @pl.when(jnp.logical_not(ppc))
    def _():
        run(False)


#: Pixel-row slab height for per-visit face work. Faces are tiny (p50 bbox
#: height 3 px on the flagship mesh): restricting each visit's vector work
#: from the (TILE_H, 128) tile to the row slabs its bbox touches cuts the
#: dominant per-visit cost ~4x. Must divide TILE_H and be a multiple of 8
#: (aligned dynamic sublane slices). MEASURED (round 3): 8-row slabs
#: (1 VREG) are ~17% SLOWER end-to-end (69.7 vs 83.6 fps at 1024^2) —
#: per-slab fixed overhead (bin decode, branches, slab setup) dominates the
#: saved VPU lanes, and boundary-crossing visits double; 16 is the optimum.
#: Face-kernel slab height (rows per bbox slab of a visit). The bin entry
#: stores s_base at 8-row granularity (_BIN_SB) and a 3-bit count, so 8 and
#: 16 both pack. MEASURED (round 5, tools/exp_crowd_budget.py FSLAB=8 on
#: the 100k crowd): visibility 13.4 vs 12.9 ms, phase-1 40.3 vs 40.6,
#: full frame 87.4 vs 87.2 — a wash; per-visit cost is scalar/broadcast
#: bound, not masked-RMW-volume bound (the sampler already half-slab
#: dispatches to 8 rows). 16 stays the default; env knob for experiments.
_FSLAB = int(__import__("os").environ.get("FSLAB", 16))
_FSLAB_SHIFT = _FSLAB.bit_length() - 1
assert _FSLAB in (8, 16), "slab height must divide the 8-aligned s_base"


def _decode_bin(e):
    """Unpack a bin entry (see _BIN_*): (chunk-local index, flags, slab
    base, slab count). Slab starts stay 8-aligned; callers clamp each start
    to TILE_H - _FSLAB (overlap is harmless: coverage ∧ bbox-window masking
    makes revisits idempotent)."""
    f = (e >> _BIN_F) & _BIN_FMASK
    flags = (e >> _BIN_FLAGS) & 0xF
    s_base = ((e >> _BIN_SB) & _SB_MASK) << 3
    n_slabs = (e >> _BIN_NSL) & 0x7
    return f, flags, s_base, n_slabs


def _for_each_slab(s_base, n_slabs, fn, tile_h=None):
    """Run ``fn(s0)`` for each _FSLAB-row slab of a face's bbox in the tile.

    Binned faces touch >= 1 slab, and (p50 bbox height 3 px) almost always
    exactly one: the first slab runs straight-line — a fori_loop iteration
    costs ~70 cycles, a taken-false pl.when far less — with branches only
    for the 2nd and the rare 3rd+. A saturated 3-bit count (7, see
    bin_primitives) means "through the end of the tile" (``tile_h``, the
    caller's per-frame tile height)."""
    if tile_h is None:
        tile_h = TILE_H_MAX
    n_eff = jnp.where(n_slabs >= 7, (tile_h - s_base) >> _FSLAB_SHIFT,
                      n_slabs)

    def at(si):
        fn(jnp.minimum(s_base + si * _FSLAB, tile_h - _FSLAB))

    at(0)

    @pl.when(n_eff > 1)
    def _():
        at(1)

    @pl.when(n_eff > 2)
    def _():
        def body(si, _):
            at(si)
            return 0
        jax.lax.fori_loop(2, n_eff, body, 0)


def _pad_cols_128(a):
    """Pad the lane (column) dim to exactly 128 so kernels can read a face
    row as one VREG (see _face_row). Free in HBM traffic at n_chunks == 1:
    Pallas elides block re-fetch when consecutive grid steps map to the
    same block index."""
    if a.shape[1] == 128:
        return a
    assert a.shape[1] < 128, a.shape
    return jnp.pad(a, ((0, 0), (0, 128 - a.shape[1])))


def _pad_rows_to(a, mult, fill=0):
    pad = (-a.shape[0]) % mult
    if pad == 0:
        return a
    return jnp.concatenate(
        [a, jnp.full((pad,) + a.shape[1:], fill, a.dtype)], axis=0)


#: Faces per kernel chunk: bounds VMEM (the face tables stream through the
#: third grid dimension; outputs accumulate across chunk steps).
FACE_CHUNK = 8192


def _chunked_bins(bbox, valid, height, width, chunk, edge_coeffs=None,
                  row0=0, flags=None):
    """Per-chunk binning: counts (n_chunks, T), idx (n_chunks, T, chunk, 1)."""
    g = bbox.shape[0]
    n_chunks = g // chunk
    counts, idx = [], []
    for c in range(n_chunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        ec = None
        if edge_coeffs is not None:
            ec = tuple(a[sl] for a in edge_coeffs)
        cnt, ix = bin_primitives(bbox[sl], valid[sl], height, width,
                                 edge_coeffs=ec, row0=row0,
                                 flags=None if flags is None else flags[sl])
        counts.append(cnt)
        idx.append(ix)
    return jnp.stack(counts), jnp.stack(idx)[..., None]


def face_bins(faces, height, width, row0=0, with_debug=False, exact=True,
              keep=None):
    """Shared tile/face intersection lists: (counts, idx, chunk).

    Computed once per frame and reused by the visibility/G-buffer kernel and
    the windowed texture sampler (their face loops iterate the same lists).
    Entries are PACKED (index | flags | tile-relative bbox rows, see
    _BIN_*) so kernel visits decode everything from one scalar read.
    ``with_debug`` must match the kernels' (it affects the needs-clip flag
    bit). ``exact=False`` bins by bbox only (skips the edge-coverage prune
    — an A/B knob; see tools/exp_binprune.py). ``keep`` optionally ANDs an
    extra per-face mask into validity (the split pipeline's phase-1
    z-interval prune, see phase1_keep).
    """
    g0 = faces["sx"].shape[0]
    chunk = min(FACE_CHUNK, -(-g0 // 128) * 128)
    coeffs = _face_edge_coeffs({"sx": _pad_rows_to(faces["sx"], chunk),
                                "sy": _pad_rows_to(faces["sy"], chunk)}) \
        if exact else None
    valid = faces["valid"]
    if keep is not None:
        valid = valid & keep
    counts, idx = _chunked_bins(
        _pad_rows_to(faces["bbox"], chunk),
        _pad_rows_to(valid, chunk, fill=False), height, width,
        chunk, edge_coeffs=coeffs, row0=row0,
        flags=_pad_rows_to(face_flags(faces, with_debug), chunk))
    return counts, idx, chunk


#: Cell granularity of the split pipeline's phase-1 z-interval prune.
#: Cells must be SMALL: the prune asks "is this face behind everything
#: visible where it lands", and any far-geometry pixel (the floor showing
#: through a gap in the crowd) inside the probed region defeats it. A
#: 128-px-wide cell dilated 3x3 measured keep=0.996 on the 20-diablo crowd
#: scene — useless; (16, 32) cells probed at the face's own bbox prune.
_P1_CELL_H = 16
_P1_CELL_W = 32


def phase1_keep(faces, zb_sign, height, width, sign, row0=0):
    """Which faces could have WON a pixel of the final z-buffer?

    The split pipeline (multi-chunk scenes, ops/pipeline.py) rasterizes
    visibility first, then prunes the G-buffer pass's bins with this mask:
    phase-1 visits are pure overhead for faces that won nothing, and at
    high triangle counts (heavy overdraw) most faces lose everywhere.

    Correctness: phase 1 writes only where ``tid == gid``. For a z-writing
    face, a won pixel's final z-buffer value equals the face's own kernel
    z (any later z write would have re-claimed tid), so the face's
    sign-space z range over its bbox must intersect the z-buffer's range
    over the pixels it could cover. Both ranges are cheap and conservative:
    the face's kernel z is affine (aff[6:9]; extremes at bbox corners),
    and the buffer's range comes from per-(_P1_CELL_H, _P1_CELL_W) min/max
    tables pooled 2x2 at stride 1, so the value at the bbox's TOP-LEFT
    cell bounds any bbox spanning at most one cell in each axis (larger
    faces are kept). Faces that claim without writing z (depth_test off)
    can win pixels whose final z-buffer differs from their own z
    (including background inf) — they are always kept, as are invalid
    faces (already inactive).

    A slack proportional to the coefficient magnitudes absorbs the affine
    evaluation's f32 rounding (see ops/vertex.py:~110: error ~|coef|*2^-14
    px at 4k coords). Gathering the per-face cell stats uses a FACTORIZED
    one-hot contraction (row pick as a matmul, then a column
    multiply-reduce) — XLA per-element gathers cost ~13 ms per million
    indices on TPU; this is ~100 elementwise ops per face.
    """
    cell_h, cell_w = _P1_CELL_H, _P1_CELL_W
    n_cy = _cdiv(height, cell_h)
    n_cx = _cdiv(width, cell_w)
    zb = zb_sign
    if zb.shape != (n_cy * cell_h, n_cx * cell_w):
        pad_r = n_cy * cell_h - zb.shape[0]
        pad_c = n_cx * cell_w - zb.shape[1]
        zb = jnp.pad(zb, ((0, pad_r), (0, pad_c)), constant_values=jnp.inf)
    finite = zb < 3e38
    cells = zb.reshape(n_cy, cell_h, n_cx, cell_w)
    fin = finite.reshape(n_cy, cell_h, n_cx, cell_w)
    zmax = jnp.where(fin, cells, -jnp.inf).max(axis=(1, 3))
    zmin = jnp.where(fin, cells, jnp.inf).min(axis=(1, 3))
    # 2x2 stride-1 pools: pooled[cy, cx] covers cells [cy, cy+1]x[cx, cx+1]
    # (edge-padded with the no-constraint identities), so one lookup at the
    # bbox's top-left cell bounds a bbox spanning <= 2 cells per axis.
    pad_max = jnp.pad(zmax, ((0, 1), (0, 1)), constant_values=-jnp.inf)
    pad_min = jnp.pad(zmin, ((0, 1), (0, 1)), constant_values=jnp.inf)
    zmax_p = jnp.maximum(jnp.maximum(pad_max[:-1, :-1], pad_max[1:, :-1]),
                         jnp.maximum(pad_max[:-1, 1:], pad_max[1:, 1:]))
    zmin_p = jnp.minimum(jnp.minimum(pad_min[:-1, :-1], pad_min[1:, :-1]),
                         jnp.minimum(pad_min[:-1, 1:], pad_min[1:, 1:]))
    # ±inf must become finite sentinels BEFORE the one-hot contraction:
    # 0 * inf = NaN would poison every face's gathered stats (and NaN
    # comparisons read as "alive", silently disabling the prune).
    # All-background neighborhoods keep their semantics: zmax -3e38 prunes
    # any finite-z face, zmin +3e38 likewise.
    zmax_p = jnp.clip(zmax_p, -3e38, 3e38)
    zmin_p = jnp.clip(zmin_p, -3e38, 3e38)
    # (n_cy, n_cx, 2) -> row table (n_cy, n_cx*2) for the row-pick matmul.
    tab = jnp.stack([zmax_p, zmin_p], axis=-1).reshape(n_cy, n_cx * 2)

    bbox = faces["bbox"]                                  # (F,4) x0,x1,y0,y1
    f32 = lambda v: v.astype(jnp.float32)
    cy = jnp.clip(bbox[:, 2] - row0, 0, height - 1) // cell_h
    cx = jnp.clip(bbox[:, 0], 0, width - 1) // cell_w
    oh_y = (cy[:, None] == jnp.arange(n_cy, dtype=cy.dtype)[None]
            ).astype(jnp.float32)
    rows = jnp.matmul(oh_y, tab, precision="highest")     # (F, n_cx*2)
    rows = rows.reshape(-1, n_cx, 2)
    oh_x = (cx[:, None] == jnp.arange(n_cx, dtype=cx.dtype)[None]
            ).astype(jnp.float32)
    stats = (rows * oh_x[:, :, None]).sum(axis=1)         # (F, 2)
    zmax_f, zmin_f = stats[:, 0], stats[:, 1]

    az, bz, cz = faces["aff"][:, 6], faces["aff"][:, 7], faces["aff"][:, 8]
    corners = [az * f32(bbox[:, i]) + bz * f32(bbox[:, j]) + cz
               for i in (0, 1) for j in (2, 3)]
    zs = [sign * c for c in corners]
    zs_lo = jnp.minimum(jnp.minimum(zs[0], zs[1]),
                        jnp.minimum(zs[2], zs[3]))
    zs_hi = jnp.maximum(jnp.maximum(zs[0], zs[1]),
                        jnp.maximum(zs[2], zs[3]))
    # Rounding slack for the kernel's z = az*x + bz*y + cz at any pixel of
    # the bbox (and for the corner evals above): a few roundings of terms
    # bounded by the intermediate magnitudes. The reference's linearized z
    # spans only ~1e-7 across a scene (near/far quirk), so the slack MUST
    # be ulp-scaled — any absolute epsilon swamps the whole z range and the
    # prune never fires. 16 ulps is ~5x the worst 3-term FMA chain.
    slack = (16 * 6e-8) * (jnp.abs(az) * width
                           + jnp.abs(bz) * (height + row0) + jnp.abs(cz))
    # The 2x2 stride-1 pool at the top-left cell covers a bbox spanning at
    # most 2 cells per axis: rows [y0, y0 + cell_h] stay within
    # [cy0, cy0 + 1] cells when the extent is <= cell size.
    fits = ((bbox[:, 3] - bbox[:, 2] <= cell_h) &
            (bbox[:, 1] - bbox[:, 0] <= cell_w))
    prunable = faces["z_write"] & fits
    dead = (zs_lo - slack > zmax_f) | (zs_hi + slack < zmin_f)
    return ~(prunable & dead)


@partial(jax.jit, static_argnames=("height", "width", "sign", "with_debug",
                                   "interpret", "want_tid"))
def visibility_pallas(faces, height, width, sign, with_debug=False,
                      interpret=False, bins=None, row0=0, want_tid=True):
    """Tile-binned visibility resolve. Returns (zbuf sign-space, tid).

    Face tables stream through the kernel in FACE_CHUNK slices (grid dim 2) so
    arbitrarily large meshes never exceed VMEM; the zbuf/tid output blocks are
    revisited across chunk steps (initialized at chunk 0) — the incremental
    claim is associative across chunks in face order.

    ``row0`` (traced) shifts the tile grid into the global frame for
    row-sharded rendering; pixel math stays in global coordinates, so shards
    are bit-identical to the matching single-chip rows.

    ``want_tid=False`` drops the tid plane entirely (returns (zbuf, None)):
    the tris-sharded pipeline discards the local winner ids — ids are only
    meaningful against the pmin-merged GLOBAL z-buffer, which tidpass_pallas
    re-claims after the collective (pipeline.py) — so pass 1 skips the tid
    output block and its per-visit store (~1/3 of each visit's stores,
    SURVEY §5.8).
    """
    fdata = pack_faces(faces, with_debug)
    g0 = fdata.shape[0]
    chunk = min(FACE_CHUNK, -(-g0 // 128) * 128)
    fdata = _pad_cols_128(_pad_rows_to(fdata, chunk))
    if bins is None:
        counts, idx, _ = face_bins(faces, height, width, row0=row0,
                                   with_debug=with_debug)
    else:
        counts, idx = bins
    n_chunks = fdata.shape[0] // chunk
    TILE_H = _tile_h(height)
    n_ty = _cdiv(height, TILE_H)
    n_tx = _cdiv(width, TILE_W)
    # row0 and the chunk-0 gid ride at the tail of the scalar-prefetch
    # counts vector (gid is linear in the global face index, so the kernel
    # reconstructs it as gid0 + c*chunk + f — no per-visit table read).
    counts1 = jnp.concatenate([counts.reshape(-1),
                               jnp.asarray(row0, jnp.int32).reshape(1),
                               faces["gid"][0].reshape(1)])

    def kernel(counts_ref, idx_ref, fdata_ref, zb_ref, tid_ref=None):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        c = pl.program_id(2)
        count = counts_ref[c * (n_ty * n_tx) + ty * n_tx + tx]
        gid0k = counts_ref[n_chunks * n_ty * n_tx + 1] + c * chunk
        y0f = (ty * TILE_H + counts_ref[n_chunks * n_ty * n_tx]).astype(
            jnp.float32)
        x0 = (tx * TILE_W).astype(jnp.float32)
        rows_s = jax.lax.broadcasted_iota(
            jnp.int32, (_FSLAB, TILE_W), 0).astype(jnp.float32) + y0f
        cols_s = jax.lax.broadcasted_iota(
            jnp.int32, (_FSLAB, TILE_W), 1).astype(jnp.float32) + x0

        @pl.when(c == 0)
        def _():
            zb_ref[:] = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)
            if tid_ref is not None:
                tid_ref[:] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)

        def body(k, _):
            # Single incremental pass: a claim against the *running* z-buffer
            # with last-tie overwrite yields exactly the reference's two-pass
            # result (pass-1 z writes + pass-3 re-test vs the final buffer,
            # triangular.py:99-118): any face claiming before the minimum
            # arrives is overwritten by the face that achieves it, and every
            # claim after that equals a final-buffer test.
            f, flags, s_base, n_slabs = _decode_bin(idx_ref[0, 0, k, 0])
            gid = gid0k + f

            def slab(s0):
                rows = rows_s + s0.astype(jnp.float32)

                def apply(cov, z):
                    zs = z * sign
                    zb_s = zb_ref[pl.ds(s0, _FSLAB), :]
                    upd = cov & (zb_s >= zs)
                    if tid_ref is not None:
                        tid_ref[pl.ds(s0, _FSLAB), :] = jnp.where(
                            upd, gid, tid_ref[pl.ds(s0, _FSLAB), :])
                    zb_ref[pl.ds(s0, _FSLAB), :] = jnp.where(
                        upd & ((flags & 4) > 0), zs, zb_s)

                _visit_claim(fdata_ref, f, flags, rows, cols_s,
                             with_debug, apply)
            _for_each_slab(s_base, n_slabs, slab, tile_h=TILE_H)
            return 0

        jax.lax.fori_loop(0, count, body, 0)

    tile_spec = pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, c, s: (ty, tx),
                             memory_space=pltpu.VMEM)
    tile_shape = (n_ty * TILE_H, n_tx * TILE_W)
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
        ],
        out_specs=[tile_spec, tile_spec] if want_tid else [tile_spec],
    )
    out_shape = [jax.ShapeDtypeStruct(tile_shape, jnp.float32)]
    if want_tid:
        out_shape.append(jax.ShapeDtypeStruct(tile_shape, jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(counts1, idx, fdata)
    if not want_tid:
        return outs[0][:height, :width], None
    zb, tid = outs
    return zb[:height, :width], tid[:height, :width]


# --------------------------------------------------------------- stencil

# Quad float payload: [0:12] sx, [12:24] sy, [24] Ax, [25] By, [26] Cz, [27] D
_Q_COLS = 128
# Quad int payload: [0:4] bbox, [4] count, [5] ok, [6] is_front.
_QI_COLS = 8

#: Stencil-kernel tile height, decoupled from the face kernels' TILE_H.
#: Stencil visits do FULL-tile vector work (no slab ranges — quads are
#: long slivers whose bbox rows rarely bound anything; per-slab pruning
#: measured 2x slower, f81898d), so tile height trades visit count
#: against vector width per visit. MEASURED (flagship 1024², round 3):
#: 32 rows 3.42 ms/call, 64 rows 2.39 (later 1.99), 128 rows best —
#: whole-frame 106.6 -> 111.4 fps; 256 gains nothing more (shadow quads
#: are tall but the extra width is wasted on the prunes' granularity).
#: STEN_TH stays the A/B knob.
_STEN_TH = int(__import__("os").environ.get("STEN_TH", 128))

#: Row granularity of the XLA-side stencil prunes (_bin_quads): coverage
#: and z-occlusion are tested per _STEN_SUB-row strip and OR-reduced to the
#: tile. Finer strips prune more visits (diagonal slivers, tight z maxima)
#: at 4x-per-halving XLA elementwise cost — all vector-parallel, the kernel
#: never sees it.
_STEN_SUB = int(__import__("os").environ.get("STEN_SUB", 32))

#: Row bound for the single-table stencil path (qdata fully VMEM-resident,
#: one global entry sort per tile, no chunk grid dim): 64k quads x 512 B =
#: 32 MB of VMEM under the raised 80 MB limit. Larger quad tables fall back
#: to the chunked-grid path.
_STEN_GLOBAL_ROWS = int(__import__("os").environ.get("STEN_GLOBAL", 65536))

#: Textured-face budget for the sampler's SMEM scalar words. Each textured
#: face rides 2 i32 words (word2 + wordg; 4 with a second shape group) in
#: the scalar-prefetch vector next to the bin counts. MEASURED on v5e
#: (tools/exp_highpoly.py): 131,328 faces = ~1.05 MB of scalar words
#: compiles and runs with the grid sampler on; the cap is a conservative
#: guard, env-overridable for probes, past which the pipeline falls back
#: to the XLA gather path instead of risking a scalar-memory compile error.
SMEM_FACE_CAP = int(__import__("os").environ.get(
    "TPU_RENDERER_SMEM_CAP", 160 * 1024))


#: Stencil bin-entry layout: sort key (no-overlap last) at bit 30, QUAD
#: index (chunk-local or global, see stencil_pallas's global path) in bits
#: [8:30), nverts [4:8), front [3]. With the key set and q at the 22-bit
#: maximum the entry is exactly 2^31 - 1 — the packing cannot widen.
_QENT_Q = 8
_QENT_QMASK = (1 << 22) - 1
assert (1 << _BIN_KEY) + (_QENT_QMASK << _QENT_Q) + 0xFF == 2 ** 31 - 1


def _bin_quads(qdata, qi, height, width, zmax_sub=None, sign=1,
               near=None, far=None, row0=0, q_base=0, sort=True,
               debug_keep=False):
    """Quad/tile lists with exact convex-coverage and z-occlusion pruning.

    Extruded shadow quads are long screen-space slivers: their bbox (the
    binning granule) covers ~30 tiles while the polygon itself crosses a
    handful. The per-edge functions are affine, so a polygon misses a region
    iff some active edge is <= 0 at all four region corners; the corner
    maximum separates per axis: max_c(cx*A + cy*B) = x0*A + TW*relu(A) +
    y0*B + TH*relu(B).

    Both the coverage and the z-occlusion tests run at _STEN_SUB-row
    SUB-slab granularity (a tile is kept iff ANY of its sub-slabs passes
    both): a diagonal sliver covers the full 128-row tile's y-range but
    only a narrow band of each 32-row strip, and the z-buffer maximum over
    a strip is much tighter than over the tile — visits prune that the
    tile-granular tests keep. This refinement is XLA-side only (elementwise
    + reduce, fully vector-parallel); the kernel is untouched. Round 3's
    2x-slower "slab prune" (f81898d) failed on KERNEL-side pl.when gating
    of per-slab sweeps, not on finer XLA tests.

    ``zmax_sub`` (n_ty * S, n_tx), S = _STEN_TH // _STEN_SUB: per-sub-slab
    maximum of the sign-space z-buffer over geometry pixels. Shadow volumes
    extrude 1000 units away from the light, so most of their area lies
    behind the visible surfaces and fails the kernel's depth test
    everywhere in a region: the quad's plane z is affine in (x, y), its
    linearization monotone, so the region minimum of sign-space quad depth
    sits at a corner — if even that exceeds the region's z-buffer maximum,
    no pixel can pass and the pair prunes (conservatively skipped across
    the linearization pole and degenerate planes).
    """
    e, _ = qdata.shape
    sub = min(_STEN_SUB, _STEN_TH)
    S = _STEN_TH // sub
    n_ty = _cdiv(height, _STEN_TH)
    n_tx = _cdiv(width, TILE_W)
    # Edge half-plane coefficients precomputed by pack_quads (inactive slots
    # encode an always-true (0, 0, 1) test, so no active mask is needed:
    # min(cm, 1) > 0 iff the active-edge minimum is > 0).
    A = qdata[:, 0:12]
    B = qdata[:, 12:24]
    K = qdata[:, 24:36]

    ty0 = (jnp.arange(n_ty * S, dtype=jnp.float32) * sub) + row0   # (TyS,)
    tx0 = (jnp.arange(n_tx, dtype=jnp.float32) * TILE_W)
    # corner_max[s, t, e, i] over each sub-slab rectangle, separably per axis.
    x_part = (tx0[:, None, None] * A + TILE_W * jnp.maximum(A, 0))  # (Tx,E,12)
    y_part = (ty0[:, None, None] * B + sub * jnp.maximum(B, 0))   # (TyS,E,12)
    # min over edges of corner_max; > 0 everywhere means possibly covered.
    # Evaluated edge-by-edge so only the (TyS, Tx, E) running minimum ever
    # materializes — the 4D broadcast would be ~100 MB per chunk at 32
    # sub-slabs and XLA fusing it away is not guaranteed.
    cmin = None
    for i in range(12):
        v = (y_part[:, None, :, i] + x_part[None, :, :, i]
             + K[None, None, :, i])
        cmin = v if cmin is None else jnp.minimum(cmin, v)
    keep = cmin > 0                                              # (TyS, Tx, E)

    bbox = qi[:, 0:4]
    b0, b1, b2, b3 = bbox[:, 0], bbox[:, 1], bbox[:, 2], bbox[:, 3]
    txi = jnp.arange(n_tx)
    tyis = jnp.arange(n_ty * S)
    ov_x = ((b0[None, :] < (txi[:, None] + 1) * TILE_W) &
            (b1[None, :] > txi[:, None] * TILE_W))
    ov_y = ((b2[None, :] < row0 + (tyis[:, None] + 1) * sub) &
            (b3[None, :] > row0 + tyis[:, None] * sub))          # (TyS, E)
    keep &= ov_y[:, None, :]

    if zmax_sub is not None:
        zx, zy, zd = qdata[:, 36], qdata[:, 37], qdata[:, 38]
        safe = jnp.ones(zx.shape, bool)
        x_lo = tx0[:, None] * zx + TILE_W * jnp.minimum(zx, 0)   # (Tx, E)
        x_hi = tx0[:, None] * zx + TILE_W * jnp.maximum(zx, 0)
        y_lo = ty0[:, None] * zy + sub * jnp.minimum(zy, 0)      # (TyS, E)
        y_hi = ty0[:, None] * zy + sub * jnp.maximum(zy, 0)
        zr_lo = y_lo[:, None] + x_lo[None] + zd                 # (TyS, Tx, E)
        zr_hi = y_hi[:, None] + x_hi[None] + zd
        nf2 = 2.0 * near * far
        fpn = far + near
        fmn = far - near
        q_lo = fpn - zr_lo * fmn
        q_hi = fpn - zr_hi * fmn
        # lin(z) = nf2/(fpn - z*fmn) is monotone increasing between poles;
        # sign-space minimum sits at zr_lo (sign=+1) or zr_hi (sign=-1).
        zr_at_min = zr_lo if sign > 0 else zr_hi
        zs_min = sign * nf2 / (fpn - zr_at_min * fmn)
        no_pole = (q_lo > 0) & (q_hi > 0)
        zmax = zmax_sub[:, :, None]
        # All-background regions have zmax == -inf: any finite quad depth
        # prunes them (zero slack so -inf + slack stays -inf, not NaN).
        slack = jnp.where(jnp.isfinite(zmax),
                          1e-6 * (jnp.abs(zmax) + 1.0), 0.0)
        pruned = safe[None, None] & no_pole & (zs_min > zmax + slack)
        keep &= ~pruned

    if debug_keep:
        # Instrumentation (tools/exp_stenband.py): per-sub-slab keep with
        # the bbox-x / validity terms folded in. Band statistics measured
        # with it (round 5): mean covered band 2.1 of 4 sub-slab groups on
        # the crowd scene — but restricting the kernel's vector work to
        # the covered band measured 32% SLOWER than the full-tile sweep
        # (static 4-way pl.when gating AND the _for_each_slab-style
        # dynamic-offset form): at a 2x row saving the scalar-gated
        # slicing stalls Mosaic's straight-line pipeline. Tried and
        # reverted; the face kernels' slab machinery wins only because its
        # row saving is ~64x.
        return (keep & ov_x[None, :, :] & (qi[:, 5] > 0)[None, None, :])

    # A tile keeps a quad iff ANY sub-slab keeps it.
    overlap = keep.reshape(n_ty, S, n_tx, e).any(axis=1)
    overlap &= ov_x[None, :, :] & (qi[:, 5] > 0)[None, None, :]

    overlap = overlap.reshape(n_ty * n_tx, e)
    counts = overlap.sum(axis=1, dtype=jnp.int32)
    # Packed entries like the face bins: key (bit 30, no-overlap last) above
    # quad index above nverts/front — one sort compacts in quad order, and
    # the kernel decodes everything from one scalar read. ``q_base`` offsets
    # the index into a global quad id (the single-table stencil path);
    # ``sort=False`` returns raw entries for a caller-side global sort.
    pay = (((jnp.arange(e, dtype=jnp.int32) + q_base) << _QENT_Q)
           | (jnp.clip(qi[:, 4], 0, 15) << 4) | (qi[:, 6] << 3))
    entries = pay[None, :] + ((~overlap).astype(jnp.int32) << _BIN_KEY)
    if sort:
        entries = jax.lax.sort(entries, dimension=1)
    return counts, entries


def pack_quads(screen, counts, ok, height, width, near, far):
    """Clipped shadow polygons -> dense tables + binning inputs.

    screen: (E, PMAX, 4) viewport-space clipped polygons; counts: (E,) active
    vertex counts; ok: (E,) silhouette ∧ count >= 3.
    """
    e, pmax = screen.shape[0], screen.shape[1]
    sx = screen[..., 0]
    sy = screen[..., 1]

    a = screen[:, 0, :3]
    nrm = jnp.cross(a - screen[:, 1, :3], a - screen[:, 2, :3])
    d_coef = -jnp.sum(a * nrm, axis=1)
    is_front = nrm[:, 2] < 0

    slots = jnp.arange(pmax)[None, :]
    active = slots < counts[:, None]
    big = jnp.float32(jnp.inf)
    min_x = jnp.maximum(jnp.min(jnp.where(active, sx, big), 1), 0)
    max_x = jnp.minimum(jnp.max(jnp.where(active, sx, -big), 1), width)
    min_y = jnp.maximum(jnp.min(jnp.where(active, sy, big), 1), 0)
    max_y = jnp.minimum(jnp.max(jnp.where(active, sy, -big), 1), height)
    box_valid = ~((min_x > max_x) | (min_y > max_y))
    bbox = jnp.ceil(jnp.stack([min_x, max_x, min_y, max_y], 1))
    bbox = jnp.where(jnp.isfinite(bbox), bbox, 0).astype(jnp.int32)

    pad = jnp.zeros((e, 12 - pmax), jnp.float32) if pmax < 12 else None
    sx12 = sx if pmax == 12 else jnp.concatenate([sx, pad], 1)
    sy12 = sy if pmax == 12 else jnp.concatenate([sy, pad], 1)
    sx12 = jnp.nan_to_num(sx12, nan=0.0, posinf=3e38, neginf=-3e38)
    sy12 = jnp.nan_to_num(sy12, nan=0.0, posinf=3e38, neginf=-3e38)
    # Edge half-plane coefficients, orientation folded in (shadow.py::
    # quad_edge_coeffs — the same values the XLA _quad_fragments path uses),
    # so the kernel evaluates 2 FMA + 1 compare per edge with no next-vertex
    # or active-slot logic. bboxf (cols 40-43) is kept for layout stability
    # but unread since the kernel dropped its redundant window test.
    from tpu_renderer.ops.shadow import quad_edge_coeffs
    eA, eB, eK = quad_edge_coeffs(sx12, sy12, counts.astype(jnp.int32),
                                  is_front)
    # Plane depth as an affine function of the pixel: z_raw = zx*x+zy*y+zd
    # (one guard for edge-on quads with nrm.z == 0 — they cover no pixels).
    czs = jnp.where(nrm[:, 2] == 0, 1.0, nrm[:, 2])
    zx = -nrm[:, 0] / czs
    zy = -nrm[:, 1] / czs
    zd = -d_coef / czs
    qdata = jnp.concatenate(
        [eA, eB, eK,
         zx[:, None], zy[:, None], zd[:, None],
         jnp.zeros_like(zd)[:, None],
         bbox.astype(jnp.float32)], axis=1)
    qdata = _pad_cols_128(qdata)

    qi = jnp.zeros((e, _QI_COLS), jnp.int32)
    qi = qi.at[:, 0:4].set(bbox)
    qi = qi.at[:, 4].set(counts.astype(jnp.int32))
    qi = qi.at[:, 5].set((ok & box_valid).astype(jnp.int32))
    qi = qi.at[:, 6].set(is_front.astype(jnp.int32))
    return qdata, qi


@partial(jax.jit, static_argnames=("height", "width", "sign", "interpret"))
def stencil_pallas(qdata, qi, zbuf, height, width, sign, near, far,
                   interpret=False, row0=0, zb_sign=None):
    """Tile-binned signed stencil accumulation against the final z-buffer.

    ``zb_sign``: optional sign-space z-buffer (what visibility_pallas
    already produces). When given, ``zbuf`` is ignored; when its shape also
    matches the tile-padded frame exactly (1024² does), the ~0.2 ms pad
    copy of the 4 MB buffer disappears. ``zbuf * sign`` equals ``zb_sign``
    bit-for-bit (sign is ±1), so all paths stay identical.
    """
    e0 = qdata.shape[0]
    chunk = min(FACE_CHUNK, -(-e0 // 128) * 128)
    qdata = _pad_rows_to(qdata, chunk)
    qi = _pad_rows_to(qi, chunk)
    e = qdata.shape[0]
    n_chunks = e // chunk
    n_ty = _cdiv(height, _STEN_TH)
    n_tx = _cdiv(width, TILE_W)
    src = zb_sign if zb_sign is not None else zbuf * sign
    if src.shape == (n_ty * _STEN_TH, n_tx * TILE_W):
        zb_pad = src
    else:
        zb_pad = jnp.full((n_ty * _STEN_TH, n_tx * TILE_W), jnp.inf,
                          jnp.float32)
        zb_pad = zb_pad.at[:height, :width].set(src)
    # Background pixels (z-buffer never written) are excluded from the Pallas
    # stencil: the frame never reads stencil there (background overrides in
    # shading, exactly like the reference's face-only pass 3), and treating
    # them as always-pass would defeat the z-occlusion prune — nearly every
    # tile contains some sky.
    finite = zb_pad < 3e38
    sub = min(_STEN_SUB, _STEN_TH)
    zmax_sub = jnp.where(finite, zb_pad, -jnp.inf).reshape(
        n_ty * (_STEN_TH // sub), sub, n_tx, TILE_W).max(axis=(1, 3))
    # The single-table ("global") path: bin each chunk raw with GLOBAL quad
    # ids, concatenate, one actives-first sort per tile, and hand the kernel
    # the WHOLE qdata as a resident VMEM block (no chunk grid dim). The
    # forced lane-padding of the entry table (below) then pays cap x T once
    # instead of chunk x T x n_chunks — at the 100k-face crowd scene that is
    # ~1 GB -> ~0.2 GB of HBM writes. Gated on qdata fitting VMEM.
    use_global = e <= _STEN_GLOBAL_ROWS
    counts_l, idx_l = [], []
    for c in range(n_chunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        cnt, ix = _bin_quads(qdata[sl], qi[sl], height, width,
                             zmax_sub=zmax_sub, sign=sign,
                             near=near, far=far, row0=row0,
                             q_base=c * chunk if use_global else 0,
                             sort=not use_global)
        counts_l.append(cnt)
        idx_l.append(ix)
    # The trailing unit LANE dim makes XLA pad this array to 128 lanes in
    # HBM — at 28k quads x 64 tiles the materialization alone costs
    # ~2.8 ms/frame (a ~1 GB write). It is FORCED: the kernel iterates
    # entries with dynamic scalar reads, Mosaic requires the dynamic index
    # on a sublane dim ("cannot statically prove that index in dimension 2
    # is a multiple of 128" for any lane-indexed variant), and lane-block 1
    # over a T-lane array violates the divisibility rule. Tried and
    # reverted (round 4): idx as (C, chunk, T) with per-tile lane blocks.
    # MITIGATED (round 5): the global path pays it once per tile, and the
    # entries are sorted actives-first, so slicing the table to a static
    # per-tile cap >= counts.max() is exact — the lax.cond below picks the
    # smallest cap level that covers the worst tile (full-table fallback
    # for pathological overlap).
    if use_global:
        counts = sum(counts_l)                               # (T,)
        entries = jnp.concatenate(idx_l, axis=1)             # (T, e)
        idx = jax.lax.sort(entries, dimension=1)[..., None]  # (T, e, 1)
    else:
        counts = jnp.stack(counts_l)                         # (C, T)
        idx = jnp.stack(idx_l)[..., None]                    # (C, T, ch, 1)
    zscal = jnp.stack([2.0 * near * far, far + near, far - near,
                       1.0 * row0]).astype(jnp.float32)

    def kernel(counts_ref, zscal_ref, idx_ref, qdata_ref, zb_ref,
               st_ref):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        if use_global:
            count = counts_ref[ty * n_tx + tx]
        else:
            c = pl.program_id(2)
            count = counts_ref[c * (n_ty * n_tx) + ty * n_tx + tx]
        nf2 = zscal_ref[0]
        fpn = zscal_ref[1]
        fmn = zscal_ref[2]
        y0 = (ty * _STEN_TH).astype(jnp.float32) + zscal_ref[3]
        x0 = (tx * TILE_W).astype(jnp.float32)
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (_STEN_TH, TILE_W), 0).astype(jnp.float32) + y0
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (_STEN_TH, TILE_W), 1).astype(jnp.float32) + x0

        if use_global:
            st_ref[:] = jnp.zeros((_STEN_TH, TILE_W), jnp.int32)
        else:
            @pl.when(pl.program_id(2) == 0)
            def _():
                st_ref[:] = jnp.zeros((_STEN_TH, TILE_W), jnp.int32)

        def body(k, _):
            if use_global:
                e_ent = idx_ref[0, k, 0]
            else:
                e_ent = idx_ref[0, 0, k, 0]
            q = (e_ent >> _QENT_Q) & _QENT_QMASK
            nverts = (e_ent >> 4) & 0xF
            front = (e_ent & 8) > 0
            co = _face_row(qdata_ref, q, (_STEN_TH, TILE_W))

            def edge_min(m, i):
                # Precomputed half-plane (orientation folded in, inactive
                # slots always-true (0,0,1)) — inside iff every edge value
                # is > 0, i.e. the running MINIMUM is > 0: min accumulation
                # replaces compare+and per edge and needs no bool vectors
                # (Mosaic handles f32 min better than i1 chains).
                cross = co(i) * cols + co(12 + i) * rows + co(24 + i)
                return jnp.minimum(m, cross) if m is not None else cross

            def tail(m):
                # No bbox window test: the polygon is convex and its ceil'd
                # bbox CONTAINS the strict-edge-test interior (a pixel at or
                # beyond the extreme vertex of a convex polygon cannot be
                # strictly inside every half-plane), so the four per-pixel
                # window minimums were redundant with the edge minimum —
                # dropping them cuts ~30% of per-visit vector work. The XLA
                # _quad_fragments path drops the same test (identical mask
                # expressions keep the backends bit-identical); frame-pad
                # rows are excluded by the zb < 3e38 term below.

                # zb >= sign*nf2/q  <=>  (zb*q - sign*nf2 >= 0) == (q > 0):
                # the multiply-compare form skips two full-tile f32 divides.
                # Same expression as the XLA _quad_fragments path —
                # identical stencils. Geometry pixels only: background
                # (unwritten z) never reads the stencil in shading, and
                # excluding it enables the z-occlusion prune in _bin_quads.
                zraw = co(36) * cols + co(37) * rows + co(38)
                qden = fpn - zraw * fmn
                pass_z = (((zb_ref[:] * qden - sign * nf2 >= 0)
                           == (qden > 0)) & (zb_ref[:] < 3e38))

                contrib = jnp.where(front, 1, -1).astype(jnp.int32)
                mask = (m > 0) & pass_z
                st_ref[:] = st_ref[:] + jnp.where(mask, contrib, 0)

            # Clipped polys average ~4 vertices: the common case runs 4
            # edges + tail straight-line with NO scratch traffic; rarer
            # >4-vertex polys recompute all 12 slots (inactive ones are
            # always-true) in their own branch. Duplicating the tail in two
            # pl.when bodies beats carrying a vector through a scratch ref:
            # exactly one branch executes per visit.
            @pl.when(nverts <= 4)
            def _():
                m = None
                for i in range(4):
                    m = edge_min(m, i)
                tail(m)

            @pl.when(nverts > 4)
            def _():
                m = None
                for i in range(12):
                    m = edge_min(m, i)
                tail(m)
            return 0

        jax.lax.fori_loop(0, count, body, 0)

    def call(cap):
        if use_global:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_ty, n_tx),
                in_specs=[
                    pl.BlockSpec((1, cap, 1),
                                 lambda ty, tx, cn, s: (ty * n_tx + tx,
                                                        0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((e, _Q_COLS),
                                 lambda ty, tx, cn, s: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((_STEN_TH, TILE_W),
                                 lambda ty, tx, cn, s: (ty, tx),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((_STEN_TH, TILE_W),
                                 lambda ty, tx, cn, s: (ty, tx),
                                 memory_space=pltpu.VMEM),
                ],
            )
            args = lambda: (counts, zscal, idx[:, :cap, :], qdata, zb_pad)
        else:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(n_ty, n_tx, n_chunks),
                in_specs=[
                    pl.BlockSpec((1, 1, cap, 1),
                                 lambda ty, tx, c, cn, s: (c,
                                                           ty * n_tx + tx,
                                                           0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((chunk, _Q_COLS),
                                 lambda ty, tx, c, cn, s: (c, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((_STEN_TH, TILE_W),
                                 lambda ty, tx, c, cn, s: (ty, tx),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((_STEN_TH, TILE_W),
                                 lambda ty, tx, c, cn, s: (ty, tx),
                                 memory_space=pltpu.VMEM),
                ],
            )
            args = lambda: (counts.reshape(-1), zscal, idx[:, :, :cap, :],
                            qdata, zb_pad)

        def run(_):
            (stencil,) = pl.pallas_call(
                kernel,
                grid_spec=grid_spec,
                out_shape=[
                    jax.ShapeDtypeStruct((n_ty * _STEN_TH, n_tx * TILE_W),
                                         jnp.int32),
                ],
                interpret=interpret,
                # qdata rides fully VMEM-resident on the global path
                # (~0.5 KB/quad); the 16 MB scoped default is a compiler
                # guard (v5e has 128 MB).
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=80 * 2 ** 20),
            )(*args())
            return stencil
        return run

    if use_global:
        cap_top = e
        cap_opts = (1024, 2048, 4096, 8192, 16384)
    else:
        cap_top = chunk
        cap_opts = (1024, chunk // 4)
    caps = sorted({c for c in cap_opts if 0 < c < cap_top} | {cap_top})
    branch = call(caps[-1])
    maxc = counts.max()
    for cap in reversed(caps[:-1]):
        branch = (lambda cap_, small, big:
                  lambda _: jax.lax.cond(maxc <= cap_, small, big, None))(
                      cap, call(cap), branch)
    stencil = branch(None)
    return stencil[:height, :width]


# ------------------------------------------------------------- G-buffer

#: Channel layout of the forward-interpolated G-buffer (general shader).
#: Interpolated with perspective-corrected weights inside the kernel; constant
#: per-face channels broadcast to winning pixels. See _shade_gbuffer.
GB_WORLD = 0        # 0-2   fragment world position
GB_IU = 3           # 3     interpolated u
GB_IV = 4           # 4     interpolated v
GB_N = 5            # 5-7   interpolated vertex normal (unnormalized)
GB_TAN = 8          # 8-10  tangent (unnormalized)
GB_BIT = 11         # 11-13 bitangent (unnormalized)
GB_KD = 14          # 14-16 material Kd
GB_KS = 17          # 17-19 material Ks
GB_NS = 20          # 20    specular exponent
GB_KD_SLOT = 21     # 21    diffuse-map slot (-1 none), 22-23 its (TH, TW)
GB_NORM_SLOT = 24   # 24    normal-map slot, 25-26 (TH, TW), 27 tangent flag
GB_KS_SLOT = 28     # 28    specular-map slot, 29-30 (TH, TW)
GB_MODEL = 31       # 31    model id
GB_CHANNELS = 32

# Extra per-face float columns appended to fdata when the G-buffer is on:
# [0:9] world xyz per vertex, [9:15] u0 u1 u2 v0 v1 v2, [15:24] vn per vertex,
# [24:27] kd, [27:30] ks, [30] ns, [31] kd_slot, [32:34] kd (TH, TW),
# [34] norm_slot, [35:37] norm (TH, TW), [37] norm_tangent, [38] ks_slot,
# [39:41] ks (TH, TW), [41] model_id.
_GB_EXTRA = 42


def pack_face_attrs(attrs):
    """Shading attribute dict (pipeline attrs layout) -> (G, _GB_EXTRA) f32."""
    g = attrs["world"].shape[0]
    cols = [
        attrs["world"].reshape(g, 9),
        attrs["uv"][..., 0],                       # u0 u1 u2
        attrs["uv"][..., 1],                       # v0 v1 v2
        attrs["vn"].reshape(g, 9),
        attrs["kd"], attrs["ks"], attrs["ns"][:, None],
        attrs["kd_slot"][:, None].astype(jnp.float32),
        attrs["kd_shape"],
        attrs["norm_slot"][:, None].astype(jnp.float32),
        attrs["norm_shape"],
        attrs["norm_tangent"][:, None].astype(jnp.float32),
        attrs["ks_slot"][:, None].astype(jnp.float32),
        attrs["ks_shape"],
        attrs["model_id"][:, None].astype(jnp.float32),
    ]
    return jnp.concatenate(cols, axis=1)


# Slim G-buffer layouts for the non-general shaders (reference
# triangular.py:174-182, 220-266). These shaders read no textures, so the
# kernel interpolates only what their lighting consumes — and with RAW screen
# barycentric weights, exactly like the reference (gouraud/pbr use ``bar``,
# not ``screen_perspective``). Channel maps:
#   flat:    [0:3] face world normal (constant per face)
#   gouraud: [0:3] screen-bar-interpolated vertex normal (unnormalized)
#   pbr:     [0:3] interp vn, [3:6] interp (sx, sy, z_lin) screen position,
#            [6] Pm, [7] Pr, [8:11] Ka
_SLIM_CHANNELS = {"flat": 3, "gouraud": 3, "pbr": 11}


def pack_slim_attrs(attrs, layout):
    """Shading attrs -> slim per-face fdata columns (see _SLIM_CHANNELS)."""
    g = attrs["vn"].shape[0]
    if layout == "flat":
        cols = [attrs["face_normal"]]
    elif layout == "gouraud":
        cols = [attrs["vn"].reshape(g, 9)]
    elif layout == "pbr":
        cols = [attrs["vn"].reshape(g, 9),
                attrs["sx"], attrs["sy"], attrs["szlin"],
                attrs["pm"][:, None], attrs["pr"][:, None], attrs["ka"]]
    else:
        raise ValueError(f"unknown slim layout {layout!r}")
    return jnp.concatenate(cols, axis=1)


def _slim_interp_face(co, X, rows, cols, put, layout):
    """Slim phase-1 body: screen-barycentric interpolation of the 3-11
    channels the flat/gouraud/pbr shaders read (same affine u/v/w expression
    as _face_tile_cov, so the values match pipeline._shade's XLA path)."""
    if layout == "flat":
        for ci in range(3):
            put(ci, co(X + ci))
        return
    v = co(0) * cols + co(1) * rows + co(2)
    w = co(3) * cols + co(4) * rows + co(5)
    u = 1.0 - v - w

    def interp(c0, c1, c2):
        return u * c0 + v * c1 + w * c2

    nv = [co(X + i) for i in range(9)]
    for ci in range(3):
        put(ci, interp(nv[ci], nv[3 + ci], nv[6 + ci]))
    if layout == "pbr":
        for ci in range(3):                        # sx / sy / z_lin triples
            b = X + 9 + 3 * ci
            put(3 + ci, interp(co(b), co(b + 1), co(b + 2)))
        put(6, co(X + 18))
        put(7, co(X + 19))
        for ci in range(3):
            put(8 + ci, co(X + 20 + ci))


def _gb_interp_face(co, X, rows, cols, put, with_tex_tables):
    """Interpolate one face's G-buffer channels over a tile (phase-1 body).

    Shared by the fused visibility+G-buffer kernel and the standalone
    sharded G-buffer kernel. ``put(channel, value)`` applies the caller's
    winner-masked write; ``co(c)`` broadcasts fdata column c (_face_row —
    the ~45 per-visit face scalars arrive as one VMEM row load + lane
    shuffles). Tangent/bitangent solve the reference's per-pixel TBN system
    (core.py:191-224) in closed form via the adjugate.
    """
    # Screen barycentric (same affine coefficients as _face_tile_cov).
    v = co(0) * cols + co(1) * rows + co(2)
    w = co(3) * cols + co(4) * rows + co(5)
    u = 1.0 - v - w
    # Perspective-corrected weights (core.py:155-160).
    iw0, iw1, iw2 = co(9), co(10), co(11)
    su, sv, sw = u * iw0, v * iw1, w * iw2
    inv_s = 1.0 / (su + sv + sw)
    pb0, pb1, pb2 = su * inv_s, sv * inv_s, sw * inv_s

    def interp(c0, c1, c2):
        return pb0 * c0 + pb1 * c1 + pb2 * c2

    # World position.
    wx = [co(X + i) for i in range(9)]
    for ci in range(3):
        put(GB_WORLD + ci, interp(wx[ci], wx[3 + ci], wx[6 + ci]))
    # UV.
    u0, u1, u2 = (co(X + 9), co(X + 10),
                  co(X + 11))
    vv0, vv1, vv2 = (co(X + 12), co(X + 13),
                     co(X + 14))
    iu_val = interp(u0, u1, u2)
    iv_val = interp(vv0, vv1, vv2)
    put(GB_IU, iu_val)
    put(GB_IV, iv_val)
    # Vertex normal.
    nv = [co(X + 15 + i) for i in range(9)]
    n = [interp(nv[0], nv[3], nv[6]),
         interp(nv[1], nv[4], nv[7]),
         interp(nv[2], nv[5], nv[8])]
    for ci in range(3):
        put(GB_N + ci, n[ci])
    # Tangent/bitangent via adjugate (du2 = dv2 = 0).
    e1 = [wx[3] - wx[0], wx[4] - wx[1], wx[5] - wx[2]]
    e2 = [wx[6] - wx[0], wx[7] - wx[1], wx[8] - wx[2]]
    c0 = [e2[1] * n[2] - e2[2] * n[1],
          e2[2] * n[0] - e2[0] * n[2],
          e2[0] * n[1] - e2[1] * n[0]]
    c1 = [n[1] * e1[2] - n[2] * e1[1],
          n[2] * e1[0] - n[0] * e1[2],
          n[0] * e1[1] - n[1] * e1[0]]
    det = e1[0] * c0[0] + e1[1] * c0[1] + e1[2] * c0[2]
    inv_det = 1.0 / det
    du0, du1 = u1 - u0, u2 - u0
    dv0, dv1 = vv1 - vv0, vv2 - vv0
    for ci in range(3):
        put(GB_TAN + ci, (c0[ci] * du0 + c1[ci] * du1) * inv_det)
        put(GB_BIT + ci, (c0[ci] * dv0 + c1[ci] * dv1) * inv_det)
    # Constant material channels.
    for ci in range(3):
        put(GB_KD + ci, co(X + 24 + ci))
        put(GB_KS + ci, co(X + 27 + ci))
    put(GB_NS, co(X + 30))
    if with_tex_tables:
        # slots/shapes — only the XLA gather path reads them; the windowed
        # sampler gets its per-face table from sdata instead.
        for off in range(10):
            if off == GB_NORM_SLOT + 3 - GB_KD_SLOT:
                continue
            put(GB_KD_SLOT + off, co(X + 31 + off))
    # Tangent flag + model id: read by shading on both paths.
    put(GB_NORM_SLOT + 3,
        co(X + 31 + GB_NORM_SLOT + 3 - GB_KD_SLOT))
    put(GB_MODEL, co(X + 41))
    return iu_val, iv_val



@partial(jax.jit, static_argnames=("height", "width", "sign", "with_debug",
                                   "interpret", "with_tex_tables", "n_kinds",
                                   "mode", "gb_layout", "two_groups",
                                   "win_grid"))
def visibility_gbuffer_pallas(faces, attrs, height, width, sign,
                              with_debug=False, interpret=False, bins=None,
                              with_tex_tables=True, windows=None, n_kinds=0,
                              mode="full", row0=0, gb_layout="general",
                              two_groups=False, win_grid=False,
                              tid_in=None):
    """Visibility resolve + forward-interpolated G-buffer, one kernel.

    Per-pixel attribute gathers (table[tid]) are pathologically slow in XLA on
    TPU (~8 ms per gather at 1 MPx); instead a second per-tile phase re-visits
    each binned face, and where ``tid == gid`` writes the interpolated
    channels — every per-face scalar is already in VMEM. Tangent/bitangent
    solve the reference's per-pixel TBN system (core.py:191-224) in closed
    form: with A rows (b-a, c-a, n) and adjugate columns c0 = e2 x n,
    c1 = n x e1, T = (c0*du0 + c1*du1)/det (the du/dv third component is 0, so
    the constant c2 column drops out; normalization of n cancels).

    Face tables stream through grid dim 2 in FACE_CHUNK slices, visited twice:
    phase 0 (chunks 0..n-1) resolves z + winner ids incrementally; phase 1
    (chunks n..2n-1) interpolates the G-buffer against the final ids — output
    blocks persist across the chunk steps of a tile.

    With ``windows`` (the per-face texel window table, see
    sample_textures_pallas), phase 1 also samples textures right after
    interpolating iu/iv in-register — the winner mask, slab scan, and UV
    math are shared instead of re-derived by a third kernel pass, and the
    iu/iv G-buffer round-trip through HBM disappears. Returns
    (zbuf, tid, gbuffer, samp, mask) in that case, else (zbuf, tid, gbuffer).

    ``tid_in`` (the SPLIT pipeline, ops/pipeline.py): the winner-id plane
    arrives as an INPUT block and only phase 1 runs — the caller resolved
    visibility with visibility_pallas and pruned these bins to faces that
    could have won pixels (phase1_keep), so the grid is (ty, tx, n_chunks)
    and the zbuf/tid outputs disappear. Returns (gbuffer[, samp, mask]).
    Pixel expressions are shared with the fused path — identical frames.
    """
    split = tid_in is not None
    assert not (split and mode == "nogb"), "nogb debug mode writes tid"
    fdata0 = pack_faces(faces, with_debug)
    base_cols = fdata0.shape[1]
    extra = (pack_face_attrs(attrs) if gb_layout == "general"
             else pack_slim_attrs(attrs, gb_layout))
    n_gb = (GB_CHANNELS if gb_layout == "general"
            else _SLIM_CHANNELS[gb_layout])
    fdata = jnp.concatenate([fdata0, extra], axis=1)
    g0 = fdata.shape[0]
    chunk = min(FACE_CHUNK, -(-g0 // 128) * 128)
    fdata = _pad_rows_to(fdata, chunk)
    if bins is None:
        counts, idx, _ = face_bins(faces, height, width, row0=row0,
                                   with_debug=with_debug)
    else:
        counts, idx = bins
    n_chunks = fdata.shape[0] // chunk
    TILE_H = _tile_h(height)
    n_ty = _cdiv(height, TILE_H)
    n_tx = _cdiv(width, TILE_W)
    X = base_cols                                  # extra-column base offset
    sampling = windows is not None
    assert not (sampling and gb_layout != "general"), (
        "the windowed sampler is a general-shader feature (slim layouts "
        "read no textures)")
    if sampling:
        sdata = _pad_rows_to(pack_sample_faces(faces), chunk)
        word2 = _pad_rows_to(pack_sample_word2(faces), chunk)
        # word2 rides in SMEM (scalar-prefetch): per-visit scalar reads from
        # SMEM are ~free vs ~38 cycles from a VMEM table. SMEM is finite —
        # bound the mesh size this path accepts (see SMEM_FACE_CAP).
        assert word2.shape[0] <= SMEM_FACE_CAP, (
            f"textured mesh ({word2.shape[0]} faces) exceeds SMEM_FACE_CAP="
            f"{SMEM_FACE_CAP}; the pipeline should have fallen back to the "
            "XLA gather path")
        wrows = windows.shape[1]
        # Texture shape / window-grid origin as f32 fdata columns: their
        # uses are all vector math, so they arrive as VREG broadcasts.
        # Cols X2+4.. hold the second shape-group's grid when present.
        X2 = fdata.shape[1]
        xcols = [faces["wthw"][:, 0], faces["wthw"][:, 1],
                 faces["wrbase"], faces["wcbase"]]
        if two_groups:
            word3 = _pad_rows_to(pack_sample_word2(faces, grid=2), chunk)
            xcols += [faces["wthw2"][:, 0], faces["wthw2"][:, 1],
                      faces["wrbase2"], faces["wcbase2"]]
        fdata = jnp.concatenate([
            fdata,
            _pad_rows_to(jnp.stack(xcols, axis=1).astype(jnp.float32),
                         chunk)], axis=1)
    fdata = _pad_cols_128(fdata)

    def kernel(counts_ref, idx_ref, fdata_ref, *rest):
        zb_ref = None
        if sampling and win_grid:
            # Shared-cell mode: the whole window-cell table is a resident
            # VMEM input block (constant index map -> fetched once); no
            # speculative DMA machinery at all.
            if split:
                (sdata_ref, win_hbm, tid_ref, gb_ref, samp_ref,
                 mask_ref) = rest
            else:
                (sdata_ref, win_hbm, zb_ref, tid_ref, gb_ref, samp_ref,
                 mask_ref) = rest
        elif sampling:
            if split:
                (sdata_ref, win_hbm, tid_ref, gb_ref, samp_ref,
                 mask_ref, spec, sync, sems, sems2, sem_sync) = rest
            else:
                (sdata_ref, win_hbm, zb_ref, tid_ref, gb_ref, samp_ref,
                 mask_ref, spec, sync, sems, sems2, sem_sync) = rest
        elif split:
            tid_ref, gb_ref = rest
        else:
            zb_ref, tid_ref, gb_ref = rest
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        step = pl.program_id(2)
        if split:
            phase = jnp.bool_(True)
            c = step
        else:
            phase = step >= n_chunks
            c = step - n_chunks * phase.astype(jnp.int32)
        count = counts_ref[c * (n_ty * n_tx) + ty * n_tx + tx]
        gid0k = counts_ref[n_chunks * n_ty * n_tx + 1] + c * chunk
        y0f = (ty * TILE_H + counts_ref[n_chunks * n_ty * n_tx]).astype(
            jnp.float32)
        x0 = (tx * TILE_W).astype(jnp.float32)
        rows_s = jax.lax.broadcasted_iota(
            jnp.int32, (_FSLAB, TILE_W), 0).astype(jnp.float32)
        cols_s = jax.lax.broadcasted_iota(
            jnp.int32, (_FSLAB, TILE_W), 1).astype(jnp.float32) + x0

        @pl.when(step == 0)
        def _():
            if not split:
                zb_ref[:] = jnp.full((TILE_H, TILE_W), jnp.inf, jnp.float32)
                tid_ref[:] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)
            gb_ref[:] = jnp.zeros((n_gb, TILE_H, TILE_W), jnp.float32)
            if sampling:
                samp_ref[:] = jnp.zeros((n_kinds, TILE_H, TILE_W), jnp.int32)
                mask_ref[:] = jnp.zeros((TILE_H, TILE_W), jnp.int32)

        if sampling:
            w2base = n_chunks * n_ty * n_tx + 2 + c * chunk
            # word3 (second grid) rides after the full word2 block; the
            # grid-mode word-g blocks follow whatever word2/3 blocks exist.
            w3base = w2base + n_chunks * chunk
            wgbase = w2base + n_chunks * chunk * (2 if two_groups else 1)
            wg2base = wgbase + n_chunks * chunk
        if sampling and win_grid:
            def prefetch(k, buf):
                pass

            def drain(buf, w2):
                pass
        elif sampling:
            # Speculative window DMA, split in two: most faces have a 1-2
            # window grid, so the first pair copies unconditionally and the
            # second pair only when wn > 2 — ~halves the speculative HBM
            # traffic (the single (SPEC, ..) block measured 0.79 ms of the
            # 1024² frame, tools/exp_fused.py dmaonly mode).
            def spec_dma_lo(buf, wb):
                return pltpu.make_async_copy(
                    win_hbm.at[pl.ds(wb, _SPEC // 2)],
                    spec.at[buf, 0:_SPEC // 2], sems.at[buf])

            def spec_dma_hi(buf, wb):
                return pltpu.make_async_copy(
                    win_hbm.at[pl.ds(wb + _SPEC // 2, _SPEC // 2)],
                    spec.at[buf, _SPEC // 2:_SPEC], sems2.at[buf])

            def prefetch(k, buf):
                fp = (idx_ref[0, 0, k, 0] >> _BIN_F) & _BIN_FMASK
                w2p = counts_ref[w2base + fp]
                spec_dma_lo(buf, w2p >> _W2_WB).start()

                @pl.when(((w2p >> _W2_WN) & 7) > _SPEC // 2)
                def _():
                    spec_dma_hi(buf, w2p >> _W2_WB).start()

            def drain(buf, w2):
                spec_dma_lo(buf, w2 >> _W2_WB).wait()

                @pl.when(((w2 >> _W2_WN) & 7) > _SPEC // 2)
                def _():
                    spec_dma_hi(buf, w2 >> _W2_WB).wait()

        @pl.when(jnp.logical_not(phase))
        def _():
            if split:
                return                     # phase 0 ran in visibility_pallas
            def body(k, _):
                # Single incremental z+id pass — see visibility_pallas.
                f, flags, s_base, n_slabs = _decode_bin(idx_ref[0, 0, k, 0])
                gid = gid0k + f

                def slab(s0):
                    rows = rows_s + y0f + s0.astype(jnp.float32)

                    def apply(cov, z):
                        zs = z * sign
                        zb_s = zb_ref[pl.ds(s0, _FSLAB), :]
                        upd = cov & (zb_s >= zs)
                        tid_ref[pl.ds(s0, _FSLAB), :] = jnp.where(
                            upd, gid, tid_ref[pl.ds(s0, _FSLAB), :])
                        zb_ref[pl.ds(s0, _FSLAB), :] = jnp.where(
                            upd & ((flags & 4) > 0), zs, zb_s)

                    _visit_claim(fdata_ref, f, flags, rows,
                                 cols_s, with_debug, apply)
                _for_each_slab(s_base, n_slabs, slab, tile_h=TILE_H)
                return 0

            jax.lax.fori_loop(0, count, body, 0)

        _dbg_p1 = mode != "zonly"
        _dbg_interp = mode not in ("zonly", "nogb")
        _dbg_samp = mode in ("full", "nosweep", "dmaonly")
        _dbg_sweep = mode != "nosweep"    # window visits + DMA, no gathers
        _dbg_visit = mode != "dmaonly"    # prefetch/wait DMAs, no visits

        @pl.when(phase & _dbg_p1)
        def _():
            if sampling and _dbg_samp and not win_grid:
                @pl.when(count > 0)
                def _():
                    prefetch(0, 0)

            def gbody(k, _):
                f, flags, s_base, n_slabs = _decode_bin(idx_ref[0, 0, k, 0])
                gid = gid0k + f
                buf = jax.lax.rem(k, 2)
                if sampling and _dbg_samp:
                    w2 = counts_ref[w2base + f]
                    if win_grid:
                        wg = counts_ref[wgbase + f]
                        wg2 = (counts_ref[wg2base + f] if two_groups
                               else None)
                    else:
                        # Start face k+1's speculative windows, then drain
                        # this face's (same double-buffer protocol as the
                        # standalone sampler kernel).
                        @pl.when(k + 1 < count)
                        def _():
                            prefetch(k + 1, 1 - buf)
                        drain(buf, w2)
                co = _face_row(fdata_ref, f, (_FSLAB, TILE_W))

                def slab(s0):
                    win = tid_ref[pl.ds(s0, _FSLAB), :] == gid

                    @pl.when(jnp.any(win))
                    def _():
                        if not _dbg_interp:
                            tid_ref[pl.ds(s0, _FSLAB), :] = jnp.where(
                                win, gid, tid_ref[pl.ds(s0, _FSLAB), :])
                            return
                        rows = rows_s + y0f + s0.astype(jnp.float32)

                        def put(ch, val):
                            gb_ref[ch, pl.ds(s0, _FSLAB), :] = jnp.where(
                                win, val, gb_ref[ch, pl.ds(s0, _FSLAB), :])

                        if gb_layout != "general":
                            _slim_interp_face(co, X, rows, cols_s, put,
                                              gb_layout)
                            return
                        iu_val, iv_val = _gb_interp_face(
                            co, X, rows, cols_s, put, with_tex_tables)
                        if sampling and _dbg_samp and _dbg_visit:
                            _spec, _sync, _ssem = (
                                (None, None, None) if win_grid
                                else (spec, sync, sem_sync))
                            _rb = (jnp.int32(0) if win_grid
                                   else co(X2 + 2).astype(jnp.int32))
                            _cb = (jnp.int32(0) if win_grid
                                   else co(X2 + 3).astype(jnp.int32))

                            @pl.when((w2 & 7) > 0)
                            def _():
                                _sample_face_slab(
                                    sdata_ref, f, w2 >> _W2_WB,
                                    (w2 >> _W2_WN) & 7,
                                    (w2 >> _W2_NWC) & 7, w2 & 7,
                                    co(X2).astype(jnp.int32),
                                    co(X2 + 1).astype(jnp.int32),
                                    _rb, _cb,
                                    buf, s0, win, iu_val,
                                    iv_val, _spec, _sync, _ssem, win_hbm,
                                    samp_ref, mask_ref, n_kinds,
                                    sweep=_dbg_sweep, kind_gate=two_groups,
                                    grid=((win_hbm, wg) if win_grid
                                          else None))
                            if two_groups:
                                # Second shape-group grid: synchronous
                                # window DMA only (spec_n=0 — the
                                # speculative buffer holds grid 1), its own
                                # footprint columns, per-kind write gating.
                                # In grid mode it reads the shared cell
                                # table like group 1, via its own word-g.
                                w3 = counts_ref[w3base + f]
                                _rb2 = (jnp.int32(0) if win_grid
                                        else co(X2 + 6).astype(jnp.int32))
                                _cb2 = (jnp.int32(0) if win_grid
                                        else co(X2 + 7).astype(jnp.int32))

                                @pl.when((w3 & 7) > 0)
                                def _():
                                    _sample_face_slab(
                                        sdata_ref, f, w3 >> _W2_WB,
                                        (w3 >> _W2_WN) & 7,
                                        (w3 >> _W2_NWC) & 7, w3 & 7,
                                        co(X2 + 4).astype(jnp.int32),
                                        co(X2 + 5).astype(jnp.int32),
                                        _rb2, _cb2,
                                        buf, s0, win, iu_val,
                                        iv_val, _spec, _sync, _ssem,
                                        win_hbm, samp_ref, mask_ref,
                                        n_kinds, sweep=_dbg_sweep,
                                        spec_n=0,
                                        cols_fp=(_S2_NWR, _S2_NWC,
                                                 _S2_RB, _S2_CB),
                                        kind_gate=True,
                                        grid=((win_hbm, wg2) if win_grid
                                              else None))
                _for_each_slab(s_base, n_slabs, slab, tile_h=TILE_H)
                return 0

            jax.lax.fori_loop(0, count, gbody, 0)

    phase_fold = lambda st: st - n_chunks * (st >= n_chunks).astype(jnp.int32)
    in_specs = [
        pl.BlockSpec(
            (1, 1, chunk, 1),
            lambda ty, tx, st, s: (phase_fold(st), ty * n_tx + tx, 0, 0),
            memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (chunk, fdata.shape[1]),
            lambda ty, tx, st, s: (phase_fold(st), 0),
            memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, st, s: (ty, tx),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, st, s: (ty, tx),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_gb, TILE_H, TILE_W),
                     lambda ty, tx, st, s: (0, ty, tx),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_ty * TILE_H, n_tx * TILE_W), jnp.float32),
        jax.ShapeDtypeStruct((n_ty * TILE_H, n_tx * TILE_W), jnp.int32),
        jax.ShapeDtypeStruct(
            (n_gb, n_ty * TILE_H, n_tx * TILE_W), jnp.float32),
    ]
    if split:
        # Split pipeline: zbuf/tid came from visibility_pallas — only the
        # G-buffer (+ sampler planes below) are produced here.
        out_specs = out_specs[2:]
        out_shape = out_shape[2:]
    scratch_shapes = []
    tail = [counts.reshape(-1), jnp.asarray(row0, jnp.int32).reshape(1),
            faces["gid"][0].reshape(1)]
    if sampling:
        tail.append(word2)
        if two_groups:
            tail.append(word3)
        if win_grid:
            tail.append(_pad_rows_to(pack_sample_wordg(faces), chunk))
            if two_groups:
                tail.append(
                    _pad_rows_to(pack_sample_wordg(faces, grid=2), chunk))
    counts1 = jnp.concatenate(tail)
    inputs = [counts1, idx, fdata]
    if sampling:
        in_specs += [
            pl.BlockSpec((chunk, _S_COLS),
                         lambda ty, tx, st, s: (phase_fold(st), 0),
                         memory_space=pltpu.VMEM),
            # Shared-cell grid mode: the whole cell table is one VMEM block
            # with a constant index map — fetched once per kernel call,
            # then every visit reads its cell directly (no DMAs). The DMA
            # mode streams windows from HBM instead.
            (pl.BlockSpec(windows.shape, lambda ty, tx, st, s: (0, 0, 0),
                          memory_space=pltpu.VMEM) if win_grid
             else pl.BlockSpec(memory_space=pl.ANY)),
        ]
        out_specs += [
            pl.BlockSpec((n_kinds, TILE_H, TILE_W),
                         lambda ty, tx, st, s: (0, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, st, s: (ty, tx),
                         memory_space=pltpu.VMEM),
        ]
        out_shape += [
            jax.ShapeDtypeStruct(
                (n_kinds, n_ty * TILE_H, n_tx * TILE_W), jnp.int32),
            jax.ShapeDtypeStruct((n_ty * TILE_H, n_tx * TILE_W), jnp.int32),
        ]
        if not win_grid:
            scratch_shapes = [
                pltpu.VMEM((2, _SPEC, wrows, WIN_C), jnp.int32),
                pltpu.VMEM((wrows, WIN_C), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
            ]
        inputs += [sdata, windows]
    if split:
        tid_pad = tid_in
        if tid_pad.shape != (n_ty * TILE_H, n_tx * TILE_W):
            tid_pad = jnp.pad(
                tid_pad, ((0, n_ty * TILE_H - tid_pad.shape[0]),
                          (0, n_tx * TILE_W - tid_pad.shape[1])),
                constant_values=-1)
        in_specs.append(pl.BlockSpec((TILE_H, TILE_W),
                                     lambda ty, tx, st, s: (ty, tx),
                                     memory_space=pltpu.VMEM))
        inputs.append(tid_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ty, n_tx, (1 if split else 2) * n_chunks),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        # The 16 MB scoped-VMEM default is a compiler guard, not hardware:
        # v5e has 128 MB of VMEM. TILE_H=384 puts this kernel's blocks at
        # ~19 MB (the 32-channel G-buffer block dominates); raise the limit
        # so tile height is bounded by measurement, not the default. The
        # shared-cell grid mode adds the resident window-cell table (up to
        # ~17 MB on the flagship, budget-capped in models/scene.py).
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(80 if win_grid else 48) * 2 ** 20),
    )(*inputs)
    if split:
        gb = outs[0]
        res = (gb[:, :height, :width],)
        if sampling:
            res += (outs[1][:, :height, :width],
                    outs[2][:height, :width])
        return res if sampling else res[0]
    zb, tid, gb = outs[:3]
    res = (zb[:height, :width], tid[:height, :width],
           gb[:, :height, :width])
    if sampling:
        samp, mask = outs[3], outs[4]
        res += (samp[:, :height, :width], mask[:height, :width])
    return res


# ------------------------------------------------- windowed texture sampler

# Per-face sampler scalars: [0] gid, [1] wbase (global window row), [2] nwr,
# [3] nwc (window grid dims), [4] kind bitmask, [5] th, [6] tw (texture
# shape), [7] rbase, [8] cbase (unwrapped texel origin of the window grid).
_S_COLS = 32


#: Texel rows per window / per kind plane inside a window-content row block.
#: Must match models/scene.py::_WIN_R (the window-grid builder).
WIN_R = 32
WIN_C = 128
_WIN_SHIFT = WIN_R.bit_length() - 1

#: Speculatively prefetched windows per face (covers ~p95 of diablo faces);
#: ranges beyond SPEC fall back to synchronous per-window DMA.
_SPEC = 4

#: Pixel-slab height for per-visit sampler work — must EQUAL _FSLAB (the
#: fused kernel hands _sample_face_slab winner masks of _FSLAB rows) and be
#: a multiple of 8 for aligned dynamic sublane slices.
_SLAB = _FSLAB
_SLAB_SHIFT = _SLAB.bit_length() - 1


def _sample_face_slab(sdata_ref, f, wb, wn, nwc, kmask, th, tw, rbase,
                      cbase, buf, s0, win, iu_s, iv_s, spec, sync,
                      sem_sync, win_hbm, samp_ref, mask_ref, n_kinds,
                      sweep=True, spec_n=_SPEC, cols_fp=(2, 3, 7, 8),
                      kind_gate=False, grid=None):
    """Window visits + gather sweep for one face over one winning pixel slab.

    Half-slab dispatch: a face's winners occupy ~1%% of a (16, 128) slab
    (p50 bbox height 3 px), so when they all fall in one 8-row half the
    sweep runs at (8, 128) — one VREG per op instead of two — selected by
    two jnp.any reduces. Winners straddling the half boundary take the
    full-slab body unchanged. Pure masking/width change: values are
    bit-identical either way.

    ``spec_n``/``cols_fp``/``kind_gate`` support the second shape-group
    grid (see visibility_gbuffer_pallas): group 2 passes spec_n=0 (its
    windows are never speculatively resident — every visit uses the
    synchronous DMA), its own sdata footprint columns, and kind_gate=True
    so each grid writes only its own kmask bits' planes.

    ``grid`` = (win_ref, wordg) selects the VMEM-resident shared-cell path
    (see pack_sample_wordg): windows are grid-aligned cells of the whole
    texture held resident in VMEM, each visit computes its wrapped cell
    index from the packed wordg scalars and reads the cell directly —
    no DMA start/wait at all (the spec/sync/buf arguments are unused).
    """
    extra = dict(sweep=sweep, spec_n=spec_n, cols_fp=cols_fp,
                 kind_gate=kind_gate, grid=grid)
    if _SLAB == 16:
        lo = jnp.any(win[0:8, :])
        hi = jnp.any(win[8:16, :])

        def _half(x):
            # th/tw/rbase/cbase arrive as scalars (standalone kernel) or
            # (16, 128) broadcasts (fused kernel's co()): slice the latter.
            # Bool vectors go through i32 — Mosaic can't legalize an
            # arith.select on vector<8x128xi1> (CLAUDE.md pitfall).
            if jnp.ndim(x) == 0:
                return x
            if x.dtype == jnp.bool_:
                return jnp.where(hi, x[8:16, :].astype(jnp.int32),
                                 x[0:8, :].astype(jnp.int32)) != 0
            return jnp.where(hi, x[8:16, :], x[0:8, :])

        @pl.when(lo & hi)
        def _():
            _sample_half(sdata_ref, f, wb, wn, nwc, kmask, th, tw, rbase,
                         cbase, buf, s0, win, iu_s, iv_s, spec, sync,
                         sem_sync, win_hbm, samp_ref, mask_ref, n_kinds,
                         _SLAB, **extra)

        @pl.when(lo != hi)
        def _():
            s0h = s0 + 8 * hi.astype(jnp.int32)
            _sample_half(sdata_ref, f, wb, wn, nwc, kmask, _half(th),
                         _half(tw), _half(rbase), _half(cbase), buf, s0h,
                         _half(win), _half(iu_s), _half(iv_s), spec, sync,
                         sem_sync, win_hbm, samp_ref, mask_ref, n_kinds,
                         8, **extra)
    else:
        _sample_half(sdata_ref, f, wb, wn, nwc, kmask, th, tw, rbase,
                     cbase, buf, s0, win, iu_s, iv_s, spec, sync,
                     sem_sync, win_hbm, samp_ref, mask_ref, n_kinds,
                     _SLAB, **extra)


def _sample_half(sdata_ref, f, wb, wn, nwc, kmask, th, tw, rbase,
                 cbase, buf, s0, win, iu_s, iv_s, spec, sync,
                 sem_sync, win_hbm, samp_ref, mask_ref, n_kinds,
                 slab, sweep=True, spec_n=_SPEC, cols_fp=(2, 3, 7, 8),
                 kind_gate=False, grid=None):
    """Window visits + gather sweep over a (slab, 128) winner block.

    Shared by the standalone sampler kernel and the fused
    visibility+G-buffer kernel (which samples right after interpolating
    iu/iv in-register). ``win`` is the winner mask for rows
    [s0, s0+slab); the face's speculative windows must already be resident
    in ``spec[buf]``.

    ``wb``/``wn``/``nwc``/``kmask`` are scalars (from the SMEM word2, wn and
    nwc saturated at 7 — exact whenever wn <= _SPEC, which is the only place
    they are used exactly); ``th``/``tw``/``rbase``/``cbase`` are i32
    scalars or (slab, 128) broadcasts — all their uses are vector math. The
    footprint path (wn > _SPEC) re-reads exact grid scalars from sdata.

    Reference get_UV indexing (core.py:138-143), identical float ops to
    pipeline._wrap_index for bit-parity with the XLA gather path.
    """
    thf = th.astype(jnp.float32)
    twf = tw.astype(jnp.float32)
    wn_spec = jnp.minimum(wn, spec_n)
    if grid is not None:
        # Shared-cell mode: unpack the per-face grid scalars once per slab
        # (cheap SREG bit ops; see pack_sample_wordg for the layout).
        win_ref, wordg = grid
        g_gr0 = ((wordg >> _WG_GR0) & 0x1FF) - _WG_GR0_OFF
        g_gc0 = ((wordg >> _WG_GC0) & 0x7F) - _WG_GC0_OFF
        g_ngr = (wordg >> _WG_NGR) & 0xFF
        g_ngc = wordg & 0x3F

    # Full floor-mod wrap — the EXACT pipeline._wrap_index expression, so
    # texel indices match the XLA gather path bit-for-bit at ANY magnitude.
    # A single-period conditional add (one add instead of two divides) is
    # equivalent only for truncated indices in (-dim, dim); extreme-
    # perspective faces (a floor receding to the horizon) interpolate UVs
    # several periods out of range at far pixels, where the single wrap
    # left the index negative, no window visit covered it, and the pixel
    # silently kept its base color (the round-5 crowd-scene 0.9669
    # pallas_xla_match — 34k unsampled floor pixels).
    ci = jnp.trunc(jnp.clip(iu_s, max=1.0) * (twf - 1.0))
    col = (ci - twf * jnp.floor(ci / twf)).astype(jnp.int32)
    ri = jnp.trunc((1.0 - jnp.clip(iv_s, max=1.0)) * (thf - 1.0))
    row = (ri - thf * jnp.floor(ri / thf)).astype(jnp.int32)

    def process_window(wv, rel_r, rel_c):
        """Sample every kind plane of one window over the pixel slab."""
        inwin = ((rel_r >= 0) & (rel_r < WIN_R) &
                 (rel_c >= 0) & (rel_c < WIN_C) & win)
        rel_c_s = jnp.where(inwin, rel_c, 0)

        @pl.when(jnp.any(inwin))
        def _():
            msl = mask_ref[pl.ds(s0, slab), :]
            mask_ref[pl.ds(s0, slab), :] = jnp.where(
                inwin, msl | kmask, msl)
            # NOTE: don't gate the row sweep with per-row pl.when on a
            # footprint range — measured 1.6x SLOWER in-frame (Mosaic
            # scalar branches cost more than the skipped 1-VREG gathers).
            # The row-select mask is shared across kinds, and absent
            # kinds sample garbage on purpose: the mask plane only ever
            # carries the winning face's kind bits for a pixel (gids are
            # unique), so unsampled planes are never read there.
            if not sweep:
                return
            accs = [samp_ref[k, pl.ds(s0, slab), :]
                    for k in range(n_kinds)]
            for rr in range(WIN_R):
                sel = inwin & (rel_r == rr)
                for k in range(n_kinds):
                    g = jnp.take_along_axis(
                        jnp.broadcast_to(wv[WIN_R * k + rr:
                                           WIN_R * k + rr + 1, :],
                                         (slab, TILE_W)),
                        rel_c_s, axis=1)
                    accs[k] = jnp.where(sel, g, accs[k])
            for k in range(n_kinds):
                if kind_gate:
                    # Two grids per face: each writes only the planes its
                    # kmask covers, else grid 2's zero planes for grid-1
                    # kinds would clobber grid 1's samples (and vice versa).
                    @pl.when((kmask & (1 << k)) > 0)
                    def _(k=k):
                        samp_ref[k, pl.ds(s0, slab), :] = accs[k]
                else:
                    samp_ref[k, pl.ds(s0, slab), :] = accs[k]

    def visit_at(wc_lo, wc_hi, nwc_x, fetch="dyn"):
        """fetch: "spec" = all visits read the speculative buffer (exact
        when wn <= spec_n — the wn <= _SPEC branch with spec_n == _SPEC);
        "sync" = all visits use synchronous DMA (spec_n == 0, the second
        shape-group grid); "dyn" = per-visit off < wn_spec test (the
        footprint path, which mixes both). Static specialization removes
        two scalar branches per visit from the hot loop."""
        def visit(v, carry):
            wr, wc = carry
            if grid is not None:
                # Shared-cell visit: wrap the UNWRAPPED grid coordinate into
                # the texture's cell grid in the scalar domain (same
                # conditional add/sub idiom as the vector path below), then
                # read the cell straight out of the VMEM-resident table.
                # rel coords need no content-wrap correction: cells tile the
                # texture exactly, so a wrapped texel row/col lands in
                # exactly one cell at rel in [0, WIN_R/WIN_C).
                gr = g_gr0 + wr
                gc = g_gc0 + wc
                gr = gr + g_ngr * (gr < 0)
                gr = gr - g_ngr * (gr >= g_ngr)
                gr = gr - g_ngr * (gr >= g_ngr)
                gc = gc + g_ngc * (gc < 0)
                gc = gc - g_ngc * (gc >= g_ngc)
                gc = gc - g_ngc * (gc >= g_ngc)
                rel_r = row - (gr << _WIN_SHIFT)
                rel_c = col - (gc << 7)
                process_window(win_ref[wb + gr * g_ngc + gc], rel_r, rel_c)
                wc2 = jnp.where(wc + 1 > wc_hi, wc_lo, wc + 1)
                wr2 = jnp.where(wc + 1 > wc_hi, wr + 1, wr)
                return (wr2, wc2)
            off = wr * nwc_x + wc
            # Window texel origin, wrapped into the texture. The origin
            # sits in (-dim, 3*dim) (scene._window_metadata anchors on the
            # unwrapped UV bbox, one period off at most), so one conditional
            # add + two conditional subtracts replace the floor-mod divide —
            # exact integer arithmetic either way.
            r0 = rbase + (wr << _WIN_SHIFT)
            c0 = cbase + (wc << 7)
            r0 = r0 + th * (r0 < 0)
            c0 = c0 + tw * (c0 < 0)
            r0w = r0 - th * (r0 >= th)
            r0w = r0w - th * (r0w >= th)
            c0w = c0 - tw * (c0 >= tw)
            c0w = c0w - tw * (c0w >= tw)
            rel_r = row - r0w
            rel_r = rel_r + th * (rel_r < -(th - WIN_R))
            rel_c = col - c0w
            rel_c = rel_c + tw * (rel_c < -(tw - WIN_C))

            def from_sync():
                dma = pltpu.make_async_copy(win_hbm.at[wb + off], sync,
                                            sem_sync)
                dma.start()
                dma.wait()
                process_window(sync[:], rel_r, rel_c)

            if fetch == "spec":
                process_window(spec[buf, off], rel_r, rel_c)
            elif fetch == "sync":
                from_sync()
            else:
                @pl.when(off < wn_spec)
                def _():
                    process_window(spec[buf, off], rel_r, rel_c)

                @pl.when(off >= wn_spec)
                def _():
                    from_sync()

            wc2 = jnp.where(wc + 1 > wc_hi, wc_lo, wc + 1)
            wr2 = jnp.where(wc + 1 > wc_hi, wr + 1, wr)
            return (wr2, wc2)
        return visit

    # Fully-speculative faces (the common case: a 1-2 window grid) visit
    # every window — the 4 masked full-reduces of the texel footprint cost
    # more than the 0-3 extra inwin-masked visits they could prune.
    # MEASURED twice (round 3): unrolling the first visit straight-line
    # (the _for_each_slab trick) gained zero at 16-row windows (wn mostly
    # 2) AND at 32-row windows (wn == 1 for ~75% of faces, 5.244 vs 5.255
    # ms/call) — the visit cost is the spec-DMA wait, not loop overhead.
    # Grid mode has no speculative set: direct visits up to the word-g
    # saturation (wn == 7 is ambiguous — footprint path re-reads exact).
    _direct = 6 if grid is not None else _SPEC

    @pl.when(wn <= _direct)
    def _():
        jax.lax.fori_loop(
            0, wn,
            visit_at(0, nwc - 1, nwc,
                     fetch="spec" if spec_n == _SPEC else "sync"),
            (0, 0))

    @pl.when(wn > _direct)
    def _():
        # Slab texel footprint (winning pixels) -> the window subgrid it
        # intersects. Exact grid scalars from the sdata table (rare path).
        nwr_x = sdata_ref[f, cols_fp[0]]
        nwc_x = sdata_ref[f, cols_fp[1]]
        rb_x = sdata_ref[f, cols_fp[2]]
        cb_x = sdata_ref[f, cols_fp[3]]
        big = jnp.int32(2 ** 30)
        trmin = jnp.min(jnp.where(win, row, big))
        trmax = jnp.max(jnp.where(win, row, -big))
        tcmin = jnp.min(jnp.where(win, col, big))
        tcmax = jnp.max(jnp.where(win, col, -big))
        wr0 = jnp.clip((trmin - rb_x) >> _WIN_SHIFT, 0, nwr_x - 1)
        wr1 = jnp.clip((trmax - rb_x) >> _WIN_SHIFT, 0, nwr_x - 1)
        wc0 = jnp.clip((tcmin - cb_x) >> 7, 0, nwc_x - 1)
        wc1 = jnp.clip((tcmax - cb_x) >> 7, 0, nwc_x - 1)
        nv = (wr1 - wr0 + 1) * (wc1 - wc0 + 1)
        jax.lax.fori_loop(
            0, nv,
            visit_at(wc0, wc1, nwc_x,
                     fetch="sync" if spec_n == 0 else "dyn"),
            (wr0, wc0))



# Sampler word2 (SMEM, appended to the scalar-prefetch counts vector): the
# scalars a sampling visit needs with no VMEM table read. wn/nwc saturate at
# 7 — the kernel only compares them against _SPEC (4) and uses them exactly
# when wn <= _SPEC; larger grids take the footprint path, which re-reads the
# exact values from the sdata table (rare).
_W2_WN = 3
_W2_NWC = 6
_W2_WB = 9


def pack_sample_word2(faces, grid=1):
    """faces dict -> (G,) i32 sampler scalars (see _W2_*); grid=2 packs the
    second shape-group's word3 with the identical layout."""
    sfx = "" if grid == 1 else "2"
    wn = jnp.minimum(faces[f"wnwr{sfx}"] * faces[f"wnwc{sfx}"], 7)
    nwc = jnp.minimum(faces[f"wnwc{sfx}"], 7)
    return (faces[f"wkmask{sfx}"] | (wn << _W2_WN) | (nwc << _W2_NWC)
            | (faces[f"wbase{sfx}"] << _W2_WB)).astype(jnp.int32)


# Shared-cell sampler word-g (SMEM, grid mode): the scalars a grid visit
# needs to map a face-local (wr, wc) to a global cell index. Fields:
#   [29:21] gr0 + 192 (aligned unwrapped grid row of the face's bbox — the
#           anchor sits in [-ngr-1, ngr], ngr <= 128 under the 4096-row
#           eligibility cap, so +192 keeps it in 9 unsigned bits),
#   [20:14] gc0 + 64 (ngc <= 32 under the 4096-col cap -> 7 bits),
#   [13:6]  ngr (texture cell-grid rows), [5:0] ngc (cell-grid cols).
# The cell base rides in word2's wb field (cell units instead of window
# rows); wn/nwc keep their meaning (face's cell-span, saturated at 7).
_WG_GR0, _WG_GR0_OFF = 21, 192
_WG_GC0, _WG_GC0_OFF = 14, 64
_WG_NGR = 6

#: Texture-shape eligibility cap for the shared-cell grid path: the wordg
#: bit budget above (and scalar wrap arithmetic) assumes ngr <= 128 cell
#: rows and ngc <= 32 cell cols.
GRID_TH_MAX = 128 * WIN_R        # 4096
GRID_TW_MAX = 32 * WIN_C         # 4096


def pack_sample_wordg(faces, grid=1):
    """faces dict -> (G,) i32 shared-cell grid scalars (see _WG_*)."""
    sfx = "" if grid == 1 else "2"
    gr0 = faces[f"wrbase{sfx}"] >> _WIN_SHIFT     # aligned -> exact
    gc0 = faces[f"wcbase{sfx}"] >> 7
    ngrid = faces[f"wngrid{sfx}"]
    return (((gr0 + _WG_GR0_OFF) << _WG_GR0)
            | ((gc0 + _WG_GC0_OFF) << _WG_GC0)
            | (ngrid[:, 0] << _WG_NGR) | ngrid[:, 1]).astype(jnp.int32)


def _check_pack_limits(n):
    """The packed bin-entry/word2 layouts assume chunk-local indices fit 13
    bits; FACE_CHUNK and the window-row base share the same budget class."""
    assert n <= (1 << 13), (
        f"chunk {n} exceeds the 13-bit packed bin index (see _BIN_*)")


def _max_bin_entry():
    """Maximum composable packed bin entry — statically asserted < 2**31 so
    any widening of the index/flag/slab fields fails loudly at import time
    instead of wrapping into the i32 sign bit and corrupting the sort."""
    return ((1 << _BIN_KEY)
            + (((1 << 13) - 1) << _BIN_F)        # chunk-local index
            + (0xF << _BIN_FLAGS)                 # 4 flag bits
            + (_SB_MASK << _BIN_SB) + (0x7 << _BIN_NSL))


assert _max_bin_entry() < 2 ** 31, (
    f"packed bin entry {_max_bin_entry()} overflows int31 — shrink a field "
    f"(headroom was 127 at the round-2 layout)")


def pack_sample_faces(faces):
    """faces dict -> (G, _S_COLS) int32 sampler table. Cols 11-16 hold the
    optional second shape-group's grid scalars (see _S2_NWR.. below)."""
    g = faces["sx"].shape[0]
    cols = jnp.stack([
        faces["gid"], faces["wbase"], faces["wnwr"], faces["wnwc"],
        faces["wkmask"], faces["wthw"][:, 0], faces["wthw"][:, 1],
        faces["wrbase"], faces["wcbase"],
        faces["bbox"][:, 2], faces["bbox"][:, 3],   # pixel-row extent
        faces["wnwr2"], faces["wnwc2"], faces["wrbase2"], faces["wcbase2"],
        faces["wthw2"][:, 0], faces["wthw2"][:, 1],
    ], axis=1).astype(jnp.int32)
    return jnp.concatenate(
        [cols, jnp.zeros((g, _S_COLS - cols.shape[1]), jnp.int32)], axis=1)


#: sdata columns of the second grid (footprint path + standalone kernel).
_S2_NWR, _S2_NWC, _S2_RB, _S2_CB, _S2_TH, _S2_TW = 11, 12, 13, 14, 15, 16


def _pad2d(a, hp, wp, fill):
    return jnp.pad(a, ((0, hp - a.shape[0]), (0, wp - a.shape[1])),
                   constant_values=fill)


@partial(jax.jit, static_argnames=("height", "width", "n_kinds", "interpret",
                                   "mode", "two_groups", "win_grid"))
def sample_textures_pallas(faces, bins, windows, tid, iu, iv, height, width,
                           n_kinds, interpret=False, mode="full",
                           two_groups=False, win_grid=False):
    """Per-pixel nearest texture sampling from per-face texel windows.

    Replaces the XLA per-pixel table gathers (~13 ms per million indices on
    TPU — a scalar loop) with kernel-side sampling: each face carries a grid
    of (WIN_R, 128)-texel windows covering its UV bbox (models/scene.py
    _window_metadata, content pre-sliced from the packed texture stacks);
    per (face, tile) the kernel computes the tile's texel footprint, visits
    only the windows the footprint intersects, and samples each via a WIN_R-row
    sweep of single-VREG dynamic lane gathers (tpu.dynamic_gather — the
    only fast lane-crossing data movement on TPU).

    DMA pipelining: while face k is processed, the first _SPEC windows of
    face k+1 prefetch into the alternate buffer; visits outside the
    speculative set use synchronous DMA (rare: large-UV faces like floors,
    whose per-tile footprint is small anyway).

    The sampled texel semantics replicate the reference's get_UV
    (core.py:138-143) bit-exactly vs the XLA gather path: same iu/iv
    (G-buffer channels), same clip-max-1 + trunc + negative wrap formula,
    same packed-u32 texels.

    Returns (samp (n_kinds, H, W) int32 packed texels, mask (H, W) int32
    kind bitmask of sampled pixels).
    """
    counts, idx = bins
    g0 = faces["sx"].shape[0]
    chunk = min(FACE_CHUNK, -(-g0 // 128) * 128)   # matches face_bins
    sdata = _pad_rows_to(pack_sample_faces(faces), chunk)
    n_chunks = sdata.shape[0] // chunk
    TILE_H = _tile_h(height)
    n_ty = _cdiv(height, TILE_H)
    n_tx = _cdiv(width, TILE_W)
    hp, wp = n_ty * TILE_H, n_tx * TILE_W
    tid_p = _pad2d(tid, hp, wp, -1)
    iu_p = _pad2d(iu, hp, wp, 0.0)
    iv_p = _pad2d(iv, hp, wp, 0.0)
    wrows = windows.shape[1]            # 16 * n_kinds

    def kernel(counts_ref, idx_ref, sdata_ref, win_hbm, tid_ref, iu_ref,
               iv_ref, samp_ref, mask_ref, spec=None, sync=None, sems=None,
               sems2=None, sem_sync=None):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        c = pl.program_id(2)
        count = counts_ref[c * (n_ty * n_tx) + ty * n_tx + tx]
        gid0k = counts_ref[n_chunks * n_ty * n_tx] + c * chunk
        w2base = n_chunks * n_ty * n_tx + 1 + c * chunk
        w3base = w2base + n_chunks * chunk   # second grid's word3 block
        wgbase = w2base + n_chunks * chunk * (2 if two_groups else 1)
        wg2base = wgbase + n_chunks * chunk

        @pl.when(c == 0)
        def _():
            samp_ref[:] = jnp.zeros((n_kinds, TILE_H, TILE_W), jnp.int32)
            mask_ref[:] = jnp.zeros((TILE_H, TILE_W), jnp.int32)

        # Speculative window DMA split in two (see the fused kernel): the
        # first _SPEC/2 windows copy unconditionally — a face's windows are
        # consecutive rows (wbase + j), and the table carries _SPEC rows of
        # tail padding — the rest only when the grid is that big.
        def spec_dma_lo(buf, wb):
            return pltpu.make_async_copy(
                win_hbm.at[pl.ds(wb, _SPEC // 2)],
                spec.at[buf, 0:_SPEC // 2], sems.at[buf])

        def spec_dma_hi(buf, wb):
            return pltpu.make_async_copy(
                win_hbm.at[pl.ds(wb + _SPEC // 2, _SPEC // 2)],
                spec.at[buf, _SPEC // 2:_SPEC], sems2.at[buf])

        _dbg_dma = (mode not in ("nodma", "noscan")) and not win_grid
        _dbg_sweep = mode not in ("nosweep", "noscan")
        _dbg_scan = mode != "noscan"

        def prefetch(k, buf):
            f = (idx_ref[0, 0, k, 0] >> _BIN_F) & _BIN_FMASK
            w2p = counts_ref[w2base + f]
            spec_dma_lo(buf, w2p >> _W2_WB).start()

            @pl.when(((w2p >> _W2_WN) & 7) > _SPEC // 2)
            def _():
                spec_dma_hi(buf, w2p >> _W2_WB).start()

        if not win_grid:
            @pl.when((count > 0) & _dbg_dma)
            def _():
                prefetch(0, 0)

        def body(k, _):
            buf = jax.lax.rem(k, 2)
            f, _fl, s_base, n_slabs = _decode_bin(idx_ref[0, 0, k, 0])
            gid = gid0k + f
            w2 = counts_ref[w2base + f]
            kmask = w2 & 7

            # Start face k+1's speculative windows, then drain this face's.
            if _dbg_dma:
                @pl.when(k + 1 < count)
                def _():
                    prefetch(k + 1, 1 - buf)
                spec_dma_lo(buf, w2 >> _W2_WB).wait()

                @pl.when(((w2 >> _W2_WN) & 7) > _SPEC // 2)
                def _():
                    spec_dma_hi(buf, w2 >> _W2_WB).wait()

            if two_groups:
                w3 = counts_ref[w3base + f]
                any_kind = (kmask | (w3 & 7)) > 0
            else:
                any_kind = kmask > 0

            @pl.when(any_kind)
            def _():
                # Pixel-row slabs (from the packed bin entry): every
                # per-visit vector op shrinks from the (64, 128) tile to a
                # (_SLAB, 128) slab, the dominant sampler cost.
                def slab_body(s0):
                    win = tid_ref[pl.ds(s0, _SLAB), :] == gid

                    @pl.when(jnp.any(win))
                    def _():
                        iu_s = iu_ref[pl.ds(s0, _SLAB), :]
                        iv_s = iv_ref[pl.ds(s0, _SLAB), :]

                        _rb = (jnp.int32(0) if win_grid
                               else sdata_ref[f, 7])
                        _cb = (jnp.int32(0) if win_grid
                               else sdata_ref[f, 8])

                        @pl.when(kmask > 0)
                        def _():
                            _sample_face_slab(
                                sdata_ref, f, w2 >> _W2_WB,
                                (w2 >> _W2_WN) & 7,
                                (w2 >> _W2_NWC) & 7, kmask,
                                sdata_ref[f, 5], sdata_ref[f, 6],
                                _rb, _cb,
                                buf, s0, win, iu_s, iv_s, spec,
                                sync, sem_sync, win_hbm, samp_ref, mask_ref,
                                n_kinds, sweep=_dbg_sweep,
                                kind_gate=two_groups,
                                grid=((win_hbm, counts_ref[wgbase + f])
                                      if win_grid else None))
                        if two_groups:
                            _rb2 = (jnp.int32(0) if win_grid
                                    else sdata_ref[f, _S2_RB])
                            _cb2 = (jnp.int32(0) if win_grid
                                    else sdata_ref[f, _S2_CB])

                            @pl.when((w3 & 7) > 0)
                            def _():
                                _sample_face_slab(
                                    sdata_ref, f, w3 >> _W2_WB,
                                    (w3 >> _W2_WN) & 7,
                                    (w3 >> _W2_NWC) & 7, w3 & 7,
                                    sdata_ref[f, _S2_TH],
                                    sdata_ref[f, _S2_TW],
                                    _rb2, _cb2,
                                    buf, s0, win, iu_s, iv_s, spec,
                                    sync, sem_sync, win_hbm, samp_ref,
                                    mask_ref, n_kinds, sweep=_dbg_sweep,
                                    spec_n=0,
                                    cols_fp=(_S2_NWR, _S2_NWC,
                                             _S2_RB, _S2_CB),
                                    kind_gate=True,
                                    grid=((win_hbm, counts_ref[wg2base + f])
                                          if win_grid else None))

                if _dbg_scan:
                    _for_each_slab(s_base, n_slabs, slab_body, tile_h=TILE_H)
            return 0

        jax.lax.fori_loop(0, count, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ty, n_tx, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, chunk, 1),
                         lambda ty, tx, c, s: (c, ty * n_tx + tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, _S_COLS), lambda ty, tx, c, s: (c, 0),
                         memory_space=pltpu.VMEM),
            # windows: VMEM-resident cell table (grid mode) or HBM (DMA).
            (pl.BlockSpec(windows.shape, lambda ty, tx, c, s: (0, 0, 0),
                          memory_space=pltpu.VMEM) if win_grid
             else pl.BlockSpec(memory_space=pl.ANY)),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, c, s: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, c, s: (ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, c, s: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_kinds, TILE_H, TILE_W),
                         lambda ty, tx, c, s: (0, ty, tx),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, c, s: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=([] if win_grid else [
            pltpu.VMEM((2, _SPEC, wrows, WIN_C), jnp.int32),
            pltpu.VMEM((wrows, WIN_C), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ]),
    )
    smem_tail = [counts.reshape(-1), faces["gid"][0].reshape(1),
                 _pad_rows_to(pack_sample_word2(faces), chunk)]
    if two_groups:
        smem_tail.append(_pad_rows_to(pack_sample_word2(faces, grid=2),
                                      chunk))
    if win_grid:
        smem_tail.append(_pad_rows_to(pack_sample_wordg(faces), chunk))
        if two_groups:
            smem_tail.append(
                _pad_rows_to(pack_sample_wordg(faces, grid=2), chunk))
    samp, mask = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_kinds, hp, wp), jnp.int32),
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        ],
        interpret=interpret,
        # TILE_H-sized blocks; see visibility_gbuffer_pallas on the limit.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(80 if win_grid else 48) * 2 ** 20),
    )(jnp.concatenate(smem_tail),
      idx, sdata, windows, tid_p, iu_p, iv_p)
    return samp[:, :height, :width], mask[:height, :width]

# ---------------------------------------------------------------- line kernel

# Edge payload for the wireframe DDA kernel (pack_lines): [0] x0, [1] y0,
# [2] z0, [3] sx, [4] sy, [5] sz, [6] step count, [7] major-x flag;
# rows padded to 128 lanes for _face_row.


def pack_lines(p0, p1, height, width):
    """Directed screen-space edges -> DDA line-kernel tables.

    Replicates ops/lines.bresenham_line (reference line.py:6-16) in closed
    form: right-to-left normalization (dx > 0 swaps endpoints), steps =
    max(|dx|, |dy|), ``int(steps)`` uniform float steps, truncating int cast
    per emitted pixel. A zero-length edge draws its single start pixel; a
    sub-pixel edge (0 < steps < 1) draws nothing, like the host DDA.

    p0/p1: (E, 3) float32 (x, y, z) endpoints (z already linearized by the
    caller, models/scene._render_debug_shader semantics). Returns
    (ldata (E, 128) f32, bbox (E, 4) i32, tube_coeffs) — tube_coeffs are two
    half-planes 2 px around the line for bin_primitives' exact tile pruning
    (a line's bbox covers O(tiles^2) tiles, the line itself O(tiles)).
    """
    swap = (p1[:, 0] - p0[:, 0]) > 0
    a = jnp.where(swap[:, None], p1, p0)
    b = jnp.where(swap[:, None], p0, p1)
    d = b - a
    adx = jnp.abs(d[:, 0])
    ady = jnp.abs(d[:, 1])
    steps = jnp.maximum(adx, ady)
    pt = steps == 0
    stepv = d / jnp.where(pt, 1.0, steps)[:, None]
    nsteps = jnp.where(pt, 1.0, jnp.floor(steps))
    majx = jnp.where(pt, True, adx >= ady).astype(jnp.float32)

    ldata = jnp.concatenate(
        [a, stepv, nsteps[:, None], majx[:, None]], axis=1)
    ldata = _pad_cols_128(ldata)

    x_lo = jnp.floor(jnp.minimum(a[:, 0], b[:, 0]))
    x_hi = jnp.floor(jnp.maximum(a[:, 0], b[:, 0])) + 1
    y_lo = jnp.floor(jnp.minimum(a[:, 1], b[:, 1]))
    y_hi = jnp.floor(jnp.maximum(a[:, 1], b[:, 1])) + 1
    bbox = jnp.stack([jnp.clip(x_lo, 0, width), jnp.clip(x_hi, 0, width),
                      jnp.clip(y_lo, 0, height), jnp.clip(y_hi, 0, height)],
                     axis=1)
    bbox = jnp.where(jnp.isfinite(bbox), bbox, 0).astype(jnp.int32)

    ln = jnp.sqrt(d[:, 0] ** 2 + d[:, 1] ** 2)
    inv = 1.0 / jnp.where(ln == 0, 1.0, ln)
    A1 = -d[:, 1] * inv
    B1 = d[:, 0] * inv
    c0 = A1 * a[:, 0] + B1 * a[:, 1]
    A = jnp.where(pt[:, None], 0.0, jnp.stack([A1, -A1], axis=1))
    B = jnp.where(pt[:, None], 0.0, jnp.stack([B1, -B1], axis=1))
    K = jnp.where(pt[:, None], 1.0,
                  jnp.stack([-c0 + 2.0, c0 + 2.0], axis=1))
    mask = jnp.ones(A.shape, bool)
    return ldata, bbox, (A, B, K, mask)


@partial(jax.jit, static_argnames=("height", "width", "interpret"))
def lines_pallas(ldata, bbox, active, coeffs, zbuf, height, width,
                 interpret=False):
    """Wireframe line coverage vs the final z-buffer. Returns (H, W) i32 mask.

    The host wireframe (ops/overlay.draw_wireframe, reference
    triangular.py:269-274) iterates DDA pixels per edge with a mutating
    z-buffer; since every edge writes the same color, a pixel's final color
    is order-free — lit iff ANY edge's DDA pixel passes the strict
    ``z_buffer - z > 0`` test (no handedness sign: the reference shader
    hard-codes ``> 0``) against the render z-buffer. Per (edge, tile) the
    kernel inverts the DDA in closed form: along the major axis the step is
    exactly ±1, so the step index is k = floor(x0 - col) (major-x; the DDA
    normalizes to sx = -1) or the matching ceil/floor form in y, and a pixel
    is on the line iff the minor-axis trunc matches.
    """
    e0 = ldata.shape[0]
    chunk = min(FACE_CHUNK, -(-e0 // 128) * 128)
    ldata = _pad_rows_to(ldata, chunk)
    bbox = _pad_rows_to(bbox, chunk)
    active = _pad_rows_to(active, chunk, fill=False)
    coeffs = tuple(_pad_rows_to(c, chunk) for c in coeffs)
    e = ldata.shape[0]
    n_chunks = e // chunk
    TILE_H = _tile_h(height)
    n_ty = _cdiv(height, TILE_H)
    n_tx = _cdiv(width, TILE_W)
    hp, wp = n_ty * TILE_H, n_tx * TILE_W
    zb_pad = _pad2d(zbuf, hp, wp, jnp.inf)
    counts, idx = [], []
    for c in range(n_chunks):
        sl = slice(c * chunk, (c + 1) * chunk)
        cnt, ix = bin_primitives(bbox[sl], active[sl], height, width,
                                 edge_coeffs=tuple(cc[sl] for cc in coeffs))
        counts.append(cnt)
        idx.append(ix)
    counts = jnp.stack(counts)
    idx = jnp.stack(idx)[..., None]
    hw = jnp.asarray([height, width], jnp.int32)

    def kernel(counts_ref, hw_ref, idx_ref, ldata_ref, zb_ref, mask_ref):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        c = pl.program_id(2)
        count = counts_ref[c * (n_ty * n_tx) + ty * n_tx + tx]
        y0t = (ty * TILE_H).astype(jnp.float32)
        x0t = (tx * TILE_W).astype(jnp.float32)
        rows = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 0).astype(jnp.float32) + y0t
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (TILE_H, TILE_W), 1).astype(jnp.float32) + x0t
        hh = hw_ref[0].astype(jnp.float32)
        ww = hw_ref[1].astype(jnp.float32)
        # Host bounds are 0 < row < h-1 (exclusive on both edges).
        inframe = ((rows > 0) & (rows < hh - 1) &
                   (cols > 0) & (cols < ww - 1))

        @pl.when(c == 0)
        def _():
            mask_ref[:] = jnp.zeros((TILE_H, TILE_W), jnp.int32)

        def body(k, _):
            ee = idx_ref[0, 0, k, 0]
            co = _face_row(ldata_ref, ee, (TILE_H, TILE_W))
            x0, y0, z0 = co(0), co(1), co(2)
            sxv, syv, szv = co(3), co(4), co(5)
            nst = co(6)
            majx = co(7) > 0
            k_x = jnp.floor(x0 - cols)
            k_y = jnp.where(syv > 0, jnp.ceil(rows - y0),
                            jnp.floor(y0 - rows))
            kk = jnp.where(majx, k_x, k_y)
            # Minor-axis match: positive in-frame coords make trunc == floor.
            other = jnp.where(majx,
                              jnp.floor(y0 + kk * syv) - rows,
                              jnp.floor(x0 + kk * sxv) - cols)
            lit = (other == 0) & (kk >= 0) & (kk < nst) & inframe
            z = z0 + kk * szv
            ok = lit & (zb_ref[:] - z > 0)
            mask_ref[:] = mask_ref[:] | jnp.where(ok, 1, 0)
            return 0

        jax.lax.fori_loop(0, count, body, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_ty, n_tx, n_chunks),
        in_specs=[
            pl.BlockSpec((1, 1, chunk, 1),
                         lambda ty, tx, c, cn, s: (c, ty * n_tx + tx, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 128), lambda ty, tx, c, cn, s: (c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, c, cn, s: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, c, cn, s: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
    )
    (mask,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        ],
        interpret=interpret,
    )(counts.reshape(-1), hw, idx, ldata, zb_pad)
    return mask[:height, :width]


# ------------------------------------------------------ sharded-mode kernels

@partial(jax.jit, static_argnames=("height", "width", "sign", "with_debug",
                                   "interpret"))
def tidpass_pallas(faces, zb_final_sign, height, width, sign,
                   with_debug=False, interpret=False, bins=None, row0=0):
    """Winning face ids against a GIVEN final z-buffer (sign space).

    The sharded-mode id pass (mirrors raster_xla.visibility_pass): after
    per-shard z-buffers pmin-merge over the tris axis, every local face
    re-claims pixels where coverage and the final-z test pass; later faces
    overwrite. Needed because a shard's incremental local winner can be
    invalidated by another shard's closer geometry (and non-z-writing faces
    can claim at depths their local buffer never reached).
    """
    fdata = pack_faces(faces, with_debug)
    g0 = fdata.shape[0]
    chunk = min(FACE_CHUNK, -(-g0 // 128) * 128)
    fdata = _pad_cols_128(_pad_rows_to(fdata, chunk))
    if bins is None:
        counts, idx, _ = face_bins(faces, height, width, row0=row0,
                                   with_debug=with_debug)
    else:
        counts, idx = bins
    n_chunks = fdata.shape[0] // chunk
    TILE_H = _tile_h(height)
    n_ty = _cdiv(height, TILE_H)
    n_tx = _cdiv(width, TILE_W)
    hp, wp = n_ty * TILE_H, n_tx * TILE_W
    zb_pad = jnp.full((hp, wp), jnp.inf, jnp.float32)
    zb_pad = zb_pad.at[:height, :width].set(zb_final_sign)
    counts1 = jnp.concatenate([counts.reshape(-1),
                               jnp.asarray(row0, jnp.int32).reshape(1),
                               faces["gid"][0].reshape(1)])

    def kernel(counts_ref, idx_ref, fdata_ref, zb_ref, tid_ref):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        c = pl.program_id(2)
        count = counts_ref[c * (n_ty * n_tx) + ty * n_tx + tx]
        gid0k = counts_ref[n_chunks * n_ty * n_tx + 1] + c * chunk
        y0f = (ty * TILE_H + counts_ref[n_chunks * n_ty * n_tx]).astype(
            jnp.float32)
        x0 = (tx * TILE_W).astype(jnp.float32)
        rows_s = jax.lax.broadcasted_iota(
            jnp.int32, (_FSLAB, TILE_W), 0).astype(jnp.float32) + y0f
        cols_s = jax.lax.broadcasted_iota(
            jnp.int32, (_FSLAB, TILE_W), 1).astype(jnp.float32) + x0

        @pl.when(c == 0)
        def _():
            tid_ref[:] = jnp.full((TILE_H, TILE_W), -1, jnp.int32)

        def body(k, _):
            f, flags, s_base, n_slabs = _decode_bin(idx_ref[0, 0, k, 0])
            gid = gid0k + f

            def slab(s0):
                rows = rows_s + s0.astype(jnp.float32)

                def apply(cov, z):
                    upd = cov & (zb_ref[pl.ds(s0, _FSLAB), :] >= z * sign)
                    tid_ref[pl.ds(s0, _FSLAB), :] = jnp.where(
                        upd, gid, tid_ref[pl.ds(s0, _FSLAB), :])

                _visit_claim(fdata_ref, f, flags, rows, cols_s,
                             with_debug, apply)
            _for_each_slab(s_base, n_slabs, slab, tile_h=TILE_H)
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
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, c, s: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, c, s: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
    )
    (tid,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        ],
        interpret=interpret,
    )(counts1, idx, fdata, zb_pad)
    return tid[:height, :width]


@partial(jax.jit, static_argnames=("height", "width", "with_debug",
                                   "interpret", "with_tex_tables",
                                   "gb_layout"))
def gbuffer_pallas(faces, attrs, tid, height, width, with_debug=False,
                   interpret=False, bins=None, row0=0, with_tex_tables=True,
                   gb_layout="general"):
    """G-buffer interpolation against a GIVEN (merged) visibility buffer.

    Sharded mode: each tris-shard interpolates only the faces it owns; a
    pixel's channels are written by exactly one shard (global face ids are
    unique), so zero-initialized partial G-buffers combine with a plain psum
    over the tris axis. Returns (n_gb, H, W) float32 — GB_CHANNELS for the
    general layout, _SLIM_CHANNELS[gb_layout] for flat/gouraud/pbr.
    """
    fdata0 = pack_faces(faces, with_debug)
    X = fdata0.shape[1]
    extra = (pack_face_attrs(attrs) if gb_layout == "general"
             else pack_slim_attrs(attrs, gb_layout))
    n_gb = (GB_CHANNELS if gb_layout == "general"
            else _SLIM_CHANNELS[gb_layout])
    fdata = jnp.concatenate([fdata0, extra], axis=1)
    g0 = fdata.shape[0]
    chunk = min(FACE_CHUNK, -(-g0 // 128) * 128)
    fdata = _pad_cols_128(_pad_rows_to(fdata, chunk))
    if bins is None:
        counts, idx, _ = face_bins(faces, height, width, row0=row0,
                                   with_debug=with_debug)
    else:
        counts, idx = bins
    n_chunks = fdata.shape[0] // chunk
    TILE_H = _tile_h(height)
    n_ty = _cdiv(height, TILE_H)
    n_tx = _cdiv(width, TILE_W)
    hp, wp = n_ty * TILE_H, n_tx * TILE_W
    tid_p = jnp.pad(tid, ((0, hp - tid.shape[0]), (0, wp - tid.shape[1])),
                    constant_values=-1)
    counts1 = jnp.concatenate([counts.reshape(-1),
                               jnp.asarray(row0, jnp.int32).reshape(1),
                               faces["gid"][0].reshape(1)])

    def kernel(counts_ref, idx_ref, fdata_ref, tid_ref, gb_ref):
        ty = pl.program_id(0)
        tx = pl.program_id(1)
        c = pl.program_id(2)
        count = counts_ref[c * (n_ty * n_tx) + ty * n_tx + tx]
        gid0k = counts_ref[n_chunks * n_ty * n_tx + 1] + c * chunk
        y0f = (ty * TILE_H + counts_ref[n_chunks * n_ty * n_tx]).astype(
            jnp.float32)
        x0 = (tx * TILE_W).astype(jnp.float32)
        rows_s = jax.lax.broadcasted_iota(
            jnp.int32, (_FSLAB, TILE_W), 0).astype(jnp.float32) + y0f
        cols_s = jax.lax.broadcasted_iota(
            jnp.int32, (_FSLAB, TILE_W), 1).astype(jnp.float32) + x0

        @pl.when(c == 0)
        def _():
            gb_ref[:] = jnp.zeros((n_gb, TILE_H, TILE_W), jnp.float32)

        def gbody(k, _):
            f, flags, s_base, n_slabs = _decode_bin(idx_ref[0, 0, k, 0])
            gid = gid0k + f
            co = _face_row(fdata_ref, f, (_FSLAB, TILE_W))

            def slab(s0):
                win = tid_ref[pl.ds(s0, _FSLAB), :] == gid

                @pl.when(jnp.any(win))
                def _():
                    rows = rows_s + s0.astype(jnp.float32)

                    def put(ch, val):
                        gb_ref[ch, pl.ds(s0, _FSLAB), :] = jnp.where(
                            win, val, gb_ref[ch, pl.ds(s0, _FSLAB), :])

                    if gb_layout != "general":
                        _slim_interp_face(co, X, rows, cols_s, put,
                                          gb_layout)
                    else:
                        _gb_interp_face(co, X, rows, cols_s, put,
                                        with_tex_tables)
            _for_each_slab(s_base, n_slabs, slab, tile_h=TILE_H)
            return 0

        jax.lax.fori_loop(0, count, gbody, 0)

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
            pl.BlockSpec((TILE_H, TILE_W), lambda ty, tx, c, s: (ty, tx),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n_gb, TILE_H, TILE_W),
                         lambda ty, tx, c, s: (0, ty, tx),
                         memory_space=pltpu.VMEM),
        ],
    )
    (gb,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_gb, hp, wp), jnp.float32),
        ],
        interpret=interpret,
        # The 32-channel block is TILE_H-sized; see visibility_gbuffer_pallas
        # on why the 16 MB scoped-VMEM default is raised.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 2 ** 20),
    )(counts1, idx, fdata, tid_p)
    return gb[:, :height, :width]
