"""Banded MXU gather/scatter: the cost model that makes LZ4 vectorisable.

`mxu_gather` routes random access through one-hot matmuls, which costs
``table_size`` MACs per gathered element — ~54K MACs/byte for a full
compressed block, measured ~1 ms per 64K-element gather on v5e.  A decode
pipeline needs ~10 such gathers per output byte, which is why the first
vectorised pipeline ran at 16 MB/s.

Almost every index stream in an LZ4 codec is *locally banded*: literal
sources advance monotonically with output position, token positions are
sorted, match offsets are mostly small.  This module exploits that:

* ``banded_gather`` — chunk the index axis; chunk ``c`` gathers from a
  *static* window ``[c*ch - back, c*ch - back + w)`` of the table.  The
  windows are ``w/ch`` statically shifted copies of the table (pure VPU
  data movement, no gather), and the lookup becomes block-diagonal
  einsums — ``w`` MACs per element instead of ``N``.  Execution is
  chunked with `lax.map` in groups big enough to amortise step dispatch
  (a 64-step prototype measured slower than the full gather it
  replaced; group size is the lever).
* ``compact_fallback`` — indices that miss their band are compacted with
  one small scatter (ranks are unique, so no collisions) and served by a
  single full-table gather of at most ``k2_cap`` elements, then merged
  back.  Correct for any index distribution; fast when misses are rare.
* plane packing — multi-field gathers share one one-hot construction and
  one einsum by stacking 8-bit planes of every field (bf16 carries
  0..255 exactly; f32 accumulation is exact far beyond table sizes).

All shapes static; everything jit-safe and CPU-testable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

LANE = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def plane_split(fields):
    """fields: list of (array [B, N] int32, bits).  Returns ([B, P, N]
    planes of 0..255, and per-field (plane_offset, nplanes) spans)."""
    planes = []
    spans = []
    for arr, bits in fields:
        n = _cdiv(bits, 8)
        spans.append((len(planes), n))
        for p in range(n):
            planes.append((arr >> (8 * p)) & 0xFF)
    return jnp.stack(planes, axis=-2), spans


def plane_join(vals, spans):
    """vals: [B, P, K] -> list of [B, K] int32 per original field."""
    out = []
    for off, n in spans:
        acc = vals[..., off, :]
        for p in range(1, n):
            acc = acc | (vals[..., off + p, :] << (8 * p))
        out.append(acc)
    return out


def build_windows(planes, ch: int, w: int, back: int, nch: int):
    """[B, P, N] -> [B, nch, tiles(w/128), P*LANE] window tensor where
    window c covers table byte range [c*ch - back, c*ch - back + w),
    laid out tile-major for the stage-1 einsum.  Built from w/ch
    statically shifted copies — no gather."""
    B, P, N = planes.shape
    assert w % ch == 0 and back % ch == 0 and w % LANE == 0, (w, ch, back)
    nshift = w // ch
    shift0 = -back // ch
    cols = []
    for s in range(nshift):
        lo = (shift0 + s) * ch
        src = jnp.zeros((B, P, nch * ch), planes.dtype)
        lo_clip = max(0, lo)
        hi_clip = min(N, nch * ch + lo)
        if hi_clip > lo_clip:
            seg = planes[:, :, lo_clip:hi_clip]
            src = jax.lax.dynamic_update_slice(src, seg, (0, 0, lo_clip - lo))
        cols.append(src.reshape(B, P, nch, ch))
    win = jnp.concatenate(cols, axis=-1)            # [B, P, nch, w]
    win = jnp.moveaxis(win, 1, 2)                   # [B, nch, P, w]
    tiles = w // LANE
    win = win.reshape(B, nch, P, tiles, LANE)
    win = jnp.moveaxis(win, 2, 3)                   # [B, nch, tiles, P, LANE]
    return win.reshape(B, nch, tiles, P * LANE)


def banded_gather(planes, idx, ch: int, w: int, back: int,
                  group: int = 2):
    """Gather ``planes [B,P,N]`` at ``idx [B, K]`` (K % ch == 0) where
    chunk c = idx[:, c*ch:(c+1)*ch] reads window [c*ch - back, ... + w).

    Returns (vals [B, P, K] int32, in_band [B, K] bool).  Out-of-band
    lanes hold garbage; mask with ``in_band``.
    """
    B, P, N = planes.shape
    K = idx.shape[-1]
    nch = K // ch
    assert K == nch * ch, (K, ch)
    pad_ch = (-nch) % group                 # pad to a whole number of groups
    if pad_ch:
        idx = jnp.concatenate(
            [idx, jnp.zeros((B, pad_ch * ch), idx.dtype)], axis=-1)
        nch += pad_ch
    tiles = w // LANE

    win = build_windows(planes, ch, w, back, nch)   # [B,nch,tiles,P*LANE]
    base = jnp.arange(nch, dtype=jnp.int32) * ch - back
    loc = idx.reshape(B, nch, ch) - base[None, :, None]
    in_band = (loc >= 0) & (loc < w)
    locc = jnp.clip(loc, 0, w - 1)

    win_g = win.reshape(B, nch // group, group, tiles, P * LANE)
    loc_g = locc.reshape(B, nch // group, group, ch)

    def step(gi):
        lg = jax.lax.dynamic_index_in_dim(loc_g, gi, 1, keepdims=False)
        wg = jax.lax.dynamic_index_in_dim(win_g, gi, 1, keepdims=False)
        wg = wg.reshape(B, group, tiles, P, LANE)
        hi = lg >> 7
        lo = lg & (LANE - 1)
        oh_hi = (hi[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, hi.shape + (tiles,), 3)).astype(jnp.bfloat16)
        oh_lo = (lo[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, lo.shape + (LANE,), 3)).astype(jnp.float32)
        # one fused matmul+reduce per plane: a single [*, K, P*LANE] rows
        # tensor defeats XLA's matmul-epilogue fusion and goes
        # bandwidth-bound (measured 33x slower at P=3)
        outs = []
        for p in range(P):
            rows = jnp.einsum("bgkt,bgtm->bgkm", oh_hi,
                              wg[:, :, :, p, :].astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
            outs.append(jnp.sum(rows * oh_lo, axis=-1).astype(jnp.int32))
        return jnp.stack(outs, axis=-1)

    out = jax.lax.map(step, jnp.arange(nch // group))  # [ng,B,group,ch,P]
    out = jnp.moveaxis(out, 0, 1).reshape(B, nch * ch, P)
    vals = jnp.moveaxis(out, -1, 1)[:, :, :K]
    return vals, in_band.reshape(B, nch * ch)[:, :K]


def full_gather(planes, idx, chunk: int = 4096):
    """Unbanded gather via mxu_gather's two-level decomposition, shared
    one-hot across planes.  planes [B,P,N], idx [B,K] -> [B,P,K]."""
    from .mxu_gather import _gather_planes
    return _gather_planes(planes, idx, chunk)


def scatter_add_planes(idx, weights, depth: int, bits: int = 8,
                       chunk: int = 2048):
    """out[b, d] = sum_k weights[b, k] over idx[b, k] == d.

    Like mxu_gather.scatter_add but with a configurable weight width so
    0/1 indicator scatters pay for one plane, not three."""
    assert depth % LANE == 0, depth
    tiles = depth // LANE
    nplanes = _cdiv(bits, 8)

    k = idx.shape[-1]
    pad = (-k) % chunk
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.zeros(idx.shape[:-1] + (pad,), idx.dtype)], axis=-1)
        weights = jnp.concatenate(
            [weights, jnp.zeros(weights.shape[:-1] + (pad,),
                                weights.dtype)], axis=-1)
    nchunks = idx.shape[-1] // chunk
    idx_c = idx.reshape(idx.shape[:-1] + (nchunks, chunk))
    w_c = weights.reshape(weights.shape[:-1] + (nchunks, chunk))

    def per_chunk(c):
        ix = idx_c[..., c, :]
        hi = ix >> 7
        lo = ix & (LANE - 1)
        oh_hi = (hi[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, hi.shape + (tiles,), hi.ndim)).astype(jnp.bfloat16)
        oh_lo = (lo[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, lo.shape + (LANE,), lo.ndim)).astype(jnp.bfloat16)
        w = w_c[..., c, :]
        acc = None
        for p in range(nplanes):
            wp = ((w >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
            # force (w*oh_hi) first: letting the einsum engine pick can
            # materialise a [*, k, tiles, LANE] intermediate instead
            whi = wp[..., None] * oh_hi
            part = jnp.einsum("...kh,...kl->...hl", whi, oh_lo,
                              preferred_element_type=jnp.float32)
            part = part.astype(jnp.int32) << (8 * p)
            acc = part if acc is None else acc + part
        return acc

    parts = jax.lax.map(per_chunk, jnp.arange(nchunks))
    out = jnp.sum(parts, axis=0)
    return out.reshape(out.shape[:-2] + (depth,))


def compact_fallback(planes, idx, need, vals, k2_cap: int):
    """Serve ``need``-flagged elements of a banded gather with one small
    full-table gather over a compacted index set.

    Compaction is one 2-operand sort (needed-first, stable): scatters at
    this K cost ~30 ns x K x planes on v5e regardless of depth, an order
    of magnitude more than the sort.

    planes [B,P,N]; idx, need [B,K]; vals [B,P,K].  Returns
    (vals with fallback merged, overflow [B] int32 count of unserved
    elements — nonzero means the caller must retry on the host).
    """
    B, P, N = planes.shape
    K = idx.shape[-1]
    needi = need.astype(jnp.int32)
    rank = jnp.cumsum(needi, axis=-1) - needi        # exclusive ranks
    total = rank[:, -1] + needi[:, -1]
    overflow = jnp.maximum(total - k2_cap, 0)

    # needed indices, in position order, first
    key = jnp.where(need, jnp.arange(K, dtype=jnp.int32), jnp.int32(K))
    _, far_idx_full = jax.lax.sort((key, idx), dimension=-1, num_keys=1)
    far_idx = jnp.clip(far_idx_full[:, :k2_cap], 0, N - 1)
    far_vals = full_gather(planes, far_idx)          # [B, P, k2_cap]

    # pull each needed element's value back by its rank
    rankc = jnp.clip(rank, 0, k2_cap - 1)
    back = full_gather(far_vals, rankc)
    merged = jnp.where(need[:, None, :], back, vals)
    return merged, overflow


def hier_gather(fields, idx, ch: int, w: int, back: int,
                valid=None, k2_cap: int = 2048, group: int = 8):
    """Gather several (array, bits) fields at ``idx``: banded fast path +
    compacted full-table fallback.

    fields: list of (table [B,N] i32, bits).  idx [B,K] (K % ch == 0).
    valid: optional [B,K] bool — elements that matter (out-of-band
    invalid elements never trigger the fallback).
    Returns (list of [B,K] vals, overflow [B] i32).
    """
    planes, spans = plane_split(fields)
    vals, in_band = banded_gather(planes, idx, ch, w, back, group=group)
    need = ~in_band
    if valid is not None:
        need = need & valid
    merged, overflow = compact_fallback(planes, idx, need, vals, k2_cap)
    return plane_join(merged, spans), overflow


def sorted_compact(mask, cap: int, big: int):
    """Positions of set bits of ``mask [B, N]`` in ascending order,
    padded with ``big``: one sort, no scatter.  Returns [B, cap]."""
    N = mask.shape[-1]
    i = jnp.arange(N, dtype=jnp.int32)
    keyed = jnp.where(mask, i[None, :], jnp.int32(big))
    return jax.lax.sort(keyed, dimension=-1)[:, :cap]


def compact_indices(mask, cap: int, big: int):
    """``sorted_compact`` without the sort: position of the k-th set
    bit = lower_bound(cumsum(mask), k+1), a power-of-two binary-search
    descent of ~log2(N) `take_along_axis` rounds over [B, cap] — ~10x
    cheaper than a [B, 64K] `lax.sort` on v5e (the k-th-set-bit query
    is monotone in k, the records/emit kernels' windowed-search fact,
    but here the domain is the full comp axis so a plain branchless
    lower bound is simplest).  Returns [B, cap] int32, padded with
    ``big`` past the population count."""
    import os
    if os.environ.get("LZ4NET_COMPACT", "sort") != "bsearch":
        # DEFAULT: the sort path.  On v5e the descent's 18 rounds of
        # [B, cap] take_along_axis into a [B, 64K+] cumsum measured a
        # ~100 ms/MB REGRESSION vs lax.sort across the encoder's three
        # call sites (tools/probe_encode.py A/B) — XLA's generic gather
        # at that table size is far off the lane-shuffle fast path this
        # function was designed around.  Kept for small-table callers
        # and future in-kernel use; opt in with LZ4NET_COMPACT=bsearch.
        return sorted_compact(mask, cap, big)
    B, N = mask.shape
    cs = jnp.cumsum(mask.astype(jnp.int32), axis=-1)         # [B, N]
    target = jnp.arange(cap, dtype=jnp.int32)[None, :] + 1   # k+1
    cur = jnp.zeros((B, cap), jnp.int32)   # count of prefix cs < k+1
    step = 1 << (N - 1).bit_length()
    while step:
        cand = cur + step
        csv = jnp.take_along_axis(
            cs, jnp.clip(cand - 1, 0, N - 1), axis=-1)
        cur = jnp.where((cand <= N) & (csv < target), cand, cur)
        step >>= 1
    return jnp.where(cur < N, cur, jnp.int32(big))
