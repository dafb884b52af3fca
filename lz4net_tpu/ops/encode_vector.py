"""Vectorised LZ4 greedy encoder: sort-based match finding, FSM parse.

The reference's greedy compressor (`/root/reference/src/LZ4ps/
LZ4Codec.Safe64.Dirty.cs:77-300`, from `original/lz4.c:345`) is a strictly
sequential loop: a hash table maps each 4-byte value to its most recent
position, and the parse position advances data-dependently.  This module
restructures the whole thing into batched vector phases — no scalar
loops, no hardware gathers — reusing the banded-gather/segment-FSM
machinery of the decode pipeline (`decode_vector.py`, `banded.py`):

E1  candidates        the reference's hash table answers "most recent
                      earlier position with the same 4-byte value".
                      Fast mode uses the reference's own data structure
                      TPU-ified: per-block 8K-bucket tables at 4- and
                      8-byte prefix widths in one batched Mosaic kernel
                      (`hash_kernel.bucket_prev`; XLA-scan twin on CPU)
                      — candidates are u32-verified in-table.  HC
                      levels still use corpus-wide stable `lax.sort`
                      prev-occurrence tiers (exact, collision-free)
                      for their deeper candidate sets.
E2  match lengths     periodic offsets (<= 4) get exact unbounded
                      lengths from per-offset equality-run scans (the
                      RLE path).  Far offsets extend by u32 compares:
                      one full-domain round (the `i+4` cursor is a
                      static shift, only `prev+4` gathers), then the
                      still-growing survivors are compacted once and
                      extended over a small index set for several more
                      rounds.  Truncation is always format-safe (a
                      shorter match is still a valid match); the E4
                      merge pass coalesces contiguous same-offset
                      matches, recovering long matches from capped ones.
E3  greedy parse      greedy selection ("take the first match at or
                      after the previous match's end") is a pointer
                      chain g[i] = next_match_at_or_after(i + mlen[i]) —
                      the decode pipeline's chain-threading problem,
                      solved by the same segment-exit doubling +
                      segment scan + in-segment marking.
E4  sequence records  token positions compact by a cumsum + binary
                      search (`banded.compact_indices`); literal runs
                      fall out of neighbouring records; contiguous
                      same-offset matches merge via segmented sums; the
                      block's literal tail becomes a final match-less
                      record (LASTLITERALS rule).
E5  byte emission     per-record sizes are elementwise; output offsets
                      are a cumsum; token/offset/extension bytes scatter
                      directly (positions are unique); literal bytes
                      reuse decode's jump-scatter + gather pattern in
                      reverse (output -> input indices via one gather).

Output is *format-valid* (decodes bit-exactly on every engine, honours
the last-5-literals / 12-byte-end rules of
`original/lz4_format_description.txt:93-104`) but not parse-identical to
the reference: this is the documented "fast mode" of SURVEY.md §7 step 4
— any format-valid parse, size competitive with the reference.  The
strict bit-identical parse lives in `encode_pallas.py` and the CPU
engines; the engine registry keeps strict engines selected by default so
cross-engine conformance (byte-identical compressed output) holds unless
fast mode is requested explicitly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import (LASTLITERALS, MAX_DISTANCE, MFLIMIT, MINLENGTH,
                         MINMATCH, ML_MASK, RUN_MASK, maximum_output_length)
from .banded import (compact_indices, full_gather, plane_join,
                     plane_split, scatter_add_planes)
from . import fused_gather as fg


def _gather_multi(tables_bits, idx, fused):
    """Exact gather of several tables at one index stream.

    fused=True routes through the in-VMEM one-hot kernel
    (`fused_gather.table_gather`) — a large win for SMALL index sets,
    where the XLA path's cost is dominated by staging one-hot and row
    tensors through HBM (~1 ms per call regardless of K).  The XLA path
    stays for CPU tests and big-K sites."""
    if fused:
        return fg.table_gather(tuple(t for t, _ in tables_bits), idx,
                               tuple(b for _, b in tables_bits))
    pp, sp = plane_split(tables_bits)
    return plane_join(full_gather(pp, idx), sp)
from .decode_vector import (CH, LANE, SEG, _cdiv, _mark_tokens,
                            _segment_exits, _thread_chain)

EXT_ROUNDS = 10           # compacted far-match extension rounds
MAX_FAR_MLEN = MINMATCH + 4 + 4 * EXT_ROUNDS   # 48-byte cap before merge
TOP_OFFSETS = 8           # dominant offsets given exact unbounded lengths
BIASE = 1 << 17           # literal-source delta bias (O, D < 2^17)
BIASJ_E = 1 << 19         # jump bias: literal-source deltas span
                          # +-(P + D + O) < 2^19 with a dictionary prefix


def _u32(x):
    """u32[i] = little-endian 4-byte word at i (zero-padded tail)."""
    b1 = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
    b2 = jnp.concatenate([x[:, 2:], jnp.zeros_like(x[:, :2])], axis=1)
    b3 = jnp.concatenate([x[:, 3:], jnp.zeros_like(x[:, :3])], axis=1)
    return x | (b1 << 8) | (b2 << 16) | (b3 << 24)


def _first_occurrence(keys):
    """first[i] = smallest j < i whose ``keys`` tuple equals position
    i's, else -1 — the deepest chain candidate of the reference's HC
    search (`lz4hc.c:394-460` walks toward it)."""
    B, D = keys[0].shape
    i = jnp.broadcast_to(jnp.arange(D, dtype=jnp.int32)[None, :],
                         keys[0].shape)
    sorted_ = jax.lax.sort(tuple(keys) + (i,), dimension=-1,
                           num_keys=len(keys))
    same = jnp.ones((B, D - 1), bool)
    for ks in sorted_[:-1]:
        same = same & (ks[:, 1:] == ks[:, :-1])
    same = jnp.concatenate([jnp.zeros((B, 1), bool), same], axis=1)
    i_sorted = sorted_[-1]
    # fill-forward the group head's position, then inverse-permute
    head = jnp.where(same, 0, i_sorted + 1)
    head = jax.lax.associative_scan(
        lambda a, b: jnp.where(b == 0, a, b), head, axis=1) - 1
    first_sorted = jnp.where(same, head, -1)   # head itself has no prior
    _, first = jax.lax.sort((i_sorted, first_sorted), dimension=-1,
                            num_keys=1)
    return first


def _prev_occurrence(keys):
    """prev[i] = largest j < i whose ``keys`` tuple equals position i's,
    else -1.

    Two stable sorts: forward (group by key; stability keeps positions
    ascending within a group, so the left neighbour is the most recent
    earlier occurrence) and inverse (the position column is a
    permutation, so sorting by it restores position order).
    """
    B, D = keys[0].shape
    i = jnp.broadcast_to(jnp.arange(D, dtype=jnp.int32)[None, :],
                         keys[0].shape)
    sorted_ = jax.lax.sort(tuple(keys) + (i,), dimension=-1,
                           num_keys=len(keys))
    same = jnp.ones((B, D - 1), bool)
    for ks in sorted_[:-1]:
        same = same & (ks[:, 1:] == ks[:, :-1])
    same = jnp.concatenate([jnp.zeros((B, 1), bool), same], axis=1)
    i_sorted = sorted_[-1]
    prev_sorted = jnp.where(
        same,
        jnp.concatenate([jnp.full((B, 1), -1, jnp.int32),
                         i_sorted[:, :-1]], axis=1),
        jnp.int32(-1))
    _, prev = jax.lax.sort((i_sorted, prev_sorted), dimension=-1, num_keys=1)
    return prev


def _suffix_candidates(keys):
    """Best earlier-position match candidate per position from
    suffix-sort adjacency — the TPU-native replacement for the
    reference HC chain walk (`original/lz4hc.c:358-460`).

    ONE stable multi-key sort orders positions by their leading
    4*len(keys)-byte prefix; in that order the longest-common-prefix
    match of any position is ADJACENT (the suffix-array LCP argument),
    so three cheap streams dominate the per-width candidate tiers:

      A: the sort-order predecessor (if at an earlier position) —
         equals the widest prefix tier that hits, at every width at
         once, with stability giving the NEAREST earlier occurrence;
      B: the sort-order successor (if earlier) — the case where the
         best LCP neighbour sorts after the query;
      C/D: the minimum-position entry over the sorted prefix/suffix,
         with its LCP maintained by an associative scan over adjacent
         LCPs (range-min composition) — the `_first_occurrence` far
         candidates.

    The best of the four by LCP (ties: nearest) comes back in
    position order.  Returns (cand [B, D] position-or--1,
    lcp4 [B, D] common prefix in 4-byte words, 0..len(keys))."""
    B, D = keys[0].shape
    K = len(keys)
    INF = jnp.int32(K + 1)
    i = jnp.broadcast_to(jnp.arange(D, dtype=jnp.int32)[None, :],
                         keys[0].shape)
    sorted_ = jax.lax.sort(tuple(keys) + (i,), dimension=-1, num_keys=K)
    pos_s = sorted_[-1]
    still = jnp.ones((B, D - 1), bool)
    acc = jnp.zeros((B, D - 1), jnp.int32)
    for ks in sorted_[:-1]:
        still = still & (ks[:, 1:] == ks[:, :-1])
        acc = acc + still
    edge = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), acc], axis=1)

    def minpos_scan(pos_v, edge_v):
        # per-element value (mp, ml, tm): minimum position in the
        # segment, LCP from that entry to the segment's right edge,
        # and the min over the segment's edges (incl. the first
        # element's entering edge, which is exactly the junction edge
        # when the segment is a combine's right operand)
        def comb(a, b):
            mpa, mla, tma = a
            mpb, mlb, tmb = b
            take_a = mpa <= mpb
            return (jnp.minimum(mpa, mpb),
                    jnp.where(take_a, jnp.minimum(mla, tmb), mlb),
                    jnp.minimum(tma, tmb))
        return jax.lax.associative_scan(
            comb, (pos_v, jnp.full_like(pos_v, INF), edge_v), axis=1)

    mp, ml, _ = minpos_scan(pos_s, edge)
    # exclusive: prefix [0..k-1], then extend over edge k
    mpx = jnp.concatenate(
        [jnp.full((B, 1), jnp.int32(1 << 30)), mp[:, :-1]], axis=1)
    mlx = jnp.minimum(jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), ml[:, :-1]], axis=1), edge)
    # reverse direction (min-position entry among sort-order successors)
    edge_r = jnp.flip(jnp.concatenate(
        [edge[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1), axis=1)
    mpr, mlr, _ = minpos_scan(jnp.flip(pos_s, axis=1), edge_r)
    mpr = jnp.flip(mpr, axis=1)
    mlr = jnp.flip(mlr, axis=1)
    mpy = jnp.concatenate(
        [mpr[:, 1:], jnp.full((B, 1), jnp.int32(1 << 30))], axis=1)
    edge_n = jnp.concatenate(
        [edge[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
    mly = jnp.minimum(jnp.concatenate(
        [mlr[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1), edge_n)

    cands = (
        (jnp.concatenate([jnp.full((B, 1), -1, jnp.int32),
                          pos_s[:, :-1]], axis=1), edge),          # A
        (jnp.concatenate([pos_s[:, 1:],
                          jnp.full((B, 1), -1, jnp.int32)], axis=1),
         edge_n),                                                  # B
        (mpx, mlx),                                                # C
        (mpy, mly),                                                # D
    )
    best_p = jnp.full((B, D), -1, jnp.int32)
    best_l = jnp.zeros((B, D), jnp.int32)
    for cp, cl in cands:
        ok = (cp >= 0) & (cp < pos_s) & (cl >= 1)
        better = ok & ((cl > best_l) | ((cl == best_l) & (cp > best_p)))
        best_p = jnp.where(better, cp, best_p)
        best_l = jnp.where(better, cl, best_l)
    # back to position order (the position column is a permutation)
    _, cand, lcp4 = jax.lax.sort((pos_s, best_p, best_l), dimension=-1,
                                 num_keys=1)
    return cand, lcp4


def _run_lengths(eq):
    """run[i] = length of the run of True starting at i (suffix scan)."""
    Dn = eq.shape[-1]
    rev = jnp.flip(eq, axis=-1)
    idx = jnp.arange(Dn, dtype=jnp.int32)
    last_false = jax.lax.cummax(
        jnp.where(~rev, idx, -1), axis=rev.ndim - 1)
    return jnp.flip(idx - last_false, axis=-1)


def _xor_match_bytes(wa, wb):
    """Number of equal low-order bytes of two u32 words (0..4)."""
    diff = jnp.bitwise_xor(wa, wb)
    return jnp.where(
        (diff & 0xFF) != 0, 0,
        jnp.where((diff & 0xFF00) != 0, 1,
                  jnp.where((diff & 0xFF0000) != 0, 2,
                            jnp.where(diff != 0, 3, 4))))


def _xor_match_bytes_rev(wa, wb):
    """Number of equal high-order bytes of two u32 words (0..4)."""
    diff = jnp.bitwise_xor(wa, wb)
    m = jnp.int32(-16777216)          # 0xFF000000 as int32
    return jnp.where(
        (diff & m) != 0, 0,
        jnp.where((diff & 0xFF0000) != 0, 1,
                  jnp.where((diff & 0xFF00) != 0, 2,
                            jnp.where(diff != 0, 3, 4))))


def _top_offsets_select(off, far, top_offsets, sub_step):
    """Dominant far offsets by frequency of the subsampled offset
    stream: sort + run-count + top_k (a [B, D/sub] sort is ~16x smaller
    than the depth-65536 scatter histogram it replaces).  Returns
    dks [B, top_offsets] int32 (0 marks an unused slot)."""
    B = off.shape[0]
    sub = slice(None, None, sub_step)
    sub_far = far[:, sub]
    import os as _os
    if _os.environ.get("LZ4NET_TOPOFF") == "hist":   # A/B bisection
        hist = scatter_add_planes(
            jnp.clip(jnp.where(sub_far, off[:, sub], 0), 0, MAX_DISTANCE),
            sub_far.astype(jnp.int32), MAX_DISTANCE + 1, bits=16)
        _, dks = jax.lax.top_k(hist, top_offsets)
        return dks
    subv = jnp.where(sub_far, off[:, sub], 0)
    sv = jax.lax.sort(subv, dimension=-1)
    K = sv.shape[-1]
    kk = jnp.arange(K, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((B, 1), bool), sv[:, 1:] != sv[:, :-1]], axis=1)
    start_next = jnp.where(
        jnp.concatenate([is_start[:, 1:],
                         jnp.ones((B, 1), bool)], axis=1),
        kk[None, :] + 1, jnp.int32(K))
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(start_next, axis=-1),
                                  axis=1), axis=-1)
    cnt = jnp.where(is_start & (sv > 0), nxt - kk[None, :], -1)
    _, ti = jax.lax.top_k(cnt, top_offsets)
    dks = jnp.take_along_axis(sv, ti, axis=-1)
    return dks * (jnp.take_along_axis(cnt, ti, axis=-1) > 0)


def _match_lengths_dispatch(x, u32, prev, m8, end_abs, blk_len, D, rcap,
                            top_offsets=TOP_OFFSETS, sub_step=16,
                            ext_rounds=EXT_ROUNDS, fused=False):
    """Route E2 to the Pallas megakernel on TPU (one kernel per block,
    `ops/mlen_kernel.py`) or the multi-op XLA formulation elsewhere.
    Bit-identical results (tests/test_mlen_kernel.py)."""
    import os as _os
    use_kernel = fused and D % 8192 == 0 and rcap % LANE == 0 \
        and rcap <= 18432 and (D <= 73728 or rcap <= 8192) \
        and _os.environ.get("LZ4NET_MLEN_IMPL", "kernel") == "kernel" \
        and _os.environ.get("LZ4NET_TOPOFF") is None
    # VMEM guard: the kernel's scratch scales with BOTH D and rcap.
    # The 1 MB big-block fragment domain (D=139264) blew the budget at
    # HC rcaps (43 MB over at rcap=D/4; 6 MB over at D/8) — those
    # sites take the XLA path, exactly the pre-round-5 behavior; the
    # fast-mode rcap=4096 big-D combination is chip-certified
    if not use_kernel:
        return _match_lengths(x, u32, prev, m8, end_abs, blk_len, D,
                              rcap, top_offsets=top_offsets,
                              sub_step=sub_step, ext_rounds=ext_rounds,
                              fused=fused)
    from .mlen_kernel import match_lengths_fused
    i = jnp.arange(D, dtype=jnp.int32)
    off = i[None, :] - prev
    far = (prev >= 0) & (off <= MAX_DISTANCE) & (off > 4)
    dks = _top_offsets_select(off, far, top_offsets, sub_step)
    return match_lengths_fused(x, u32, prev, m8.astype(jnp.int32), dks,
                               end_abs, blk_len, D, rcap,
                               ext_rounds=ext_rounds)


def _match_lengths(x, u32, prev, m8, end_abs, blk_len, D, rcap,
                   top_offsets=TOP_OFFSETS, sub_step=16,
                   ext_rounds=EXT_ROUNDS, fused=False):
    """(matched, offset, mlen) for every position; far matches capped at
    MAX_FAR_MLEN (the merge pass recovers longer ones).  ``m8`` marks
    positions whose candidate came from the 8-byte-prefix sort (first 8
    bytes already verified equal).  ``end_abs`` is the absolute end of
    the block's bytes in the row (prefix + block length when a preset
    dictionary occupies the row's head); ``blk_len`` the block's own
    length (the <13-byte incompressibility rule counts only it)."""
    B = x.shape[0]
    i = jnp.arange(D, dtype=jnp.int32)
    off = i[None, :] - prev
    matched = (prev >= 0) & (off <= MAX_DISTANCE)

    # periodic offsets 1..4: exact unbounded lengths, elementwise.
    # LCP(i, i-d) == run length of (x[j] == x[j-d]) starting at j=i.
    mlen = jnp.zeros_like(off)
    for d in range(1, 5):
        shifted = jnp.concatenate(
            [jnp.zeros_like(x[:, :d]), x[:, :-d]], axis=1)
        run = _run_lengths(x == shifted)
        mlen = jnp.where(matched & (off == d), run, mlen)

    # far offsets, round 1 over the full domain: u32 at i+4 is a static
    # shift of the u32 table; only the prev+4 cursor needs a gather.
    far = matched & (off > 4)
    up, usp = plane_split([(u32, 32)])
    w_i4 = jnp.concatenate([u32[:, 4:], jnp.zeros_like(u32[:, :4])], axis=1)
    w_p4 = plane_join(full_gather(up, jnp.clip(prev + 4, 0, D - 1)), usp)[0]
    nb1 = jnp.where(m8, 4, _xor_match_bytes(w_i4, w_p4))
    l_far = jnp.where(far, MINMATCH + nb1, 0)
    alive = far & (nb1 == 4)

    # compact the still-growing survivors once; extend them over a small
    # index set.  Survivors beyond ``rcap`` simply stay at their current
    # (valid) length.
    ppos = compact_indices(alive, rcap, big=D)            # [B, rcap]
    palive = ppos < D
    ppos_c = jnp.clip(ppos, 0, D - 1)
    (prev_c,) = _gather_multi([(jnp.maximum(prev, 0), 17)], ppos_c,
                              fused)
    l_c = jnp.full((B, rcap), MINMATCH + 4, jnp.int32)
    for _ in range(ext_rounds):
        (wa,) = _gather_multi([(u32, 32)],
                              jnp.clip(ppos_c + l_c, 0, D - 1), fused)
        (wb,) = _gather_multi([(u32, 32)],
                              jnp.clip(prev_c + l_c, 0, D - 1), fused)
        nb = jnp.where(palive, _xor_match_bytes(wa, wb), 0)
        l_c = l_c + nb
        palive = palive & (nb == 4)
    extra = jnp.where(ppos < D, l_c - (MINMATCH + 4), 0)
    ext_scat = scatter_add_planes(ppos_c, extra, D, bits=8)
    l_far = l_far + jnp.where(alive, ext_scat, 0)
    mlen = jnp.where(far, l_far, mlen)

    # dominant far offsets get *exact unbounded* lengths: for a fixed
    # offset d, LCP(i, i-d) is an elementwise equality-run scan against
    # the d-rolled input — no gathers.  The top-K offsets cover
    # structured/text data, where long far matches cluster on a few
    # periods; anything else keeps the capped length and relies on the
    # merge pass.  Frequencies come from SORTING the subsampled offsets
    # and counting runs — a [B, D/sub] sort is ~16x smaller than the
    # depth-65536 scatter histogram it replaces (2.8 ms/call on chip,
    # and _match_lengths runs once per HC candidate tier).
    dks = _top_offsets_select(off, far, top_offsets, sub_step)
    return _top_off_exact(x, i, far, off, mlen, matched, dks,
                          top_offsets, end_abs, blk_len)



def _stage_exit(stage_name, feed, B, O):
    """tools/probe_encode.py --stage: early-exit after a pipeline stage
    with shape-compatible dummies whose values depend on ``feed`` (so
    nothing upstream is dead-code-eliminated)."""
    import os as _os
    if _os.environ.get("LZ4NET_ENC_STAGE") != stage_name:
        return None
    probe = jnp.sum(feed.astype(jnp.int32), axis=-1, keepdims=True)
    out = jnp.broadcast_to(probe & 0xFF, (B, O))
    out_len = jnp.ones((B,), jnp.int32) + (probe[:, 0] & 0)
    ok = jnp.ones((B,), bool)
    aux = jnp.zeros((B, 2), jnp.int32) + probe
    return out, out_len, ok, aux


def _top_off_exact(x, i, far, off, mlen, matched, dks, top_offsets,
                   end_abs, blk_len):
    """Exact unbounded lengths for the dominant offsets, then the format
    end rules (`lz4_format_description.txt:93-104`: no match covering
    the last 5 bytes, none starting < 12 bytes before the end, blocks
    < 13 bytes all-literal)."""
    import os as _os
    if _os.environ.get("LZ4NET_TOPOFF") == "skip":   # probe only
        top_offsets = 0
    for t in range(top_offsets):
        dk = dks[:, t]
        rolled = jax.vmap(lambda row, s: jnp.roll(row, s))(x, dk)
        eq = (x == rolled) & (i[None, :] >= dk[:, None])
        run = _run_lengths(eq)
        mlen = jnp.where(far & (off == dk[:, None]), run, mlen)

    limit = end_abs[:, None] - LASTLITERALS - i[None, :]
    mlen = jnp.minimum(mlen, jnp.maximum(limit, 0))
    matched = matched & (mlen >= MINMATCH) \
        & (i[None, :] <= end_abs[:, None] - MFLIMIT) \
        & (blk_len[:, None] >= MINLENGTH)
    return matched, jnp.where(matched, off, 0), jnp.where(matched, mlen, 0)


def _next_match_at_or_after(matched, D):
    """nm[i] = smallest j >= i with matched[j], else >= D."""
    i = jnp.arange(D, dtype=jnp.int32)
    rev = jnp.flip(jnp.where(matched, i[None, :], jnp.int32(D)), axis=-1)
    nm_rev = jax.lax.cummin(rev, axis=rev.ndim - 1)
    return jnp.flip(nm_rev, axis=-1)


def _encode_batch_traced(x, data_len, D, O, S_cap, rcap=4096,
                         hc_level=0, P=0, pre_len=None, fused=False):
    """Greedy-encode a batch of independent blocks.

    x: [B, D] int32 bytes (zero padded), data_len: [B] int32.
    D % 8192 == 0; O the padded output budget
    (>= maximum_output_length(D)); S_cap the record cap (a cap of
    D // MINMATCH + margin can never overflow).
    Returns (out [B, O] int32 bytes, out_len [B] int32, ok [B] bool).

    ``P`` > 0 enables PRESET-DICTIONARY encode: x[:, :P] holds the
    (right-aligned) dictionary window, the block's own bytes start at
    column P, and ``data_len`` counts only the block's bytes.  Match
    candidates may reach back into the window (the reference-extension
    dictionary mode of `models/reference.py::compress_block_dict`) —
    the candidate sorts already span the whole row, so the only deltas
    are masking token starts to i >= P and anchoring the first literal
    run at P.  Output offsets stay format-legal because positions are
    contiguous across the window/data seam.

    ``hc_level`` > 0 enables the high-compression search (the device
    analogue of the reference's chain-based LZ4HC,
    `original/lz4hc.c:394-521`): deeper prefix-sort candidate tiers
    stand in for chain walking (a 2^k-byte-prefix neighbour in suffix
    order is a chain candidate with guaranteed LCP >= 2^k), and levels
    >= 4 add the lazy 1-ahead parse of `LZ4_compressHCCtx`
    (`lz4hc.c:557-700`): a match is deferred when the next position
    holds a strictly longer one.  Output is format-valid fast-HC — it
    decodes bit-exactly everywhere and its ratio is validated against
    the reference HC parse corpus-wide (tests/test_hc_device.py); the
    bit-exact level-9 parse stays on the CPU engines.
    """
    B = x.shape[0]
    i = jnp.arange(D, dtype=jnp.int32)
    o = jnp.arange(O, dtype=jnp.int32)
    k = jnp.arange(S_cap, dtype=jnp.int32)
    end_abs = P + data_len
    pre_len_arr = (jnp.full((B,), P, jnp.int32) if pre_len is None
                   else pre_len)

    # E1/E2 — candidates + lengths.  Candidate tiers: the nearest
    # 2^k-byte-prefix occurrence (guaranteed LCP >= 2^k) beats nearer
    # occurrences with shorter shared prefixes; higher tiers only for
    # HC levels (two extra stable sorts each).
    u32 = _u32(x)
    u32s4 = jnp.concatenate([u32[:, 4:], jnp.zeros_like(u32[:, :4])], axis=1)
    import os
    _dbg = os.environ.get("LZ4NET_HC_DEBUG", "")
    _tiers = os.environ.get("LZ4NET_HC_TIERS", "")
    # HC tier policy by level, mirroring the reference's level knob
    # (`constants.hc_level_attempts`: level -> chain-walk budget):
    # levels 8-9 run the EXACT sort tiers (one sort + one match-length
    # dispatch per width tier — full-fidelity search, ratio-optimal);
    # levels 1-7 run the SUFFIX-ADJACENCY tiers (`_suffix_candidates`:
    # one multi-key sort, every width at once) with ONE merged
    # match-length dispatch — the throughput operating point.  "hash"
    # selects the bucket-table tiers (ops/hash_kernel.hc_candidates) —
    # cheaper than either but table capacity costs ratio on 64 KB
    # blocks.  All paths are platform-deterministic;
    # LZ4NET_HC_TIERS=suffix|hash|sort overrides the level policy.
    hc_mode = _tiers if _tiers in ("suffix", "hash", "sort") \
        else ("sort" if hc_level >= 8 else "suffix")
    hc_exact = hc_level > 0 and hc_mode == "sort"
    if not hc_exact:
        # fast mode + hash-HC: the reference's own candidate structure
        # — two per-block 8K-bucket hash tables in VMEM
        # (ops/hash_kernel.py, 4- and 8-byte prefixes standing in for
        # the prev4/prev8 sort tiers), replacing four corpus-wide
        # stable sorts on chip.  Candidates are u32-verified
        # in-kernel, the prev4 contract.
        from .hash_kernel import (bucket_prev_impl, hash_bucket,
                                  hash_bucket8)
        prev = bucket_prev_impl(u32, u32s4, hash_bucket(u32),
                                hash_bucket8(u32, u32s4), D)
        m8 = jnp.zeros(prev.shape, bool)
    else:
        prev4 = _prev_occurrence((u32,))
        prev8 = _prev_occurrence((u32, u32s4))
        m8 = (prev8 >= 0) & (i[None, :] - prev8 <= MAX_DISTANCE)
        prev = jnp.where(m8, prev8, prev4)
    matched, off_all, mlen_all = _match_lengths_dispatch(
        x, u32, prev, m8, end_abs, data_len, D, rcap, fused=fused)

    if hc_level > 0:

        def shift32(w, nbytes):
            return jnp.concatenate(
                [w[:, nbytes:], jnp.zeros_like(w[:, :nbytes])], axis=1)

        # byte-run geometry (shared by both tier paths): at the first
        # byte of a byte-run the nearest prefix occurrence lands
        # mid-run in an EARLIER run (short LCP), and the off=1 RLE
        # match only starts one byte later — so prefix tiers
        # systematically lose the run's first byte to a literal.  The
        # reference's chain walk finds the earlier run START
        # (`lz4hc.c:394-460` searches all 256 chain hops).
        eq_next = jnp.concatenate(
            [x[:, :-1] == x[:, 1:], jnp.zeros((B, 1), bool)], axis=1)
        run_fwd = 1 + _run_lengths(eq_next)
        prev_byte = jnp.concatenate(
            [jnp.full((B, 1), -1, jnp.int32), x[:, :-1]], axis=1)
        is_rs = (run_fwd >= MINMATCH) & (x != prev_byte)

        def inject_run(cand_rs, ml_bound, state):
            """Inject an analytic run match (candidate + length lower
            bound) into (matched, off_all, mlen_all), honoring the
            format end rules."""
            matched, off_all, mlen_all = state
            ok_r = is_rs & (cand_rs >= 0) \
                & (i[None, :] - cand_rs <= MAX_DISTANCE)
            limit_r = end_abs[:, None] - LASTLITERALS - i[None, :]
            ml_r = jnp.minimum(ml_bound, jnp.maximum(limit_r, 0))
            ok_r = ok_r & (ml_r >= MINMATCH) \
                & (i[None, :] <= end_abs[:, None] - MFLIMIT) \
                & (data_len[:, None] >= MINLENGTH)
            better = ok_r & (ml_r > mlen_all)
            return (matched | better,
                    jnp.where(better, i[None, :] - cand_rs, off_all),
                    jnp.where(better, ml_r, mlen_all))

        cand_sets = []
        if not hc_exact:
            from .hash_kernel import hc_candidates
            in_w = lambda c: (c >= 0) \
                & (i[None, :] - c <= MAX_DISTANCE)
            if hc_mode == "suffix":
                # ---- suffix-adjacency tiers, one merged dispatch ----
                ws = (u32, u32s4) + tuple(
                    shift32(u32, 4 * k) for k in range(2, 8))
                deep, _slcp = _suffix_candidates(ws)
                merged = jnp.where(in_w(deep), deep, -1)
                _, _, run_cands = hc_candidates(
                    x, u32, u32s4, is_rs, run_fwd, D, tables="runs")
            else:
                # ---- bucket-table tiers, one merged dispatch ----
                deep, first_c, run_cands = hc_candidates(
                    x, u32, u32s4, is_rs, run_fwd, D)
                if "no2nd" not in _dbg:
                    # 2nd-nearest: one chain hop through the base prev
                    ppc, pspc = plane_split([(prev + 1, 18)])
                    prev2 = plane_join(
                        full_gather(ppc, jnp.maximum(prev, 0)),
                        pspc)[0] - 1
                    prev2 = jnp.where((prev >= 0) & (prev2 >= 0),
                                      prev2, -1)
                else:
                    prev2 = jnp.full_like(prev, -1)
                if "nofirst" in _dbg:
                    first_c = jnp.full_like(prev, -1)
                merged = jnp.where(
                    in_w(deep), deep,
                    jnp.where(in_w(first_c), first_c,
                              jnp.where(in_w(prev2), prev2, -1)))
            if "nodeep" not in _dbg:
                cand_sets.append((merged, False))
            if "norun" not in _dbg:
                # priority: widest min-run tier that hit; its length
                # bound is min(run_i, run_j) (valid by the u32 verify:
                # the candidate starts >= 4 bytes of the same value)
                r4c, r16c, r64c = run_cands
                rc = jnp.where(in_w(r64c), r64c,
                               jnp.where(in_w(r16c), r16c, r4c))
                rp, rsp = plane_split([(run_fwd, 17)])
                run_j = plane_join(full_gather(
                    rp, jnp.maximum(rc, 0)), rsp)[0]
                matched, off_all, mlen_all = inject_run(
                    rc, jnp.minimum(run_fwd, run_j),
                    (matched, off_all, mlen_all))
        else:
            # ---- exact sort tiers (levels 8-9) ----
            # candidate sets standing in for the chain walk: nearest +
            # 2nd nearest 8-byte-prefix occurrence, then 12/16/32-byte
            # prefixes
            p8b = prev8          # same keys as the base 8-byte tier
                                 # (was a duplicated 2-sort call)
            # +1 bias so "no predecessor" (-1) stays distinguishable
            # through the gather (a clamped -1 would fabricate position
            # 0 as a verified candidate)
            pp8, psp8 = plane_split([(p8b + 1, 18)])
            p8_2 = plane_join(full_gather(pp8, jnp.maximum(p8b, 0)),
                              psp8)[0] - 1
            p8_2 = jnp.where((p8b >= 0) & (p8_2 >= 0), p8_2, -1)
            if "no2nd" not in _dbg:
                cand_sets.append((p8_2, True))          # 2nd-nearest 8B
            if "nofirst" not in _dbg:
                cand_sets.append((_first_occurrence((u32, u32s4)), True))
                # 2nd-nearest 4-byte occurrence (LCP verified from byte 4)
                pp4, psp4 = plane_split([(prev4 + 1, 18)])
                p4_2 = plane_join(full_gather(pp4, jnp.maximum(prev4, 0)),
                                  psp4)[0] - 1
                p4_2 = jnp.where((prev4 >= 0) & (p4_2 >= 0), p4_2, -1)
                cand_sets.append((p4_2, False))
            if "no12" not in _dbg:
                cand_sets.append((_prev_occurrence(
                    (u32, u32s4, shift32(u32, 8))), True))  # 12B prefix
            if "no16" not in _dbg:
                cand_sets.append((_prev_occurrence(
                    (u32, u32s4, shift32(u32, 8), shift32(u32, 12))),
                    True))
            if hc_level >= 2 and "no32" not in _dbg:
                cand_sets.append((_prev_occurrence(
                    (u32, u32s4, shift32(u32, 8), shift32(u32, 12),
                     shift32(u32, 16), shift32(u32, 20), shift32(u32, 24),
                     shift32(u32, 28))), True))         # 32-byte prefix
            if "nosuffix" not in _dbg:
                # suffix-adjacency union tier: candidates the width
                # tiers structurally miss (prefix widths between the
                # sorted tiers, far first-occurrence entries at every
                # width via the min-position scan)
                ws = (u32, u32s4) + tuple(
                    shift32(u32, 4 * k) for k in range(2, 8))
                sfx, _slcp = _suffix_candidates(ws)
                cand_sets.append((sfx, False))
            if "norun" not in _dbg:
                # run-start candidates via one exact sort per min-run
                # tier; LCP = min(run_i, run_j) exactly when the runs
                # differ in length and a lower bound otherwise —
                # injected directly so the far-match extension cap
                # cannot truncate it.
                rp, rsp = plane_split([(run_fwd, 17)])
                for min_run in (MINMATCH, 16, 64):
                    keyr = jnp.where(is_rs & (run_fwd >= min_run), x, 300)
                    prev_rs = _prev_occurrence((keyr,))
                    run_j = plane_join(full_gather(
                        rp, jnp.maximum(prev_rs, 0)), rsp)[0]
                    matched, off_all, mlen_all = inject_run(
                        prev_rs, jnp.minimum(run_fwd, run_j),
                        (matched, off_all, mlen_all))
        for prev_t, verified8 in cand_sets:
            ok_t = (prev_t >= 0) & (i[None, :] - prev_t <= MAX_DISTANCE)
            # the "first 8 bytes verified" claim must track which
            # candidate each position actually uses
            claim = (ok_t & verified8) | (~ok_t & m8)
            m_t, off_t, ml_t = _match_lengths_dispatch(
                x, u32, jnp.where(ok_t, prev_t, prev),
                claim, end_abs, data_len, D, rcap,
                top_offsets=24, sub_step=8, fused=fused)
            better = m_t & ok_t & (ml_t > mlen_all)
            matched = matched | better
            off_all = jnp.where(better, off_t, off_all)
            mlen_all = jnp.where(better, ml_t, mlen_all)

        if hc_level >= 4 and "nolazy" not in _dbg:
            # lazy parse: defer a match when position i+1 holds a
            # strictly longer one, or i+2 holds one longer by > 1
            # (the r93 lazy/2-ahead shape, `lz4hc.c:612-660`)
            ml1 = jnp.concatenate(
                [mlen_all[:, 1:], jnp.zeros_like(mlen_all[:, :1])], axis=1)
            m1 = jnp.concatenate(
                [matched[:, 1:], jnp.zeros_like(matched[:, :1])], axis=1)
            ml2 = jnp.concatenate(
                [mlen_all[:, 2:], jnp.zeros_like(mlen_all[:, :2])], axis=1)
            m2 = jnp.concatenate(
                [matched[:, 2:], jnp.zeros_like(matched[:, :2])], axis=1)
            r1 = m1 & (ml1 > mlen_all)
            r2 = m2 & (ml2 > mlen_all + 1)
            defer = r1 | r2
            # one-shot simultaneous deferral loses BOTH matches when the
            # beneficiary is itself deferred (ascending-length cascades
            # drop every intermediate match; the reference's sequential
            # loop keeps the last one standing).  Honor a defer only if
            # its beneficiary survives; iterate to fixpoint (alternating
            # cascades converge geometrically).
            for _ in range(4):
                d1 = jnp.concatenate(
                    [defer[:, 1:], jnp.zeros_like(defer[:, :1])], axis=1)
                d2 = jnp.concatenate(
                    [defer[:, 2:], jnp.zeros_like(defer[:, :2])], axis=1)
                defer = (r1 & ~d1) | (r2 & ~d2)
            matched = matched & ~defer

        # (a wider-match trim pass — emit a shortened first match when a
        # longer one starts mid-span, `lz4hc.c:462-520` — was tried here
        # and measured strictly worse at every margin/window setting on
        # the ratio corpus; the coverage gain rarely repays the extra
        # sequence header.  See git history of this file.)

    if P:
        # dictionary mode: tokens start in the block only, and matches
        # may not reach before the true window start (the decoder's
        # ref_floor check, `decode_vector.py` pre/pre_len mode)
        matched = matched & (i[None, :] >= P) \
            & (off_all <= i[None, :] - (P - pre_len_arr[:, None]))

    _e = _stage_exit("e2", mlen_all, B, O)
    if _e is not None:
        return _e

    # E3+E4 in ONE Pallas kernel on TPU (ops/seq_kernel.py): parse
    # chain, token compaction, literal runs, catch-up, merge and
    # emission prep never leave VMEM.  The multi-op XLA formulation
    # below remains the CPU/test path and the LZ4NET_SEQ_IMPL=xla A/B.
    use_seq = fused and D % 8192 == 0 \
        and os.environ.get("LZ4NET_SEQ_IMPL", "kernel") == "kernel" \
        and os.environ.get("LZ4NET_ENC_STAGE") not in ("e3", "e4")
    if use_seq:
        from .emit_kernel import emit_bytes
        from .seq_kernel import sequence_records
        s0k_f, litsrc_f, ll_f, offk_f, mlk_f, stats = sequence_records(
            u32, matched.astype(jnp.int32), off_all, mlen_all,
            end_abs, pre_len_arr, D, S_cap, P=P,
            cu_rounds=2 if hc_level == 0 else 8)
        n_seqs = stats[:, 0]
        n_m = stats[:, 1]
        out_len = stats[:, 2]
        direct_o, cidx_o, emiss = emit_bytes(
            s0k_f, litsrc_f, ll_f, offk_f, mlk_f, out_len, O)
        is_lit_o = cidx_o >= 0
        xp2, xsp2 = plane_split([(x, 8)])
        lvals = plane_join(full_gather(
            xp2, jnp.where(is_lit_o, cidx_o, 0)), xsp2)[0]
        o_live = o[None, :] < out_len[:, None]
        out = jnp.where(is_lit_o, lvals, direct_o) & 0xFF
        out = out * o_live
        ok = (n_seqs < S_cap) & (n_m < S_cap) & (emiss == 0)
        aux = jnp.stack([stats[:, 3], stats[:, 4]], axis=1)
        return out, out_len, ok, aux

    # E3 — greedy parse: chain-thread the "next token" graph
    nm = _next_match_at_or_after(matched, D)
    step = jnp.where(matched, mlen_all, 1)
    tgt = jnp.clip(i[None, :] + step, 0, D - 1)
    np_, nsp = plane_split([(nm, 18)])
    nm_at_end = plane_join(full_gather(np_, tgt), nsp)[0]
    nm_at_end = jnp.where(i[None, :] + step >= D, jnp.int32(D), nm_at_end)
    g = jnp.where(matched, nm_at_end, nm)
    g = jnp.maximum(g, i[None, :] + 1)          # junk-safe: strictly forward

    if fused:
        # chain threading in ONE Pallas kernel (the decode parse
        # megakernel's P2-P4 structure) — the XLA form below spends
        # ~8 ms/MB across ~30 separate doubling/marking ops on chip
        from .chain_kernel import mark_chain
        mark = mark_chain(g, D) * matched.astype(jnp.int32)
    else:
        nseg = D // SEG
        g3 = g.reshape(B, nseg, SEG)
        H3 = _segment_exits(g3, nseg)
        entries = _thread_chain(H3, nseg)
        mark = _mark_tokens(g3, entries, nseg)
        mark = mark * matched.astype(jnp.int32)

    _e = _stage_exit("e3", mark, B, O)
    if _e is not None:
        return _e
    # E4 — sequence records
    n_seqs = jnp.sum(mark, axis=1)
    tok = compact_indices(mark == 1, S_cap, big=D)
    valid = tok < D
    tok_c = jnp.clip(tok, 0, D - 1)
    off_s, mlen_s = _gather_multi([(off_all, 17), (mlen_all, 17)],
                                  tok_c, fused)
    off_s = jnp.where(valid, off_s, 0)
    mlen_s = jnp.where(valid, mlen_s, 0)

    prev_end = jnp.concatenate(
        [jnp.full((B, 1), P, jnp.int32), (tok_c + mlen_s)[:, :-1]], axis=1)
    lit_start = jnp.where(valid, prev_end, 0)
    lit_len = jnp.where(valid, tok_c - lit_start, 0)

    # catch-up: extend each selected match backwards over equal bytes,
    # shrinking the preceding literal run (`Safe64.Dirty.cs:145-149`).
    # The match *end* is unchanged, so the parse chain is unaffected.
    cb = jnp.zeros_like(tok_c)
    can = valid & (mlen_s > 0)
    floor_abs = P - pre_len_arr[:, None]   # lowest legal match source
    for _ in range(2 if hc_level == 0 else 8):
        cb_max = jnp.minimum(lit_len, tok_c - off_s - floor_abs)
        pa = jnp.clip(tok_c - cb - 4, 0, x.shape[1] - 1)
        pb = jnp.clip(tok_c - off_s - cb - 4, 0, x.shape[1] - 1)
        (wa,) = _gather_multi([(u32, 32)], pa, fused)
        (wb,) = _gather_multi([(u32, 32)], pb, fused)
        nb = jnp.where(can & (tok_c - cb - 4 >= 0)
                       & (tok_c - off_s - cb - 4 >= 0),
                       _xor_match_bytes_rev(wa, wb), 0)
        cb = jnp.minimum(cb + nb, jnp.maximum(cb_max, 0))
        can = can & (nb == 4)
    lit_len = lit_len - jnp.where(valid, cb, 0)
    mlen_s = mlen_s + jnp.where(valid, cb, 0)

    # merge contiguous same-offset matches (recovers far-cap truncation)
    prev_off = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), off_s[:, :-1]], axis=1)
    is_start = (~valid) | (k[None, :] == 0) | (lit_len != 0) \
        | (off_s != prev_off)
    mcum = jnp.cumsum(mlen_s, axis=1)
    start_next = jnp.concatenate(
        [jnp.where(is_start[:, 1:], k[None, 1:], jnp.int32(S_cap)),
         jnp.full((B, 1), S_cap, jnp.int32)], axis=1)
    nxt = jnp.flip(jax.lax.cummin(jnp.flip(start_next, axis=-1),
                              axis=start_next.ndim - 1), axis=-1)
    last = jnp.clip(nxt - 1, 0, S_cap - 1)
    (mcum_last,) = _gather_multi([(mcum, 21)], last, fused)
    merged_mlen = mcum_last - (mcum - mlen_s)

    keep = is_start & valid
    n_m = jnp.sum(keep, axis=1)
    kidx = compact_indices(keep, S_cap, big=S_cap)
    lit_start_m, lit_len_m, off_m, mlen_m = _gather_multi(
        [(jnp.where(keep, lit_start, 0), 17),
         (jnp.where(keep, lit_len, 0), 17),
         (jnp.where(keep, off_s, 0), 17),
         (jnp.where(keep, merged_mlen, 0), 17)],
        jnp.clip(kidx, 0, S_cap - 1), fused)
    valid_m = kidx < S_cap
    lit_start_m = jnp.where(valid_m, lit_start_m, 0)
    lit_len_m = jnp.where(valid_m, lit_len_m, 0)
    off_m = jnp.where(valid_m, off_m, 0)
    mlen_m = jnp.where(valid_m, mlen_m, 0)

    # final literal-only record at index n_m (LASTLITERALS tail)
    tail_start = jnp.maximum(jnp.max(
        jnp.where(valid_m, lit_start_m + lit_len_m + mlen_m, 0), axis=1),
        P)
    is_final = k[None, :] == n_m[:, None]
    lit_start_m = jnp.where(is_final, tail_start[:, None], lit_start_m)
    lit_len_m = jnp.where(
        is_final, end_abs[:, None] - tail_start[:, None], lit_len_m)
    off_m = jnp.where(is_final, 0, off_m)
    mlen_m = jnp.where(is_final, 0, mlen_m)
    live = valid_m | is_final
    has_match = live & (mlen_m > 0)
    has_lit = live & (lit_len_m > 0)

    _e = _stage_exit("e4", mlen_m + lit_len_m, B, O)
    if _e is not None:
        return _e
    # E5 — emission.  Per-record sizes and output offsets.
    e_lit = jnp.maximum(lit_len_m - RUN_MASK, 0)
    lit_ext = jnp.where(live & (lit_len_m >= RUN_MASK),
                        1 + e_lit // 255, 0)
    e_m = jnp.maximum(mlen_m - MINMATCH - ML_MASK, 0)
    m_ext = jnp.where(has_match & (mlen_m - MINMATCH >= ML_MASK),
                      1 + e_m // 255, 0)
    size = jnp.where(live,
                     1 + lit_ext + lit_len_m
                     + jnp.where(has_match, 2 + m_ext, 0), 0)
    s0 = jnp.cumsum(size, axis=1) - size
    out_len = jnp.sum(size, axis=1)

    if fused:
        # emission megakernel: binary-search the governing record per
        # output byte (ops/emit_kernel.py) — replaces the scatter stack
        # below, which costs ~8 x 2.8 ms per 1 MB batch on chip
        from .emit_kernel import BIGKEY, emit_bytes
        from . import fused_gather as fg2
        s0k = jnp.where(live, s0, jnp.int32(BIGKEY))
        direct_o, cidx_o, emiss = emit_bytes(
            s0k, jnp.where(live, lit_start_m, 0),
            jnp.where(live, lit_len_m, 0),
            jnp.where(live, off_m, 0),
            jnp.where(live, jnp.where(has_match, mlen_m, 0), 0),
            out_len, O)
        is_lit_o = cidx_o >= 0
        # literal values: exact staged gather — the source stream jumps
        # by the local decompression ratio (KBs per compressed row in
        # match-heavy regions), which no fixed rowbase window covers
        xp2, xsp2 = plane_split([(x, 8)])
        lvals = plane_join(full_gather(
            xp2, jnp.where(is_lit_o, cidx_o, 0)), xsp2)[0]
        o_live = o[None, :] < out_len[:, None]
        out = jnp.where(is_lit_o, lvals, direct_o) & 0xFF
        out = out * o_live
        ok = (n_seqs < S_cap) & (n_m < S_cap) & (emiss == 0)
        first_lit = jnp.where(n_m > 0, lit_len_m[:, 0],
                              end_abs - tail_start)
        tail_lit = end_abs - tail_start
        aux = jnp.stack([first_lit, tail_lit], axis=1)
        return out, out_len, ok, aux

    tok_byte = (jnp.minimum(lit_len_m, RUN_MASK) << 4) \
        | jnp.minimum(jnp.where(has_match, mlen_m - MINMATCH, 0), ML_MASK)
    lit_o = s0 + 1 + lit_ext                     # first literal byte
    off_o = lit_o + lit_len_m                    # offset lo byte
    mext_o = off_o + 2                           # first matchlen-ext byte

    def scat(pos, val, mask, bits=8):
        p = jnp.where(mask, jnp.clip(pos, 0, O - 1), O - 1)
        w = jnp.where(mask, val, 0)
        return scatter_add_planes(p, w, O, bits=bits)

    ones = jnp.ones_like(s0)
    direct = scat(s0, tok_byte, live)
    direct = direct + scat(off_o, off_m & 0xFF, has_match)
    direct = direct + scat(off_o + 1, off_m >> 8, has_match)

    # extension runs: 255s, remainder in the last byte.  One scatter of
    # rem+1 marks the last byte (>0 test distinguishes it from the 255s).
    has_lext = live & (lit_ext > 0)
    has_mext = has_match & (m_ext > 0)
    ext_in = jnp.cumsum(scat(s0 + 1, ones, has_lext)
                        + scat(mext_o, ones, has_mext)
                        - scat(s0 + 1 + lit_ext, ones, has_lext)
                        - scat(mext_o + m_ext, ones, has_mext),
                        axis=1) > 0
    remp1 = scat(s0 + lit_ext, e_lit % 255 + 1, has_lext, bits=9) \
        + scat(mext_o + m_ext - 1, e_m % 255 + 1, has_mext, bits=9)
    ext_val = jnp.where(remp1 > 0, remp1 - 1, 255)

    # literal bytes: jump-scatter per-run source deltas -> per-byte
    # source index -> one gather from the input
    in_lit = jnp.cumsum(scat(lit_o, ones, has_lit)
                        - scat(lit_o + lit_len_m, ones, has_lit),
                        axis=1) > 0
    dlit = jnp.where(has_lit, lit_start_m - lit_o + BIASE, 0)
    carried = jax.lax.associative_scan(
        lambda a, b: jnp.where(b == 0, a, b), dlit, axis=1)
    prev_dlit = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), carried[:, :-1]], axis=1)
    jump = jnp.where(has_lit, dlit - prev_dlit, 0)
    sj = scat(lit_o, jump + BIASJ_E, has_lit, bits=20)
    ind = scat(lit_o, ones, has_lit)
    dlit_o = jnp.cumsum(sj - BIASJ_E * ind, axis=1) - BIASE
    src_idx = jnp.clip(o[None, :] + dlit_o, 0, D - 1)
    xp, xsp = plane_split([(x, 8)])
    lit_vals = plane_join(full_gather(xp, src_idx), xsp)[0]

    out = jnp.where(in_lit, lit_vals,
                    jnp.where(ext_in, ext_val, direct)) & 0xFF
    out = out * (o[None, :] < out_len[:, None])

    ok = (n_seqs < S_cap) & (n_m < S_cap)
    # aux: (first record's literal length, final record's literal
    # length) — the big-block segment assembler merges boundary
    # literal runs with these (VectorEncoder._encode_big)
    first_lit = jnp.where(n_m > 0, lit_len_m[:, 0],
                          end_abs - tail_start)
    tail_lit = end_abs - tail_start
    aux = jnp.stack([first_lit, tail_lit], axis=1)
    return out, out_len, ok, aux


_AOT_CACHE: dict = {}


def encode_batch_vectorized(x, data_len, D, O, S_cap, rcap=4096,
                            hc_level=0, P=0, pre_len=None, fused=False):
    """Jit entry for `_encode_batch_traced` via an explicit AOT
    lower/compile cache rather than @jax.jit: jax 0.9's re-execution
    fastpath runs a cached pjit executable with a mismatched buffer
    list once several static-arg variants of this function have been
    compiled ("Execution supplied 2 buffers but compiled program
    expected 4") — AOT-compiled executables bypass that path.  Traced
    callers (an enclosing jit/shard_map) inline the implementation."""
    statics = dict(D=D, O=O, S_cap=S_cap, rcap=rcap, hc_level=hc_level,
                   P=P, fused=fused)
    if any(isinstance(a, jax.core.Tracer)
           for a in (x, data_len, pre_len) if a is not None):
        return _encode_batch_traced(x, data_len, pre_len=pre_len,
                                    **statics)
    x = jnp.asarray(x)
    data_len = jnp.asarray(data_len)
    if pre_len is not None:
        pre_len = jnp.asarray(pre_len)
    import os as _os
    key = (x.shape, x.dtype, data_len.shape, pre_len is None,
           tuple(sorted(statics.items())),
           # env knobs that select different traced programs
           _os.environ.get("LZ4NET_ENC_STAGE"),
           _os.environ.get("LZ4NET_SEQ_IMPL"),
           _os.environ.get("LZ4NET_MLEN_IMPL"),
           _os.environ.get("LZ4NET_TOPOFF"),
           _os.environ.get("LZ4NET_HC_TIERS"),
           _os.environ.get("LZ4NET_HC_TABLES"),
           _os.environ.get("LZ4NET_HC_DEBUG"))
    fn = _AOT_CACHE.get(key)
    if fn is None:
        if pre_len is None:
            jitted = jax.jit(lambda a, b: _encode_batch_traced(
                a, b, **statics))
            fn = jitted.lower(x, data_len).compile()
        else:
            jitted = jax.jit(lambda a, b, c: _encode_batch_traced(
                a, b, pre_len=c, **statics))
            fn = jitted.lower(x, data_len, pre_len).compile()
        _AOT_CACHE[key] = fn
    return fn(x, data_len) if pre_len is None else fn(x, data_len,
                                                      pre_len)


class VectorEncoder:
    """Host wrapper: pads blocks to a shared shape, dispatches the
    vectorised encoder, falls back to the CPU oracle for blocks the
    kernel flags or that exceed its budgets.  Fast mode: output is
    format-valid and size-competitive, not parse-identical."""

    MAX_BLOCK = 96 * 1024

    def encode_batch(self, blocks, dst_maxlens=None, hc_level=0,
                     dictionary=None):
        """``hc_level`` 0 = fast greedy; 1-9 = fast-HC (deeper candidate
        tiers, lazy parse from level 4 — see encode_batch_vectorized).
        ``dictionary`` enables preset-dictionary matching: the window's
        last 64 KB is laid out as a right-aligned row prefix and match
        candidates reach into it (`encode_batch_vectorized`` P mode)."""
        from ..constants import MAX_DISTANCE
        n = len(blocks)
        if n == 0:
            return []
        if dst_maxlens is None:
            dst_maxlens = [maximum_output_length(len(b)) for b in blocks]
        results = [None] * n
        for b in range(n):
            if len(blocks[b]) > self.MAX_BLOCK:
                results[b] = self._encode_big(blocks[b], dst_maxlens[b],
                                              hc_level, dictionary)
        device = [b for b in range(n)
                  if 0 < len(blocks[b]) <= self.MAX_BLOCK]
        if device:
            P = 0
            window = b""
            if dictionary:
                window = bytes(dictionary)[-(MAX_DISTANCE + 1):]
                P = _cdiv(max(len(window), 1), CH) * CH
            max_d = max(len(blocks[b]) for b in device)
            D = P + _cdiv(max_d + 1, CH) * CH
            O = _cdiv(maximum_output_length(D - P) + 1, CH) * CH
            S_cap = _cdiv(D // MINMATCH + 2, LANE) * LANE + LANE
            x = np.zeros((len(device), D), np.uint8)
            for j, b in enumerate(device):
                if P:
                    x[j, P - len(window):P] = np.frombuffer(window,
                                                            np.uint8)
                x[j, P:P + len(blocks[b])] = np.frombuffer(
                    blocks[b], np.uint8)
            dl = np.array([len(blocks[b]) for b in device], np.int32)
            pre_len = (jnp.asarray(np.full(len(device), len(window),
                                           np.int32)) if P else None)
            from .decode_vector import _use_fused
            lvl = min(max(hc_level, 0), 9)
            rcap = (4096 if lvl == 0 else
                    max(4096, D // (8 if lvl <= 5 else 4)))
            out, out_len, ok, _aux = encode_batch_vectorized(
                jnp.asarray(x).astype(jnp.int32), jnp.asarray(dl), D,
                O, S_cap, rcap=rcap,
                hc_level=lvl, P=P, pre_len=pre_len, fused=_use_fused())
            # fetch bytes, not words: host link is ~20 MB/s
            out = np.asarray(out.astype(jnp.uint8))
            out_len, ok = np.asarray(out_len), np.asarray(ok)
            for j, b in enumerate(device):
                if bool(ok[j]):
                    payload = out[j, :int(out_len[j])] \
                        .astype(np.uint8).tobytes()
                    results[b] = payload \
                        if len(payload) <= dst_maxlens[b] else b""
        for b in range(n):
            if results[b] is None:
                results[b] = self._host_encode(blocks[b], dst_maxlens[b],
                                               hc_level, dictionary)
        return results

    SEG_SIZE = 64 * 1024

    def _encode_big(self, block, dst_maxlen, hc_level=0, dictionary=None):
        """Encode one block beyond the kernel cap by segmenting the
        input: each 64 KB segment encodes against the previous 64 KB as
        a prefix window (encode_batch_vectorized P mode), and the
        concatenated payloads form ONE valid LZ4 block — offsets are
        16-bit so no sequence reaches past the window, and each
        segment's literal tail (MFLIMIT rules applied per segment) is
        plain mid-block literals.  All segments encode in ONE device
        batch (their windows are input slices, no sequential
        dependency).  Cost vs whole-block encode: a forced <= 12-byte
        literal tail per 64 KB (< 0.02%).  Raises nothing: falls back
        to the host oracle when the device flags any segment."""
        from ..constants import MAX_DISTANCE
        from ..models import native, reference
        n = len(block)
        segs = [(s, min(self.SEG_SIZE, n - s))
                for s in range(0, n, self.SEG_SIZE)]
        # per-segment windows: dictionary tail for the first, the
        # preceding input bytes after
        P = _cdiv(MAX_DISTANCE + 1, CH) * CH
        D = P + _cdiv(self.SEG_SIZE + 1, CH) * CH
        O = _cdiv(maximum_output_length(D - P) + 1, CH) * CH
        S_cap = _cdiv(D // MINMATCH + 2, LANE) * LANE + LANE
        x = np.zeros((len(segs), D), np.uint8)
        dl = np.zeros(len(segs), np.int32)
        pre_len = np.zeros(len(segs), np.int32)
        head = bytes(dictionary)[-(MAX_DISTANCE + 1):] if dictionary \
            else b""
        for j, (s, ln) in enumerate(segs):
            lo = max(0, s - (MAX_DISTANCE + 1))
            window = block[lo:s]
            if s < MAX_DISTANCE + 1 and head:
                window = (head + block[:s])[-(MAX_DISTANCE + 1):]
            if window:
                x[j, P - len(window):P] = np.frombuffer(window, np.uint8)
            x[j, P:P + ln] = np.frombuffer(block[s:s + ln], np.uint8)
            dl[j] = ln
            pre_len[j] = len(window)
        from .decode_vector import _use_fused
        lvl = min(max(hc_level, 0), 9)
        rcap = (4096 if lvl == 0 else
                    max(4096, D // (8 if lvl <= 5 else 4)))
        out, out_len, ok, aux = encode_batch_vectorized(
            jnp.asarray(x).astype(jnp.int32), jnp.asarray(dl), D, O,
            S_cap, rcap=rcap, hc_level=lvl, P=P,
            pre_len=jnp.asarray(pre_len), fused=_use_fused())
        out = np.asarray(out.astype(jnp.uint8))
        out_len = np.asarray(out_len)
        aux = np.asarray(aux)
        if not np.asarray(ok).all():
            return self._host_encode(block, dst_maxlen, hc_level,
                                     dictionary)

        # Boundary merge: a literal-only record is legal only as a
        # block's LAST sequence, so each non-final segment's literal
        # tail (its bytes are an input suffix) is stripped and merged
        # into the next segment's first record's literal run.
        from .bigblock import _synth_literals

        def _lit_hdr(ll):
            return 1 + (0 if ll < 15 else 1 + (ll - 15) // 255)

        parts = []
        pending = 0                      # carried literal byte count
        for j, (sg, ln) in enumerate(segs):
            pl_ = out[j, :int(out_len[j])].astype(np.uint8).tobytes()
            first_ll = int(aux[j, 0])
            tail_ll = int(aux[j, 1])
            if first_ll == ln and tail_ll == ln:
                pending += ln            # literal-only segment
                continue
            if pending:
                new_ll = pending + first_ll
                tok_old = pl_[0]
                lit_bytes = bytes(block[sg - pending:sg])
                head = _synth_literals(
                    lit_bytes + pl_[_lit_hdr(first_ll):
                                    _lit_hdr(first_ll) + first_ll])
                # _synth_literals emits token with ml nibble 0; restore
                # the original match nibble
                head = bytes([head[0] | (tok_old & 15)]) + head[1:]
                pl_ = head + pl_[_lit_hdr(first_ll) + first_ll:]
            if j < len(segs) - 1:
                strip = _lit_hdr(tail_ll) + tail_ll
                pl_ = pl_[:len(pl_) - strip]
                pending = tail_ll
            else:
                pending = 0
            parts.append(pl_)
        if pending:                      # trailing literal-only tail
            parts.append(_synth_literals(bytes(block[n - pending:])))
        payload = b"".join(parts)
        return payload if len(payload) <= dst_maxlen else b""

    @staticmethod
    def _host_encode(block, dst_maxlen, hc_level=0, dictionary=None):
        from ..models import native
        from ..models import reference
        eng = native if native.is_available() else reference
        if dictionary:
            if hc_level > 0:
                return eng.compress_block_hc_dict(dictionary, block,
                                                  dst_maxlen)
            return eng.compress_block_dict(dictionary, block, dst_maxlen)
        if hc_level > 0:
            return eng.compress_block_hc(block, dst_maxlen)
        return eng.compress_block(block, dst_maxlen)
