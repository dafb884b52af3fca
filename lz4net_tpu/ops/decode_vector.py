"""Vectorised LZ4 block decode v2: banded gathers + chunked wavefront.

The first vectorised pipeline (git history of this file) proved the
phase structure but ran at 16 MB/s: every phase leaned on full-table
one-hot gathers (``table_size`` MACs per element) and the match
resolution pointer-doubled per byte over the whole output (measured
~3.7 ms/round x up to 19 rounds per 1 MB sub-batch).  v2 keeps the
phase structure and replaces the cost model:

P1  speculative parse    per-position token fields.  Extension values
                         become *elementwise* via
                         ``ext_val[q] = 255*run255[q] + b[q+run255[q]]``
                         (one short-range banded gather); extension byte
                         counts derive arithmetically (``ext // 255``).
                         Only the match-side lookup at ``mpos+2`` needs a
                         long-range gather -> banded + compact fallback.
P2  chain threading      segment-exit doubling and in-segment walks use
                         3x8-bit-plane bf16 einsums (the f32
                         Precision.HIGHEST lookups of v1 cost a 6-pass
                         bf16 emulation).
P3  sequence records     token compaction by one `lax.sort` (0.8 ms
                         measured vs 2.7 ms for the equivalent scatter);
                         per-sequence fields gathered once as packed
                         byte planes; header sizes derived, not stored.
P4  per-byte events      the per-byte event-id/gather machinery of v1 is
                         replaced by a piecewise-constant *jump scatter*:
                         valid events have strictly increasing output
                         positions, so scattering payload deltas at event
                         starts and prefix-summing reconstructs the
                         per-byte payload (lit-source delta or match
                         offset) exactly.  One indicator scatter + one
                         cummax give event starts for overlap collapse.
P5  wavefront resolve    literal bytes materialise globally (their comp
                         sources are monotone -> banded gather).  Output
                         is then resolved in statically unrolled 8 KB
                         chunks: match bytes pointing into earlier chunks
                         read already-resolved *values* in one gather
                         over a static slice; in-chunk nesting collapses
                         by local pointer doubling over the 8 KB window
                         (self-overlapping RLE matches were already
                         collapsed analytically via mod arithmetic).

Anything unbounded (sequence/event counts over the static caps, band
fallback overflow, parse-window misses) sets a per-block ``ok=False``
that the host
wrapper serves from the CPU oracle — mirroring the reference's
graceful-degradation pattern (`LZ4Codec.cs:82-100`).

Reference semantics: known-output-length decode, `LZ4_uncompress`
(`/root/reference/src/LZ4ps/LZ4Codec.Safe64.Dirty.cs:533-659`), with the
overlapping-match rule of `original/lz4_format_description.txt:66-85`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import MAX_DISTANCE
from .banded import (banded_gather, full_gather, hier_gather,
                     plane_join, plane_split, scatter_add_planes,
                     sorted_compact, compact_indices)
from . import fused_gather as fg

# only the last 64 KB of a preset dictionary is reachable (offsets are
# 16-bit; the closest in-block destination is the block start)
MAX_DISTANCE_WINDOW = MAX_DISTANCE + 1

LANE = 128
SEG = 128
CH = 8192            # P5 wavefront chunk (output axis)
BCH = 4096           # banding chunk for parse-side gathers
BW = 8192            # parse band width

BIAS17 = 1 << 17     # comp-domain length clamp (blocks <= 96 KB)
M17 = (1 << 17) - 1

# Output-domain budgets.  Output positions live in [0, P + D) where P is
# the (static, CH-aligned) preset-dictionary prefix and D the padded data
# length; P + D must stay <= BIASD so literal-source deltas stay
# non-negative after biasing.  2^18 = 256 KB covers a full 64 KB
# dictionary window plus the 96 KB max block with room to spare, and the
# wider fields cost no extra byte-planes anywhere (19/20/22-bit fields
# still split into 3 planes).
BIASD = 1 << 18      # bias for literal-source deltas in payload words
FLAGL = 1 << 19      # literal-event flag in payload words
MASKP = (1 << 19) - 1
BIASJ = 1 << 20      # bias for jump-scatter weights (3 planes at 22 bits)
VFLAG = 1 << 19      # value-terminal flag in P5 state words


def _cdiv(a, b):
    return -(-a // b)


def _suffix_run255(b):
    """run[i] = length of the run of 255-valued bytes starting at i."""
    C = b.shape[-1]
    rev = jnp.flip(b, axis=-1)
    idx = jnp.arange(C, dtype=jnp.int32)
    last_non = jax.lax.cummax(jnp.where(rev != 255, idx, -1), axis=rev.ndim - 1)
    cnt = idx - last_non
    return jnp.flip(cnt, axis=-1)


# ---------------------------------------------------------------------------
# P1 — speculative parse
# ---------------------------------------------------------------------------

def _speculative_parse(comp, C, k2_cap):
    """Per-position parse fields: (g, lit_len, hdr, mpos, mlen, overflow).

    XLA-only path: on real TPU the fused pipeline routes P1-P4 through
    `parse_kernel.parse_tokens` instead (decode_batch_vectorized)."""
    b = comp
    i = jnp.arange(C, dtype=jnp.int32)
    run255 = _suffix_run255(b)

    # ext_val[q]: value of a 255-extension sequence starting at q
    # (terminator byte is the first non-255 byte; format guarantees it).
    # A real extension run is <= ceil(96K/255) = 377 bytes of 0xFF, so a
    # 5-row (640 B) forward window is exact at every real extension
    # start; junk positions (inside 0xFF-filled literal data) may fall
    # out of band and read garbage, which stays junk-safe via clipping.
    term_idx = jnp.clip(i[None, :] + run255, 0, C - 1)
    planes_b, _ = plane_split([(b, 8)])
    term, _ = banded_gather(planes_b, term_idx, BCH, BW, 0)
    term = term[:, 0, :]
    ext_val = jnp.clip(255 * run255 + term, 0, M17)

    lit_nib = b >> 4
    ml_nib = b & 15

    # literal side: extension starts at i+1 -> one static shift
    ext_lit = jnp.concatenate(
        [ext_val[:, 1:], jnp.zeros_like(ext_val[:, :1])], axis=1)
    lit_len = jnp.where(lit_nib == 15, 15 + ext_lit, lit_nib)
    lit_len = jnp.clip(lit_len, 0, M17)
    hdr = 1 + jnp.where(lit_nib == 15, 1 + ext_lit // 255, 0)

    # match side: extension starts at mpos+2 (one long-range gather)
    mpos = jnp.clip(i[None, :] + hdr + lit_len, 0, C - 1)
    mp2 = jnp.clip(mpos + 2, 0, C - 1)
    (ext_m,), ovf = hier_gather([(ext_val, 17)], mp2,
                                ch=BCH, w=BW, back=0, k2_cap=k2_cap)
    ext_m = jnp.clip(ext_m, 0, M17)
    mlen = 4 + jnp.where(ml_nib == 15, 15 + ext_m, ml_nib)
    mlen = jnp.clip(mlen, 0, M17)
    mext = jnp.where(ml_nib == 15, 1 + ext_m // 255, 0)

    g = mpos + 2 + mext
    g = jnp.clip(g, i[None, :] + 3, C - 1)     # junk-safe: forward, in-range
    return g, lit_len, hdr, mpos, mlen, ovf


# ---------------------------------------------------------------------------
# P2 — chain threading (3-plane bf16 segment lookups)
# ---------------------------------------------------------------------------

def _seg_planes(table3):
    """[B, nseg, SEG] int32 (< 2^24) -> bf16 planes [B, nseg, 3, SEG].
    The planes-first bf16 einsum measured fastest of four variants
    (0.34 ms vs 0.99 for int8 matvecs at the [16,448,128,128] shape)."""
    return jnp.stack([((table3 >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
                      for p in range(3)], axis=-2)


def _seg_lookup_k(planes3, local):
    """out[b,s,k] = table[b,s, local[b,s,k]] for [B,nseg,K] locals."""
    oh = (jnp.clip(local, 0, SEG - 1)[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, local.shape + (SEG,), 3)).astype(jnp.bfloat16)
    r = jnp.einsum("bskl,bspl->bskp", oh, planes3,
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    return r[..., 0] | (r[..., 1] << 8) | (r[..., 2] << 16)


def _seg_lookup_1(planes3, local):
    """out[b,s] = table[b,s, local[b,s]] for [B,nseg] locals."""
    oh = (jnp.clip(local, 0, SEG - 1)[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, local.shape + (SEG,), 2)).astype(jnp.bfloat16)
    r = jnp.einsum("bsl,bspl->bsp", oh, planes3,
                   preferred_element_type=jnp.float32).astype(jnp.int32)
    return r[..., 0] | (r[..., 1] << 8) | (r[..., 2] << 16)


def _segment_exits(g3, nseg):
    """H[b,s,e] = first chain position >= end of segment s starting from
    position 128*s+e, by in-segment pointer doubling (2^6 >= 43 tokens)."""
    seg_end = ((jnp.arange(nseg, dtype=jnp.int32) + 1) * SEG)[None, :, None]
    seg_start = seg_end - SEG
    H = g3
    for _ in range(6):
        in_seg = H < seg_end
        nxt = _seg_lookup_k(_seg_planes(H), H - seg_start)
        H = jnp.where(in_seg, nxt, H)
    return H


def _thread_chain(H3, nseg):
    """Scan over segments; entry position per segment ([B, nseg], -1 where
    the chain skips the segment).  Tiny per-step lookups (K=1/segment)."""
    B = H3.shape[0]
    xs = jnp.moveaxis(H3, 1, 0)

    def body(v, x):
        s, h = x
        seg_start = s * SEG
        in_seg = (v >= seg_start) & (v < seg_start + SEG)
        local = jnp.clip(v - seg_start, 0, SEG - 1)
        oh = (local[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, local.shape + (SEG,), 1)).astype(jnp.float32)
        nxt = jnp.einsum("bl,bl->b", oh, h.astype(jnp.float32),
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
        entry = jnp.where(in_seg, v, -1)
        return jnp.where(in_seg, nxt, v), entry

    v0 = jnp.zeros((B,), jnp.int32)
    _, entries = jax.lax.scan(body, v0,
                              (jnp.arange(nseg, dtype=jnp.int32), xs))
    return jnp.moveaxis(entries, 0, 1)


def _mark_tokens(g3, entries, nseg):
    """Walk the chain inside each segment from its entry, marking real
    token starts.  Returns mask [B, nseg*128]."""
    B = g3.shape[0]
    planes3 = _seg_planes(g3)
    seg_start = (jnp.arange(nseg, dtype=jnp.int32) * SEG)[None, :]
    seg_end = seg_start + SEG
    pos = entries
    mark = jnp.zeros((B, nseg, SEG), jnp.int32)
    for _ in range(_cdiv(SEG, 3) + 1):
        valid = (pos >= seg_start) & (pos < seg_end)
        local = jnp.clip(pos - seg_start, 0, SEG - 1)
        oh = (local[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, local.shape + (SEG,), 2)).astype(jnp.int32)
        mark = mark | (oh * valid[..., None])
        nxt = _seg_lookup_1(planes3, local)
        pos = jnp.where(valid, nxt, jnp.int32(1 << 28))
    return mark.reshape(B, nseg * SEG)


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------

def _chk(*arrays):
    """Tiny checksum forcing evaluation of every input (phase profiling)."""
    acc = jnp.int32(0)
    for a in arrays:
        acc = acc + jnp.sum(a.astype(jnp.int32) & 0xFFFF)
    return acc


@functools.partial(jax.jit,
                   static_argnames=("C", "D", "S_cap", "E_cap", "k2_cap",
                                    "upto", "fused", "w_seq"))
def decode_batch_vectorized(comp, comp_len, out_len, C, D, S_cap, E_cap,
                            k2_cap=2048, upto=99, pre=None, pre_len=None,
                            fused=False, w_seq=16):
    """Decode a batch of independent known-length blocks.

    comp: [B, C] int32 bytes (zero padded), comp_len/out_len: [B] int32.
    C % 4096 == 0, D % 8192 == 0; S_cap/E_cap are sequence/event caps
    (multiples of 128) — blocks exceeding them come back with ok=False.

    ``pre`` ([B, P] int32 bytes, P % CH == 0) is an optional preset-
    dictionary prefix that logically precedes the output: matches may
    reference back into it (the reference-extension dictionary mode,
    `models/reference.py::decompress_block_dict`).  Each block's
    dictionary window is right-aligned at P; ``pre_len`` [B] gives its
    true length (for match-bound validation).

    Returns (out [B, D], total_out [B], ok [B], strict [B], consumed [B],
    needed [B]):
      * ``strict``   — every structural invariant of the hardened
        unknown-output-length decoder held (`LZ4_uncompress_unknown-
        OutputSize`, `Safe64.Dirty.cs:665-798`): every literal run stays
        inside the input, every non-final sequence carries a valid
        in-window match, and the final literal run ends exactly at
        ``comp_len`` (consume-all-input rule, `:714-721`).
      * ``consumed`` — compressed bytes the parse accounts for.
      * ``needed``   — exact decoded size implied by the parse
        (independent of ``out_len``), the return value of the
        unknown-length decode path.

    ``upto`` truncates the pipeline after phase N and returns a checksum
    (profiling only; production callers leave the default).
    """
    B = comp.shape[0]
    P = 0 if pre is None else pre.shape[1]
    Dt = P + D
    assert P % CH == 0 and Dt <= BIASD, (P, D)
    if pre_len is None:
        pre_len = jnp.zeros((B,), jnp.int32)
    nseg = C // SEG
    i = jnp.arange(C, dtype=jnp.int32)
    o = jnp.arange(Dt, dtype=jnp.int32)

    if fused:
        # P1–P4 in one kernel (ops/parse_kernel.py); a parse-window miss
        # on a marked token is certified per block and falls back
        from .parse_kernel import parse_tokens
        mark, lit_len_all, mlen_all, pmiss = parse_tokens(
            comp, comp_len, C)
        if upto in (1, 2, 3, 4):
            return _chk(mark, lit_len_all, mlen_all, pmiss)
    else:
        # P1 — parse
        g, lit_len_all, hdr_all, mpos_all, mlen_all, ovf1 = \
            _speculative_parse(comp, C, k2_cap=k2_cap)
        pmiss = ovf1 != 0
        if upto == 1:
            return _chk(g, lit_len_all, hdr_all, mpos_all, mlen_all, ovf1)

        # P2 — chain threading
        g3 = g.reshape(B, nseg, SEG)
        H3 = _segment_exits(g3, nseg)
        if upto == 2:
            return _chk(H3)
        entries = _thread_chain(H3, nseg)
        if upto == 3:
            return _chk(entries)
        mark = _mark_tokens(g3, entries, nseg)
        mark = mark * (i[None, :] < comp_len[:, None])
        if upto == 4:
            return _chk(mark)

    if fused:
        # megakernel path: records/events/per-byte state in one kernel
        # (ops/records_kernel.py), then the wavefront resolver; no
        # sequence/event caps apply (nothing is compacted)
        from .records_kernel import records_to_state
        from .resolve_kernel import resolve_wavefront
        t0m, cidx, stats = records_to_state(
            comp, mark, lit_len_all, mlen_all, comp_len, out_len,
            pre_len, C, Dt, P)
        n_seqs = stats[:, 0]
        total_out = stats[:, 1]
        strict = stats[:, 2].astype(bool)
        consumed = stats[:, 3]
        needed = stats[:, 4]
        rk_miss = stats[:, 5].astype(bool)
        if upto == 5:
            return _chk(stats)
        if upto == 6:
            return _chk(t0m, cidx)

        is_lit_o = cidx >= 0
        lit_idx = jax.lax.cummax(
            jnp.where(is_lit_o, jnp.clip(cidx, 0, C - 1), 0), axis=1)
        (vals0,), band_l = fg.rowbase_gather((comp,), lit_idx, 8, (8,))
        out_lim = P + out_len[:, None]
        live_o = o[None, :] < out_lim
        lit_miss = jnp.any(~band_l & is_lit_o & live_o, axis=1)
        T0 = jnp.where(is_lit_o, VFLAG | (vals0 & 0xFF), t0m)
        if P:
            T0 = jnp.where(o[None, :] < P,
                           VFLAG | jnp.concatenate(
                               [pre, jnp.zeros((B, D), jnp.int32)],
                               axis=1), T0)
        if upto == 7:
            return _chk(T0)
        out, res_ok = resolve_wavefront(T0, start_chunk=P // CH)
        if P:
            out = jax.lax.slice_in_dim(out, P, Dt, axis=1)
        out = out * (jnp.arange(D, dtype=jnp.int32)[None, :]
                     < out_len[:, None])
        ok = ~rk_miss & ~lit_miss & res_ok & ~pmiss
        return out, total_out, ok, strict, consumed, needed

    # P3 — sequence records
    n_seqs = jnp.sum(mark, axis=1)
    tok_pos = compact_indices(mark == 1, S_cap, big=C)      # [B, S_cap]
    valid_seq = tok_pos < C
    tok_c = jnp.clip(tok_pos, 0, C - 1)

    # per-seq fields gathered once, sharing one one-hot construction
    pp, sp = plane_split([(comp, 8), (lit_len_all, 17), (mlen_all, 17)])
    b_s, lit_len_s, mlen_s = plane_join(full_gather(pp, tok_c), sp)
    lit_len_s = jnp.clip(lit_len_s, 0, D)
    mlen_s = jnp.clip(mlen_s, 0, D)
    lit_nib_s = b_s >> 4
    hdr_s = 1 + jnp.where(lit_nib_s == 15,
                          1 + jnp.maximum(lit_len_s - 15, 0) // 255, 0)
    mpos_s = jnp.clip(tok_c + hdr_s + lit_len_s, 0, C - 2)

    off16 = comp | (jnp.concatenate(
        [comp[:, 1:], jnp.zeros_like(comp[:, :1])], axis=1) << 8)
    op, osp = plane_split([(off16, 16)])
    off_s = plane_join(full_gather(op, mpos_s), osp)[0]

    adv_s = jnp.where(valid_seq, lit_len_s + mlen_s, 0)
    out_start_s = P + jnp.cumsum(adv_s, axis=1) - adv_s
    match_dst_s = out_start_s + lit_len_s
    lit_src_s = tok_c + hdr_s
    out_lim = P + out_len[:, None]
    ref_floor = P - pre_len[:, None]     # lowest legal match reference

    match_ok = valid_seq & (match_dst_s < out_lim) \
        & (off_s > 0) & (match_dst_s - off_s >= ref_floor)
    lit_ok = valid_seq & (lit_len_s > 0) & (out_start_s < out_lim)
    total_out = jnp.sum(
        jnp.where(valid_seq & (out_start_s < out_lim), lit_len_s, 0)
        + jnp.where(match_ok, mlen_s, 0), axis=1)

    # hardened-decoder invariants (see docstring): literal runs in input,
    # non-final sequences carry valid matches, input fully consumed
    end_s = jnp.where(valid_seq, tok_c + hdr_s + lit_len_s, 0)
    consumed = jnp.max(end_s, axis=1)
    is_last = jnp.arange(S_cap, dtype=jnp.int32)[None, :] \
        == (n_seqs[:, None] - 1)
    has_match = valid_seq & ~is_last
    needed = jnp.sum(jnp.where(valid_seq, lit_len_s, 0)
                     + jnp.where(has_match, mlen_s, 0), axis=1)
    lit_in = ~valid_seq | (lit_src_s + lit_len_s <= comp_len[:, None])
    m_valid = ~has_match | ((off_s > 0)
                            & (match_dst_s - off_s >= ref_floor))
    strict = jnp.all(lit_in & m_valid, axis=1) \
        & (consumed == comp_len) & (n_seqs > 0)
    if upto == 5:
        return _chk(off_s, out_start_s, lit_src_s, match_ok, lit_ok,
                    total_out, n_seqs, strict, consumed, needed)

    # P4 — piecewise-constant per-byte payload via jump scatter
    E = 2 * S_cap
    ev_pos = jnp.stack([out_start_s, match_dst_s], -1).reshape(B, E)
    ev_ok = jnp.stack([lit_ok, match_ok], -1).reshape(B, E)
    dlit = jnp.stack([lit_src_s - out_start_s + BIASD,
                      jnp.zeros_like(off_s)], -1).reshape(B, E)
    offp = jnp.stack([jnp.zeros_like(off_s), off_s], -1).reshape(B, E)
    payload = jnp.where((jnp.arange(E) % 2)[None, :] == 0,
                        FLAGL | jnp.clip(dlit, 0, MASKP), offp)
    n_ev = jnp.sum(ev_ok, axis=1)

    pos_key = jnp.where(ev_ok, ev_pos, jnp.int32(Dt))
    pos_sorted, payload_sorted = jax.lax.sort(
        (pos_key, payload), dimension=-1, num_keys=1)
    pos_sorted = pos_sorted[:, :E_cap]
    payload_sorted = payload_sorted[:, :E_cap]
    ev_live = pos_sorted < Dt
    prev = jnp.concatenate(
        [jnp.zeros_like(payload_sorted[:, :1]), payload_sorted[:, :-1]], axis=1)
    jump = jnp.where(ev_live, payload_sorted - prev, 0)

    pos_c = jnp.clip(pos_sorted, 0, Dt - 1)
    ind = scatter_add_planes(pos_c, ev_live.astype(jnp.int32), Dt, bits=8)
    sj = scatter_add_planes(pos_c, jnp.where(ev_live, jump + BIASJ, 0),
                            Dt, bits=22)
    payload_o = jnp.cumsum(sj - BIASJ * ind, axis=1)
    ev_start_o = jax.lax.cummax(jnp.where(ind > 0, o[None, :], 0), axis=1)
    if upto == 6:
        return _chk(payload_o, ev_start_o, n_ev)

    # P5 — wavefront resolution
    is_lit_o = (payload_o & FLAGL) != 0
    dlit_o = (payload_o & MASKP) - BIASD
    off_o = payload_o & M17
    comp_idx = jnp.clip(o[None, :] + dlit_o, 0, C - 1)
    # monotone in o but advancing at the block's compression ratio,
    # which a static band cannot track; one full 1-plane gather is
    # ~1 ms/MB and always exact.
    cp, csp = plane_split([(comp, 8)])
    vals0 = plane_join(full_gather(cp, comp_idx), csp)[0]

    phase = o[None, :] - ev_start_o
    ovl = (~is_lit_o) & (off_o > 0) & (phase >= off_o)
    msrc = jnp.where(ovl,
                     ev_start_o - off_o + jax.lax.rem(
                         phase, jnp.maximum(off_o, 1)),
                     o[None, :] - off_o)
    msrc = jnp.clip(msrc, 0, Dt - 1)
    T0 = jnp.where(is_lit_o, VFLAG | (vals0 & 0xFF),
                   jnp.where(off_o > 0, msrc, VFLAG))
    if upto == 7:
        return _chk(T0)

    if P:
        out = jnp.concatenate([pre, jnp.zeros((B, D), jnp.int32)], axis=1)
    else:
        out = jnp.zeros((B, D), jnp.int32)
    k = jnp.arange(CH, dtype=jnp.int32)
    for j in range(P // CH, Dt // CH):
        lo = j * CH
        t0 = jax.lax.slice_in_dim(T0, lo, lo + CH, axis=1)

        # in-chunk nesting: pointer-jump on 13-bit local ordinals (2
        # planes); terminals are natural fixed points, so no flag bits
        # travel through the doubling rounds
        pend0 = (t0 < VFLAG) & (t0 >= lo)
        n = jnp.where(pend0, jnp.clip(t0 - lo, 0, CH - 1), k[None, :])

        def jump(n):
            pp, sp = plane_split([(n, 13)])
            return plane_join(full_gather(pp, n), sp)[0]

        n2 = jump(jump(n))

        def cond(state):
            n, n2, r = state
            return jnp.any(n2 != n) & (r < 16)

        def body(state):
            _, n, r = state
            return n, jump(n), r + 1

        _, n, _ = jax.lax.while_loop(cond, body, (n, n2, jnp.int32(0)))

        # one state resolve at the terminal ordinal
        tp, tsp = plane_split([(t0, 20)])
        t = plane_join(full_gather(tp, n), tsp)[0]

        if lo == 0:
            cv = jnp.zeros((B, CH), jnp.int32)
        else:
            tblp, tsp2 = plane_split([(jax.lax.slice_in_dim(
                out, 0, lo, axis=1), 8)])
            cv = plane_join(full_gather(tblp, jnp.clip(t, 0, lo - 1)),
                            tsp2)[0]
        res = jnp.where(t >= VFLAG, t - VFLAG, cv) & 0xFF
        out = jax.lax.dynamic_update_slice_in_dim(out, res, lo, axis=1)

    if P:
        out = jax.lax.slice_in_dim(out, P, Dt, axis=1)
    out = out * (jnp.arange(D, dtype=jnp.int32)[None, :] < out_len[:, None])
    ok = (n_seqs <= S_cap) & (n_ev <= E_cap) & (ovf1 == 0)
    return out, total_out, ok, strict, consumed, needed


def _use_fused() -> bool:
    """Fused-Pallas gathers on real TPU; jnp/XLA path elsewhere (the CPU
    test suite runs the jnp path fast, plus interpret-mode fused tests).
    Override with LZ4NET_FUSED=0/1."""
    import os
    v = os.environ.get("LZ4NET_FUSED")
    if v is not None:
        return v == "1"
    from ..models.tpu import probe_tpu_devices
    return probe_tpu_devices()


class VectorDecoder:
    """Host wrapper mirroring PallasDecoder's interface.

    Decoding is two-pass on device: a sparse-caps kernel serves typical
    blocks; blocks denser than the caps (flagged ``ok=False``) are
    re-dispatched to a dense-caps variant whose sequence/event caps are
    the format's hard bounds (a sequence is >= 3 compressed bytes, and
    each contributes at most 2 events).  Only band-fallback overflow or
    genuine corruption reaches the CPU oracle.
    """

    MAX_BLOCK = 96 * 1024

    def decode_batch(self, blocks, out_lens, dictionary=None):
        n = len(blocks)
        if n == 0:
            return []
        small = [i for i in range(n)
                 if len(blocks[i]) <= self.MAX_BLOCK
                 and out_lens[i] <= self.MAX_BLOCK]
        big = [i for i in range(n) if i not in set(small)]

        results = [None] * n
        if small:
            sub = [blocks[i] for i in small]
            sub_lens = [out_lens[i] for i in small]
            sub_res = [None] * len(small)
            retry = self._device_pass(sub, sub_lens, range(len(small)),
                                      sub_res, dense=False,
                                      dictionary=dictionary)
            if retry:
                retry = self._device_pass(sub, sub_lens, retry, sub_res,
                                          dense=True,
                                          dictionary=dictionary)
            for b in retry:
                sub_res[b] = self._host_decode(sub[b], sub_lens[b],
                                               dictionary)
            for i, r in zip(small, sub_res):
                results[i] = r
        if big:
            self._decode_big_many(
                [blocks[i] for i in big], [out_lens[i] for i in big],
                big, results, dictionary)
        return results

    def _decode_big(self, block, out_len, dictionary=None):
        """Decode one block beyond the kernel cap (see
        ``_decode_big_many``)."""
        results = [None]
        self._decode_big_many([block], [out_len], [0], results,
                              dictionary)
        return results[0]

    def _decode_big_many(self, blocks, out_lens, dest_idx, results,
                         dictionary=None):
        """Decode blocks beyond the kernel cap as sequences of <= 96 KB
        fragments, each resolved against the previous 64 KB of its own
        output through the prefix-window path (ops/bigblock.py); the
        reference block API takes up to ~1.9 GB (`original/lz4.h:70`).

        Fragment waves are batched ACROSS blocks: wave w dispatches
        fragment w of every block in ONE kernel call with per-block
        prefix windows (their windows are independent — each is the
        block's own already-resolved bytes), so the reference-default
        1 MB stream chunking (`src/LZ4/LZ4Stream.cs:119`) pays ~16
        sequential dispatches per BATCH of blocks, not per block."""
        from .bigblock import WINDOW, split_fragments
        head = bytes(dictionary)[-WINDOW:] if dictionary else b""
        frag_lists = {}
        outs = {}
        for j, (block, out_len) in enumerate(zip(blocks, out_lens)):
            frags = split_fragments(block, out_len)
            if frags is None:
                results[dest_idx[j]] = self._host_decode(
                    block, out_len, dictionary)
            else:
                frag_lists[j] = frags
                outs[j] = bytearray()
        max_waves = max((len(f) for f in frag_lists.values()),
                        default=0)
        for w in range(max_waves):
            live = [j for j in frag_lists if w < len(frag_lists[j])]
            fr = [frag_lists[j][w][0] for j in live]
            spans = [frag_lists[j][w][2] for j in live]
            windows = []
            for j in live:
                o0 = frag_lists[j][w][1]
                windows.append((head + bytes(outs[j]))[-WINDOW:]
                               if o0 < WINDOW
                               else bytes(outs[j][o0 - WINDOW:o0]))
            pieces = [None] * len(live)
            retry = self._device_pass(fr, spans, range(len(live)),
                                      pieces, dense=False,
                                      dictionary=windows)
            if retry:
                retry = self._device_pass(fr, spans, retry, pieces,
                                          dense=True,
                                          dictionary=windows)
            for k in retry:
                from ..models import native
                pieces[k] = native.decompress_fragment(
                    fr[k], windows[k], spans[k])
            for k, j in enumerate(live):
                outs[j] += pieces[k]
        for j in frag_lists:
            results[dest_idx[j]] = bytes(outs[j])

    def decode_batch_unknown(self, blocks, max_out_lens):
        """Unknown-output-length decode on device.

        The kernel's ``strict``/``consumed``/``needed`` outputs certify
        the hardened-decoder invariants (`Safe64.Dirty.cs:665-798`);
        any block the device cannot certify is re-decoded by the host
        hardened decoder, which either succeeds (device caps exceeded)
        or raises the reference's error for genuinely malformed input.
        """
        n = len(blocks)
        if n == 0:
            return []
        results = [None] * n
        device = [b for b in range(n)
                  if 0 < len(blocks[b]) <= 96 * 1024
                  and max_out_lens[b] <= 96 * 1024]
        if device:
            idxs = device
            max_c = max(len(blocks[b]) for b in idxs)
            max_d = max(max(max_out_lens[b] for b in idxs), 1)
            C = _cdiv(max_c + 1, BCH) * BCH
            D = _cdiv(max_d + 1, CH) * CH
            S_cap = _cdiv(C // 3 + 2, LANE) * LANE   # hard format bound
            E_cap = 2 * S_cap
            comp = np.zeros((len(idxs), C), np.uint8)
            for i, b in enumerate(idxs):
                comp[i, :len(blocks[b])] = np.frombuffer(
                    blocks[b], np.uint8)
            comp_len = np.array([len(blocks[b]) for b in idxs], np.int32)
            out_len = np.array([max_out_lens[b] for b in idxs], np.int32)
            out, total, ok, strict, consumed, needed = \
                decode_batch_vectorized(
                    jnp.asarray(comp).astype(jnp.int32),
                    jnp.asarray(comp_len),
                    jnp.asarray(out_len), C, D, S_cap, E_cap, 8192,
                    fused=_use_fused(), w_seq=64)
            # fetch bytes, not words: host link is ~20 MB/s
            out = np.asarray(out.astype(jnp.uint8))
            total, ok = np.asarray(total), np.asarray(ok)
            strict, needed = np.asarray(strict), np.asarray(needed)
            for i, b in enumerate(idxs):
                if (bool(ok[i]) and bool(strict[i])
                        and int(needed[i]) == int(total[i])
                        and int(needed[i]) <= max_out_lens[b]):
                    results[b] = out[i, :int(needed[i])] \
                        .astype(np.uint8).tobytes()
        for b in range(n):
            if results[b] is None:
                results[b] = self._host_decode_unknown(
                    blocks[b], max_out_lens[b])
        return results

    def _device_pass(self, blocks, out_lens, index_set, results, dense,
                     dictionary=None):
        """Run one kernel dispatch over ``index_set``; fill ``results``;
        return the indices that still need a denser pass."""
        idxs = list(index_set)
        max_c = max(max(len(blocks[b]) for b in idxs), 16)
        max_d = max(max(out_lens[b] for b in idxs), 1)
        C = _cdiv(max_c + 1, BCH) * BCH
        D = _cdiv(max_d + 1, CH) * CH
        if dense:
            S_cap = _cdiv(C // 3 + 2, LANE) * LANE   # hard format bound
            k2 = 8192
        else:
            S_cap = _cdiv(C // 5 + 2, LANE) * LANE
            k2 = 2048
        E_cap = 2 * S_cap

        # ship bytes, widen on device: the host link is ~20 MB/s and
        # int32 rows are 4x the wire bytes
        comp = np.zeros((len(idxs), C), np.uint8)
        for i, b in enumerate(idxs):
            comp[i, :len(blocks[b])] = np.frombuffer(blocks[b], np.uint8)
        comp_len = np.array([len(blocks[b]) for b in idxs], np.int32)
        out_len = np.array([out_lens[b] for b in idxs], np.int32)

        pre = pre_len = None
        if dictionary:
            # one shared window (bytes) or one window per batch row
            # (list aligned with index_set — the big-block fragment
            # waves give every block its own resolved prefix)
            if isinstance(dictionary, (bytes, bytearray, memoryview)):
                windows = [bytes(dictionary)] * len(idxs)
            else:
                windows = [bytes(w or b"") for w in dictionary]
            windows = [w[-MAX_DISTANCE_WINDOW:] for w in windows]
            P = _cdiv(max(max(len(w) for w in windows), 1), CH) * CH
            prows = np.zeros((len(idxs), P), np.uint8)
            for i, w in enumerate(windows):
                if w:
                    prows[i, P - len(w):] = np.frombuffer(w, np.uint8)
            pre = jnp.asarray(prows).astype(jnp.int32)
            pre_len = jnp.asarray(np.array(
                [len(w) for w in windows], np.int32))

        out, total, ok, strict, _consumed, needed = \
            decode_batch_vectorized(
                jnp.asarray(comp).astype(jnp.int32),
                jnp.asarray(comp_len),
                jnp.asarray(out_len), C, D, S_cap, E_cap, k2,
                pre=pre, pre_len=pre_len,
                fused=_use_fused(), w_seq=64 if dense else 16)
        # fetch bytes, not words: host link is ~20 MB/s
        out = np.asarray(out.astype(jnp.uint8))
        total = np.asarray(total)
        ok = np.asarray(ok)
        strict, needed = np.asarray(strict), np.asarray(needed)
        retry = []
        # Accept device output only under full strict certification (the
        # hardened-decoder invariants + exact length match).  The
        # reference's known-length decode also enforces consume-all-input
        # (`Decode64` throws unless bytes-read == inputLength,
        # `LZ4Codec.Safe.cs:522-551`), so anything weaker could accept a
        # stream the CPU engines reject; uncertified blocks fall back to
        # the host hardened decoder which raises the reference's errors.
        for i, b in enumerate(idxs):
            if (not bool(ok[i]) or int(total[i]) != out_lens[b]
                    or not bool(strict[i]) or int(needed[i]) != out_lens[b]):
                retry.append(b)
            else:
                results[b] = out[i, :out_lens[b]].astype(np.uint8).tobytes()
        return retry

    @staticmethod
    def _host_decode(block, out_len, dictionary=None):
        from ..models import native
        from ..models import reference
        eng = native if native.is_available() else reference
        if dictionary:
            return eng.decompress_block_dict(block, dictionary, out_len)
        return eng.decompress_block(block, out_len)

    @staticmethod
    def _host_decode_unknown(block, max_out_len):
        from ..models import native
        from ..models import reference
        eng = native if native.is_available() else reference
        return eng.decompress_block_unknown(block, max_out_len)
