"""Vectorised LZ4 block decode: no scalar loops, no XLA gathers.

The round-1 Pallas "sequencer" kernel is scalar-throughput-bound (~µs per
sequence on the single TPU scalar unit).  This pipeline restructures the
whole decode into elementwise ops, lane scans, small per-segment one-hot
matmuls, and `mxu_gather`/`scatter_add` — the primitives measured fast on
v5e (ARCHITECTURE.md).  Phases, per batch of independent blocks:

P1  speculative parse    for *every* byte position i, compute the fields a
                         sequence starting at i would have (token nibbles,
                         255-extension sums via a suffix run-length scan,
                         next-token jump g[i]).
P2  chain resolution     (a) per-128-byte-segment "exit" tables by in-
                         segment pointer doubling (7 one-hot rounds);
                         (b) a batched scan over segments threads the real
                         token chain from position 0;
                         (c) in-segment walk marks every real token start.
P3  sequence records     compaction via cumsum + MXU scatter-add; output
                         positions by prefix sums; terminal/junk sequences
                         suppressed by the output-length bound.
P4  event tables         two events (literal run, match) per sequence;
                         per-output-byte event id via scatter-add + cumsum;
                         per-byte (delta, offset, kind) via packed-field
                         MXU gathers; event starts via a lane cummax.
P5  match resolution     overlapping (offset < length) matches collapse
                         analytically (mod arithmetic — no RLE chains);
                         remaining nesting resolves by pointer doubling
                         over packed (resolved-flag | index) words until a
                         fixed point; one final byte gather materialises
                         the output.

Worst-case correctness does not depend on data (the doubling while_loop
runs until every byte is resolved); typical data converges in a few
rounds.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .mxu_gather import gather_bytes, gather_i32, scatter_add

LANE = 128
SEG = 128


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


def _one_hot_f32(idx, depth):
    iota = jax.lax.broadcasted_iota(jnp.int32, idx.shape + (depth,), idx.ndim)
    return (idx[..., None] == iota).astype(jnp.float32)


def _seg_lookup(table3, local):
    """out[b,s,...] = table3[b,s, local[b,s,...]] via one-hot matmul.

    table3: [B, nseg, 128]; local: [B, nseg] or [B, nseg, K]."""
    oh = _one_hot_f32(jnp.clip(local, 0, SEG - 1), SEG)
    if local.ndim == table3.ndim - 1:      # [B, nseg]
        return jnp.einsum("bsl,bsl->bs", oh, table3.astype(jnp.float32),
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
    return jnp.einsum("bsel,bsl->bse", oh, table3.astype(jnp.float32),
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)


def _speculative_parse(comp, C):
    """P1: per-position parse fields.  Returns (g, lit_len, hdr, mpos, mlen)."""
    b = comp
    i = jnp.arange(C, dtype=jnp.int32)
    run255 = _suffix_run255(b)
    lit_nib = b >> 4
    ml_nib = b & 15

    # literal length (+ its 255-extensions)
    k = jnp.concatenate([run255[:, 1:], jnp.zeros_like(run255[:, :1])], axis=1)
    lit_term = gather_bytes(b, jnp.clip(i + 1 + k, 0, C - 1))
    lit_len = jnp.where(lit_nib == 15, 15 + 255 * k + lit_term, lit_nib)
    hdr = 1 + jnp.where(lit_nib == 15, k + 1, 0)

    # match section
    mpos = i + hdr + lit_len                 # offset-bytes position
    mext_at = jnp.clip(mpos + 2, 0, C - 1)
    j = gather_i32(run255, mext_at, bits=24)
    m_term = gather_bytes(b, jnp.clip(mpos + 2 + j, 0, C - 1))
    mlen = 4 + jnp.where(ml_nib == 15, 15 + 255 * j + m_term, ml_nib)
    mext = jnp.where(ml_nib == 15, 1 + j, 0)

    g = mpos + 2 + mext                      # next token start
    g = jnp.clip(g, i + 3, C - 1)            # junk-safe: forward, in-range
    # clip junk positions' fields into the 24-bit range the record gathers
    # carry (values at real token positions are far below these caps)
    lit_len = jnp.clip(lit_len, 0, 1 << 20)
    hdr = jnp.clip(hdr, 0, 1 << 20)
    mpos = jnp.clip(mpos, 0, C)
    mlen = jnp.clip(mlen, 0, 1 << 20)
    return g, lit_len, hdr, mpos, mlen


def _segment_exits(g3, nseg):
    """P2a: H[b,s,e] = first chain position >= end of segment s, starting
    from position 128*s+e, by in-segment pointer doubling."""
    B = g3.shape[0]
    seg_end = ((jnp.arange(nseg, dtype=jnp.int32) + 1) * SEG)[None, :, None]
    seg_start = seg_end - SEG
    H = g3
    for _ in range(7):                       # 2^7 >= max 43 tokens/segment
        in_seg = H < seg_end
        nxt = _seg_lookup(H, H - seg_start)
        H = jnp.where(in_seg, nxt, H)
    return H


def _thread_chain(H3, nseg):
    """P2b: scan over segments; returns entry position per segment
    ([B, nseg], -1 where the chain skips the segment)."""
    B = H3.shape[0]
    xs = jnp.moveaxis(H3, 1, 0)              # [nseg, B, 128]

    def body(v, x):
        s, h = x                             # h: [B, 128]
        seg_start = s * SEG
        in_seg = (v >= seg_start) & (v < seg_start + SEG)
        local = jnp.clip(v - seg_start, 0, SEG - 1)
        oh = _one_hot_f32(local, SEG)
        nxt = jnp.einsum("bl,bl->b", oh, h.astype(jnp.float32),
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST).astype(jnp.int32)
        entry = jnp.where(in_seg, v, -1)
        return jnp.where(in_seg, nxt, v), entry

    v0 = jnp.zeros((B,), jnp.int32)
    _, entries = jax.lax.scan(body, v0,
                              (jnp.arange(nseg, dtype=jnp.int32), xs))
    return jnp.moveaxis(entries, 0, 1)       # [B, nseg]


def _mark_tokens(g3, entries, nseg):
    """P2c: walk the chain inside each segment from its entry, marking real
    token starts.  Returns mask [B, nseg*128]."""
    B = g3.shape[0]
    seg_start = (jnp.arange(nseg, dtype=jnp.int32) * SEG)[None, :]
    seg_end = seg_start + SEG
    pos = entries                            # [B, nseg] absolute, -1 = none
    mark = jnp.zeros((B, nseg, SEG), jnp.int32)
    for _ in range(_cdiv(SEG, 3) + 1):       # max tokens per segment
        valid = (pos >= seg_start) & (pos < seg_end)
        local = jnp.clip(pos - seg_start, 0, SEG - 1)
        mark = mark | (_one_hot_f32(local, SEG).astype(jnp.int32)
                       * valid[..., None])
        nxt = _seg_lookup(g3, local)
        pos = jnp.where(valid, nxt, jnp.int32(1 << 28))
    return mark.reshape(B, nseg * SEG)


@functools.partial(jax.jit, static_argnames=("C", "D", "S_cap"))
def decode_batch_vectorized(comp, comp_len, out_len, C, D, S_cap):
    """Decode a batch of independent known-length blocks.

    comp: [B, C] int32 bytes (zero padded), comp_len/out_len: [B] int32.
    C, D multiples of 128; S_cap >= max sequences per block (C//3+2 always
    suffices).  Returns (out [B, D] int32 bytes, total_out [B] int32).
    """
    B = comp.shape[0]
    nseg = C // SEG
    i = jnp.arange(C, dtype=jnp.int32)
    o = jnp.arange(D, dtype=jnp.int32)

    # P1 — speculative parse
    g, lit_len_all, hdr_all, mpos_all, mlen_all = _speculative_parse(comp, C)

    # P2 — chain resolution
    g3 = g.reshape(B, nseg, SEG)
    H3 = _segment_exits(g3, nseg)
    entries = _thread_chain(H3, nseg)
    mark = _mark_tokens(g3, entries, nseg)
    # positions at/after comp_len are never real tokens
    mark = mark * (i[None, :] < comp_len[:, None])

    # P3 — sequence records
    seq_id = jnp.cumsum(mark, axis=1) - 1            # id at marked positions
    n_seqs = jnp.sum(mark, axis=1)                   # [B]
    tok_pos = scatter_add(jnp.where(mark == 1, seq_id, 0),
                          jnp.where(mark == 1, i[None, :], 0), S_cap)
    t = jnp.arange(S_cap, dtype=jnp.int32)
    valid_seq = t[None, :] < n_seqs[:, None]

    lit_len_s = jnp.clip(gather_i32(lit_len_all, tok_pos, bits=24), 0, D)
    hdr_s = gather_i32(hdr_all, tok_pos, bits=24)
    mpos_s = jnp.clip(gather_i32(mpos_all, tok_pos, bits=24), 0, C - 2)
    mlen_s = jnp.clip(gather_i32(mlen_all, tok_pos, bits=24), 0, D)
    off_s = (gather_bytes(comp, mpos_s)
             | (gather_bytes(comp, mpos_s + 1) << 8))

    adv_s = jnp.where(valid_seq, lit_len_s + mlen_s, 0)
    out_start_s = jnp.cumsum(adv_s, axis=1) - adv_s  # exclusive prefix sum
    match_dst_s = out_start_s + lit_len_s

    # the terminal sequence has no match part; junk/overrun sequences are
    # suppressed the same way: a match only applies if it starts in-range
    match_ok = valid_seq & (match_dst_s < out_len[:, None]) \
        & (off_s > 0) & (match_dst_s - off_s >= 0)
    lit_ok = valid_seq & (lit_len_s > 0) \
        & (out_start_s < out_len[:, None])
    # terminal sequence: its match fields are junk (suppressed by the
    # bounds above); junk sequences marked past the terminal all start at
    # or beyond out_len, so the same bounds drop them
    total_out = jnp.sum(
        jnp.where(valid_seq & (out_start_s < out_len[:, None]),
                  lit_len_s, 0)
        + jnp.where(match_ok, mlen_s, 0), axis=1)

    # P4 — event tables (event 2t = literal run of seq t, 2t+1 = match)
    lit_src_s = tok_pos + hdr_s                      # comp index of literals
    E = 2 * S_cap
    ev_pos = jnp.stack([out_start_s, match_dst_s], axis=-1).reshape(B, E)
    ev_w = jnp.stack([lit_ok, match_ok], axis=-1).reshape(B, E).astype(jnp.int32)
    # delta: for literal bytes  comp_idx = o + (lit_src - out_start)
    #        for match bytes    src_out  = o - offset
    delta_lit = lit_src_s - out_start_s
    delta_match = -off_s
    BIAS = D
    fieldA = jnp.stack([(delta_lit + BIAS) | (1 << 20),
                        (delta_match + BIAS)], axis=-1).reshape(B, E)
    fieldB = jnp.stack([jnp.zeros_like(off_s), off_s], axis=-1).reshape(B, E)

    ev_pos_c = jnp.clip(ev_pos, 0, D - 1)
    indicator = scatter_add(jnp.where(ev_w == 1, ev_pos_c, 0),
                            ev_w, D)
    # ev id per output byte; bytes before the first event cannot exist on
    # valid streams
    ev_of_o = jnp.clip(jnp.cumsum(indicator, axis=1) - 1, 0, E - 1)
    # event start per byte: latest event boundary at or before o
    ev_start_o = jax.lax.cummax(
        jnp.where(indicator > 0, o[None, :], 0), axis=1)

    # map ev ordinal (count order) back to event table index: the events,
    # sorted by position, are exactly the valid events in table order —
    # build the ordinal->table-index map by compacting valid events
    ev_ord = jnp.cumsum(ev_w, axis=1) - 1            # ordinal of each event
    ev_index = scatter_add(jnp.where(ev_w == 1, ev_ord, 0),
                           jnp.where(ev_w == 1,
                                     jnp.arange(E, dtype=jnp.int32)[None, :],
                                     0), E)
    table_idx_o = jnp.clip(gather_i32(ev_index, ev_of_o, bits=24), 0, E - 1)

    A_o = gather_i32(fieldA, table_idx_o, bits=24)
    off_o = gather_i32(fieldB, table_idx_o, bits=24)
    is_lit_o = (A_o >> 20) & 1
    delta_o = (A_o & ((1 << 20) - 1)) - BIAS

    # P5 — resolution
    FLAG = jnp.int32(1 << 20)
    src_o = o[None, :] + delta_o                     # comp idx or out idx
    # analytic overlap collapse: source inside this match's own output
    phase = o[None, :] - ev_start_o
    ovl = (is_lit_o == 0) & (off_o > 0) & (phase >= off_o)
    src_o = jnp.where(ovl,
                      ev_start_o - off_o + jax.lax.rem(phase,
                                                       jnp.maximum(off_o, 1)),
                      src_o)
    T = jnp.where(is_lit_o == 1,
                  FLAG | jnp.clip(src_o, 0, C - 1),
                  jnp.clip(src_o, 0, D - 1))

    # pointer doubling until every in-range byte carries a comp index; the
    # round cap guarantees termination on malformed input (cycles), where
    # the host-level length/status validation rejects the block
    max_rounds = int(np.ceil(np.log2(max(D, 2)))) + 2

    def unresolved(state):
        T, r = state
        live = (o[None, :] < out_len[:, None]) & ((T & FLAG) == 0)
        return jnp.any(live) & (r < max_rounds)

    def round_(state):
        T, r = state
        ptr = jnp.clip(T & (FLAG - 1), 0, D - 1)
        tgt = gather_i32(T, ptr, bits=24)
        return jnp.where((T & FLAG) == 0, tgt, T), r + 1

    T, _ = jax.lax.while_loop(unresolved, round_, (T, jnp.int32(0)))

    comp_idx = jnp.clip(T & (FLAG - 1), 0, C - 1)
    out = gather_bytes(comp, comp_idx)
    out = out * (o[None, :] < out_len[:, None])
    return out, total_out


class VectorDecoder:
    """Host wrapper mirroring PallasDecoder's interface."""

    def decode_batch(self, blocks, out_lens):
        from ..models.reference import CorruptedBlockError
        n = len(blocks)
        if n == 0:
            return []
        max_c = max(max(len(b) for b in blocks), 16)
        max_d = max(max(out_lens), 1)
        C = _cdiv(max_c + 1, LANE) * LANE
        D = _cdiv(max_d + 1, LANE) * LANE
        S_cap = _cdiv(C // 3 + 2, LANE) * LANE

        comp = np.zeros((n, C), np.int32)
        for i, b in enumerate(blocks):
            comp[i, :len(b)] = np.frombuffer(b, np.uint8)
        comp_len = np.array([len(b) for b in blocks], np.int32)
        out_len = np.array(out_lens, np.int32)

        out, total = decode_batch_vectorized(
            jnp.asarray(comp), jnp.asarray(comp_len), jnp.asarray(out_len),
            C, D, S_cap)
        out = np.asarray(out)
        total = np.asarray(total)
        results = []
        for b in range(n):
            if int(total[b]) != out_lens[b]:
                raise CorruptedBlockError(
                    f"vector decode length mismatch on block {b}: "
                    f"{int(total[b])} != {out_lens[b]}")
            results.append(out[b, :out_lens[b]].astype(np.uint8).tobytes())
        return results
