"""Sequence-records → per-byte-state megakernel.

Replaces decode_vector's P3/P4 stages (token compaction by sort,
per-sequence field gathers, event sort, MXU scatters, Dt-length cumsums
— ~5 ms per 16×64 KB batch as separate XLA ops) with ONE VMEM-resident
Pallas kernel per block built on three observations:

1.  ``estart[q] = P + cumsum(adv)[q] - adv[q]`` (adv = lit_len+mlen at
    token starts, 0 elsewhere) is monotone over the WHOLE comp domain:
    unmarked positions carry the *next* event's output start.  The
    governing sequence of output byte ``o`` is therefore the last
    position q with key ``2*estart[q] + mark[q] <= 2*o + 1`` — the tie
    term lands ties exactly on the marked position.  No compaction, no
    sort, no scatter: a windowed binary search per byte.
2.  128 output bytes are governed by sequences spanning < 768 comp
    bytes (each sequence emits >= 4 bytes and parses >= 3 + its literal
    bytes), so a 6-row source window per dest row is always sufficient;
    windows are fetched with one small row-one-hot matmul per 8 KB dest
    chunk.
3.  The remaining per-sequence fields (hdr, lit_src, match_dst) are
    arithmetic in the window values; only the 16-bit match offset needs
    a gather at mpos = q+hdr+lit_len, served by a 32-row diagonal
    window with a 128-row retry pass that runs only when a real token
    missed (pl.when), and a block miss flag -> host oracle beyond that.

Outputs per block: ``t0m`` (match-resolution state: msrc with RLE
overlap collapsed analytically, or VFLAG terminals), ``cidx`` (literal
comp source index, -1 on non-literal bytes), and the stats vector
(n_seqs, total_out, strict, consumed, needed, miss) implementing the
hardened-decoder certification of `Safe64.Dirty.cs:665-798`.

Reference semantics: the sequence loop of `LZ4_uncompress`
(`/root/reference/src/LZ4ps/LZ4Codec.Safe64.Dirty.cs:533-659`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
VFLAG = 1 << 19
# Source-row window per dest row.  Worst-case bound: map_lo anchors on
# the dest row's FIRST byte, so the window must cover every sequence
# governing its 128 bytes: each sequence emits >= 4 output bytes and
# occupies >= 3 comp bytes, so 128 output bytes span <= 32 sequences
# <= 32 * (3 + lit) comp bytes; with the <= 15-byte average literal run
# the bench corpora exhibit that is ~415 B < 5 * 128, plus one row of
# anchor slack = 6 rows.  A window miss is NOT silent: every ungoverned
# byte increments cover_miss (kernel body) -> ok=False -> host oracle.
W = 6
DCH = 64            # dest rows per fetch chunk (8 KB of output)
OFF_W1 = 8          # narrow diagonal window for the offset gather


def _cdiv(a, b):
    return -(-a // b)


def _interpret() -> bool:
    d = jax.devices()[0]
    return not ("TPU" in d.device_kind.upper() or d.platform == "tpu")


def _take_lane(src, idx):
    return jnp.take_along_axis(src, idx & (LANE - 1), axis=-1)


def _shift_rows(tbl, shift):
    """Rows shifted so row r holds tbl[r + shift] (zero fill; |shift|
    may exceed the row count)."""
    R = tbl.shape[0]
    if shift == 0:
        return tbl
    if abs(shift) >= R:
        return jnp.zeros((R, LANE), jnp.int32)
    if shift > 0:
        return jnp.concatenate(
            [tbl[shift:], jnp.zeros((shift, LANE), jnp.int32)], axis=0)
    return jnp.concatenate(
        [jnp.zeros((-shift, LANE), jnp.int32), tbl[:shift]], axis=0)


def _scan1d(x, op, identity):
    """Inclusive scan over the flattened [R, 128] row-major domain."""
    R, L = x.shape
    y = x
    s = 1
    while s < L:
        pad = jnp.full((R, s), identity, x.dtype)
        y = op(jnp.concatenate([pad, y[:, :-s]], axis=1), y)
        s *= 2
    # row-carry phase in full-lane layout: Mosaic rejects sublane
    # concatenation of [R, 1] column vectors (offset-mismatch bug)
    c = jnp.broadcast_to(y[:, L - 1:L], (R, L))
    s = 1
    while s < R:
        pad = jnp.full((s, L), identity, x.dtype)
        c = op(jnp.concatenate([pad, c[:-s]], axis=0), c)
        s *= 2
    carry = jnp.concatenate(
        [jnp.full((1, L), identity, x.dtype), c[:-1]], axis=0)
    return op(carry, y)


def _gather_full_into(out_ref, keep, keep_vals, tbl, idx, planes,
                      sub=2048):
    """Exact full-range gather written straight into ``out_ref``:
    out[q] = keep[q] ? keep_vals[q] : tbl[idx[q]].  Subchunk results go
    to the ref immediately — accumulating them for a final concatenate
    keeps every subchunk's one-hot live on Mosaic's scoped stack and
    blows the VMEM budget."""
    R = tbl.shape[0]
    KR = idx.shape[0]
    pls = [((tbl >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
           for p in range(planes)]
    srows = max(1, min(sub // LANE, KR))
    for c in range(_cdiv(KR, srows)):
        lo = c * srows
        cr = min(srows, KR - lo)
        part = idx[lo:lo + cr]
        row = jnp.clip(part >> 7, 0, R - 1)
        oh = (row[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, (cr, LANE, R), 2)).astype(jnp.bfloat16)
        oh = oh.reshape(cr * LANE, R)
        lane = jnp.broadcast_to((part & (LANE - 1))[..., None],
                                (cr, LANE, LANE)).reshape(cr * LANE, LANE)
        acc = None
        for p, tp in enumerate(pls):
            rows = jax.lax.dot_general(
                oh, tp, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32)
            v = _take_lane(rows, lane).reshape(cr, LANE, LANE)[:, :, 0]
            acc = v if p == 0 else acc | (v << (8 * p))
        out_ref[lo:lo + cr, :] = jnp.where(
            keep[lo:lo + cr], keep_vals[lo:lo + cr], acc)


def _diag_window(tbl, idx, back_rows, w_rows):
    """vals/in_band for idx within [row(q)-back, +w) of q's own row."""
    r = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
    delta = (idx >> 7) - r + back_rows
    acc = jnp.zeros_like(idx)
    for d in range(w_rows):
        cand = _take_lane(_shift_rows(tbl, d - back_rows), idx)
        acc = jnp.where(delta == d, cand, acc)
    return acc, (delta >= 0) & (delta < w_rows)


def _records_kernel(C, Dt, P, statics, *refs):
    (comp_ref, mark_ref, ll_ref, ml_ref, cl_ref, ol_ref, pl_ref,
     t0m_ref, cidx_ref, stats_ref, off_scr, base_scr) = refs
    Cr, DtR = C // LANE, Dt // LANE
    CrP = statics["CrP"]                       # lane-padded Cr

    b = pl.program_id(0)
    comp = comp_ref[0]
    mark = mark_ref[0]
    ll = jnp.clip(ll_ref[0], 0, Dt)
    ml = jnp.clip(ml_ref[0], 0, Dt)
    # scalar blocks are whole-array SMEM (per-step (1,1) SMEM blocks are
    # rejected by the TPU lowering); index by grid position
    comp_len = cl_ref[b, 0]
    out_lim = P + ol_ref[b, 0]
    ref_floor = P - pl_ref[b, 0]

    q = jax.lax.broadcasted_iota(jnp.int32, (Cr, LANE), 0) * LANE + \
        jax.lax.broadcasted_iota(jnp.int32, (Cr, LANE), 1)

    lit_nib = comp >> 4
    hdr = 1 + jnp.where((lit_nib == 15) & (mark == 1),
                        1 + jnp.maximum(ll - 15, 0) // 255,
                        0)
    adv = mark * (ll + ml)
    S = _scan1d(adv, jnp.add, 0)
    estart = P + S - adv                       # monotone over all q
    rank = _scan1d(mark, jnp.add, 0)
    n_seqs = rank[Cr - 1, LANE - 1]

    # match offset at mpos: narrow diagonal window (covers literal runs
    # < ~900 B), with an exact full-range one-hot gather retry that only
    # runs when a real token missed (long in-block literal runs).  The
    # full gather is exact for any distance, so no far-miss flag exists.
    nxt = jnp.concatenate([comp[:, 1:], _shift_rows(comp, 1)[:, :1]],
                          axis=1)
    off16 = comp | (nxt << 8)
    mpos = jnp.clip(q + hdr + ll, 0, C - 2)
    offv, band1 = _diag_window(off16, mpos, 0, OFF_W1)
    miss1 = (mark == 1) & ~band1
    off_scr[:, :] = jnp.where(band1, offv, 0)
    n_miss1 = jnp.sum(miss1.astype(jnp.int32))

    @pl.when(n_miss1 > 0)
    def _():
        _gather_full_into(off_scr, band1, offv, off16, mpos, 2)

    off = off_scr[:, :]
    miss = jnp.int32(0) > 0                    # folded with cover below

    match_dst = estart + ll
    lok = (mark == 1) & (ll > 0) & (estart < out_lim)
    mok = (mark == 1) & (match_dst < out_lim) & (off > 0) \
        & (match_dst - off >= ref_floor)

    # ---- hardened-decoder certification (Safe64.Dirty.cs:665-798) ----
    end_s = jnp.where(mark == 1, q + hdr + ll, 0)
    consumed = jnp.max(end_s)
    has_match = (mark == 1) & (rank < n_seqs)
    needed = jnp.sum(jnp.where(mark == 1, ll, 0)
                     + jnp.where(has_match, ml, 0))
    total_out = jnp.sum(
        jnp.where((mark == 1) & (estart < out_lim), ll, 0)
        + jnp.where(mok, ml, 0))
    lit_in = jnp.all((mark == 0) | (q + hdr + ll <= comp_len))
    m_valid = jnp.all(~has_match | ((off > 0)
                                    & (match_dst - off >= ref_floor)))
    strict = lit_in & m_valid & (consumed == comp_len) & (n_seqs > 0)

    # ---- per-byte governing-sequence search --------------------------
    # Every comp position carries its governing sequence's fields via a
    # last-event fill-forward (+1 biased so 0 means "no event yet"):
    # a multi-KB literal run would otherwise separate the token's row
    # from the next token's row and fall outside any bounded window.
    def fill(x):
        return _scan1d(x, lambda a, c: jnp.where(c != 0, c, a), 0)

    key = fill(jnp.where(mark == 1, estart + 1, 0))      # pstart+1
    packed = jnp.clip(ll, 0, (1 << 17) - 1) \
        | (lok.astype(jnp.int32) << 17) | (mok.astype(jnp.int32) << 18)
    packed_f = fill(jnp.where(mark == 1, packed + 1, 0))
    off_f = fill(jnp.where(mark == 1, off + 1, 0))
    qmark_f = fill(jnp.where(mark == 1, q + 1, 0))
    fetch_fields = [(key, 3), (packed_f, 3), (off_f, 3), (qmark_f, 3)]
    first_key = key[:, :1]                               # [Cr, 1]

    # map_hi[d] = last source row whose first key <= key(last byte of d).
    # first_key is a [Cr, 1] column; move it into lanes with an identity
    # matmul (Mosaic has no dynamic_update_slice / cheap 2-D transpose).
    # The transpose MUST be plane-decomposed: keys reach 2^18 and an
    # f32 x f32 MXU matmul at default precision rounds through bf16
    # (8-bit significand), silently landing map_lo on the wrong row on
    # real silicon while interpret mode stays exact (the round-2 decode
    # corruption).  8-bit planes through bf16 are exact.
    ident = (jax.lax.broadcasted_iota(jnp.int32, (Cr, CrP), 0)
             == jax.lax.broadcasted_iota(
                 jnp.int32, (Cr, CrP), 1)).astype(jnp.bfloat16)
    fk = jnp.zeros((1, CrP), jnp.int32)
    for p in range(3):
        fplane = ((first_key >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
        r = jax.lax.dot_general(
            fplane, ident,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        fk = fk | (r << (8 * p))                               # [1, CrP]
    fk = jnp.where(jax.lax.broadcasted_iota(
        jnp.int32, (1, CrP), 1) < Cr, fk, jnp.int32(1 << 30))
    # Anchor on the dest row's FIRST byte: map_lo[d] is then the last
    # follower row of the event governing byte d*128, and every event
    # governing later bytes of the row starts within the next ~4 rows
    # (the sum-of-adv bound).  Anchoring on the last byte instead would
    # overshoot across duplicate-key follower rows of a long literal
    # run (or the padding after comp_len) by an unbounded distance.
    drow = jax.lax.broadcasted_iota(jnp.int32, (DtR, 1), 0)
    thresh = drow * LANE + 1
    map_lo = jnp.sum((fk <= thresh).astype(jnp.int32), axis=1,
                     keepdims=True) - 1                    # [DtR, 1]
    base = jnp.clip(map_lo, 0, Cr - 1)                     # [DtR, 1]

    # stage `base` through scratch so the fori_loop body can slice it
    # dynamically (Mosaic has no dynamic_slice on values, only on refs);
    # an unrolled chunk loop would blow the compile time ~9x
    base_scr[:, :] = jnp.broadcast_to(base, (DtR, LANE))

    def chunk_body(c, cover_miss):
        dlo = c * DCH
        bs = base_scr[pl.ds(dlo, DCH), :][:, :1]           # [DCH, 1]
        o = dlo * LANE \
            + jax.lax.broadcasted_iota(jnp.int32, (DCH, LANE), 0) * LANE \
            + jax.lax.broadcasted_iota(jnp.int32, (DCH, LANE), 1)

        # fetch W source rows per dest row: one one-hot matmul
        wsel = jnp.clip(bs + jax.lax.broadcasted_iota(
            jnp.int32, (DCH, W), 1), 0, Cr - 1)
        oh = (wsel[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, (DCH, W, Cr), 2)).astype(jnp.bfloat16)
        oh = oh.reshape(DCH * W, Cr)

        wins = []
        for tbl, planes in fetch_fields:
            winp = None
            for p in range(planes):
                plane = ((tbl >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
                wv = jax.lax.dot_general(
                    oh, plane, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                wv = wv.astype(jnp.int32).reshape(DCH, W, LANE)
                winp = wv if p == 0 else winp | (wv << (8 * p))
            wins.append(winp)
        wkey, wpacked, woff, wqmark = wins

        # hierarchical search: row select (compare per-row first keys),
        # then 7-round binary search within the 128-lane row
        ko = o + 1
        wrow = jnp.zeros((DCH, LANE), jnp.int32)
        for wr in range(1, W):
            wrow = jnp.where(wkey[:, wr, :1] <= ko, wr, wrow)
        # binary search for last lane with key <= ko in the chosen row
        lane = jnp.zeros((DCH, LANE), jnp.int32)
        for stepbit in (64, 32, 16, 8, 4, 2, 1):
            cand = lane + stepbit
            kc = jnp.zeros((DCH, LANE), jnp.int32)
            for wr in range(W):
                kc = jnp.where(wrow == wr,
                               _take_lane(wkey[:, wr, :], cand), kc)
            lane = jnp.where((cand < LANE) & (kc <= ko), cand, lane)

        def pick(win):
            v = jnp.zeros((DCH, LANE), jnp.int32)
            for wr in range(W):
                v = jnp.where(wrow == wr,
                              _take_lane(win[:, wr, :], lane), v)
            return v

        kq = pick(wkey)
        found = (kq > 0) & (kq <= ko)          # any event at or before o
        pq = pick(wpacked) - 1
        offq = pick(woff) - 1
        llq = pq & ((1 << 17) - 1)
        lokq = (pq >> 17) & 1
        mokq = (pq >> 18) & 1
        estq = kq - 1
        absq = pick(wqmark) - 1
        hdrq = 1 + jnp.where(llq >= 15, 1 + (llq - 15) // 255, 0)

        live = found & (pq >= 0) & (absq >= 0)
        in_lit = live & (lokq == 1) & (o < estq + llq)
        mdstq = estq + llq
        in_match = live & ~in_lit & (mokq == 1) & (o >= mdstq)

        cidx = jnp.where(in_lit, absq + hdrq + (o - estq), -1)
        phase = o - mdstq
        ovl = in_match & (phase >= offq)
        msrc = jnp.where(
            ovl, mdstq - offq + jax.lax.rem(phase, jnp.maximum(offq, 1)),
            o - offq)
        t0m = jnp.where(in_match, jnp.clip(msrc, 0, Dt - 1),
                        jnp.int32(VFLAG))

        t0m_ref[0, pl.ds(dlo, DCH), :] = t0m
        cidx_ref[0, pl.ds(dlo, DCH), :] = cidx
        # every in-range output byte of a well-formed block is governed;
        # an ungoverned one means the W-row window failed — host oracle
        return cover_miss + jnp.sum(
            (~live & (o >= P) & (o < out_lim)).astype(jnp.int32))

    cover_miss = jax.lax.fori_loop(0, DtR // DCH, chunk_body,
                                   jnp.int32(0))

    stats_ref[b, 0] = n_seqs
    stats_ref[b, 1] = total_out
    stats_ref[b, 2] = strict.astype(jnp.int32)
    stats_ref[b, 3] = consumed
    stats_ref[b, 4] = needed
    stats_ref[b, 5] = (miss | (cover_miss > 0)).astype(jnp.int32)
    stats_ref[b, 6] = cover_miss          # diagnostics: ungoverned bytes
    stats_ref[b, 7] = n_miss1             # diagnostics: wide-tier offsets


@functools.partial(jax.jit, static_argnames=("C", "Dt", "P"))
def records_to_state(comp, mark, ll_all, ml_all, comp_len, out_len,
                     pre_len, C: int, Dt: int, P: int = 0):
    """Per-byte decode state from parse marks, one kernel per block.

    comp/mark/ll_all/ml_all: [B, C] int32; comp_len/out_len/pre_len [B].
    Returns (t0m [B, Dt], cidx [B, Dt], stats [B, 8]) with stats rows
    (n_seqs, total_out, strict, consumed, needed, miss, 0, 0).
    """
    B = comp.shape[0]
    Cr, DtR = C // LANE, Dt // LANE
    CrP = _cdiv(Cr, LANE) * LANE
    kern = functools.partial(_records_kernel, C, Dt, P, {"CrP": CrP})
    cspec = pl.BlockSpec((1, Cr, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((B, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM)
    dspec = pl.BlockSpec((1, DtR, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    t0m, cidx, stats = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((B, DtR, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((B, DtR, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((B, 8), jnp.int32)),
        grid=(B,),
        in_specs=[cspec, cspec, cspec, cspec, sspec, sspec, sspec],
        out_specs=(dspec, dspec,
                   pl.BlockSpec((B, 8), lambda b: (0, 0),
                                memory_space=pltpu.SMEM)),
        scratch_shapes=[pltpu.VMEM((Cr, LANE), jnp.int32),
                        pltpu.VMEM((DtR, LANE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(comp.reshape(B, Cr, LANE), mark.reshape(B, Cr, LANE),
      ll_all.reshape(B, Cr, LANE), ml_all.reshape(B, Cr, LANE),
      comp_len.reshape(B, 1), out_len.reshape(B, 1),
      pre_len.reshape(B, 1))
    return t0m.reshape(B, Dt), cidx.reshape(B, Dt), stats
