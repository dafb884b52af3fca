"""Greedy-parse + sequence-records megakernel (encode E3 + E4).

From per-position (matched, off, mlen) to the compacted, merged,
emission-ready sequence records in ONE Pallas kernel per block.  The
XLA formulation spends ~17 ms/MB across ~50 ops (next-match cummin, a
full-domain gather for the parse chain, the chain-threading kernel
round trip, three `lax.sort` compactions, a dozen small gathers for
fields / catch-up / merge — PROFILE_r04.md); here everything stays in
VMEM:

E3a  next-match table      suffix-min scan.
E3b  parse chain g         ``nm[i + step]`` via a FORWARD staircase
                           select-loop gather (targets never look
                           back, so destination chunk c only reads
                           source segments >= c).
E3c  chain threading       the chain kernel's P2 segment-exit
                           doubling, then a TWO-LEVEL P3: supersegment
                           (1024-position) exits by 3 more doubling
                           rounds, a fori carry walk over R/8
                           supersegments (8x fewer sequential steps
                           than the row walk of `chain_kernel.py`),
                           and a vectorised 8-hop in-supersegment walk
                           that recovers per-segment entries for P4's
                           parallel marking.
E4a  token compaction      per-row IN-ROW compaction (a 7-round
                           lane-local binary search over the in-row
                           mark cumsum — all rows at once, ~1 us)
                           turns the global "k-th token" query into
                           row lookup (transposed row-rank binary
                           search) + ONE gather; slots are processed
                           in dynamic 2048-slot chunks bounded by the
                           actual sequence count, not the cap.
E4b  literal runs          slot-shift arithmetic.
E4c  catch-up              backward match extension over the
                           preceding literal run
                           (`Safe64.Dirty.cs:145-149`), u32 gathers in
                           the same dynamic chunks.
E4d  same-offset merge     segmented suffix-min + one slot-domain
                           gather (recovers far-cap truncation).
E4e  merged compaction     the E4a machinery on the slot domain.
E4f  tail + emission prep  LASTLITERALS record, per-record sizes,
                           output-offset scan; outputs are exactly the
                           emit kernel's operands (`emit_kernel.py`).

Bit-exactness contract: identical results to `encode_vector.
_encode_batch_traced`'s E3-E5-prep stages (tests/test_seq_kernel.py in
interpret mode; tools/certify.py on silicon).  Reference semantics:
the sequence loop of `original/lz4.c:345-570` /
`src/LZ4ps/LZ4Codec.Safe64.Dirty.cs:122-277`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MINMATCH, ML_MASK, RUN_MASK
from .emit_kernel import BIGKEY
from .records_kernel import _cdiv, _interpret, _scan1d, _shift_rows, \
    _take_lane
from .mlen_kernel import _bank_take, _gsel_ref, _rscan_min, _tpose_col

LANE = 128
BIG = 1 << 30
DCR = 64          # staircase destination chunk rows
SS = 8            # supersegment = SS rows = 1024 positions
SCH = 16          # slot rows per dynamic chunk (2048 slots)


def _xor_nb_rev(wa, wb):
    """Number of equal HIGH-order bytes of two u32 words (0..4)."""
    diff = jnp.bitwise_xor(wa, wb)
    m = jnp.int32(-16777216)          # 0xFF000000 as int32
    return jnp.where(
        (diff & m) != 0, 0,
        jnp.where((diff & 0xFF0000) != 0, 1,
                  jnp.where((diff & 0xFF00) != 0, 2,
                            jnp.where(diff != 0, 3, 4))))


def _inrow_compact(mask_i32):
    """lane of the (j+1)-th set lane within each row (lane-local):
    out[r, j] = that lane, for j < popcount(row r); garbage above.
    Also returns the in-row inclusive cumsum."""
    R, _ = mask_i32.shape
    c = mask_i32
    s = 1
    while s < LANE:
        c = c + jnp.concatenate(
            [jnp.zeros((R, s), jnp.int32), c[:, :-s]], axis=1)
        s *= 2
    tgt = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1) + 1
    lo = jnp.zeros((R, LANE), jnp.int32)
    for step in (64, 32, 16, 8, 4, 2, 1):
        cand = lo + step
        cv = _take_lane(c, cand - 1)
        lo = jnp.where((cand <= LANE) & (cv < tgt), cand, lo)
    return lo, c


def _slot_shift_right(arr, fill):
    """y[k] = arr[k-1] over the flattened slot domain; y[0] = fill."""
    up = _shift_rows(arr, -1)
    y = jnp.concatenate([up[:, LANE - 1:], arr[:, :LANE - 1]], axis=1)
    first = (jax.lax.broadcasted_iota(jnp.int32, arr.shape, 0) == 0) \
        & (jax.lax.broadcasted_iota(jnp.int32, arr.shape, 1) == 0)
    return jnp.where(first, fill, y)


def thread_entries_two_level(H, g, h2_scr, e2_scr, R):
    """Per-segment chain entries (rows uniform across lanes; -1 where
    the chain skips the segment) with R//SS sequential steps instead of
    the flat walk's R (`chain_kernel.py` P3 / `parse_kernel.py` P3):

    1. supersegment exits H2 by TRUE pointer doubling (H2[H2]) on the
       1024-position supersegment criterion — 3 rounds cover SS rows;
    2. a fori carry walk over the R//SS supersegments (one H2 lookup
       each), recording supersegment entries;
    3. a vectorised SS-hop walk along H inside every supersegment at
       once (each hop lands on the next visited row's entry), spreading
       entries to rows.

    H: post-P2 row-exit table; g: the raw chain (unused here but kept
    for signature clarity with P4, which walks g from these entries).
    h2_scr: [R, LANE] scratch; e2_scr: scratch with >= R//SS rows.
    Requires R % SS == 0."""
    del g
    NS = R // SS
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)
    super_end = ((r_iota >> 3) + 1) * (SS * LANE)

    def at_super(tbl, v):
        """tbl[v] for v within the query row's own supersegment."""
        t3 = tbl.reshape(NS, SS, LANE)
        d_cur = (v >> 7) & (SS - 1)
        acc = jnp.zeros_like(v)
        for dd in range(SS):
            src = jnp.broadcast_to(t3[:, dd, :][:, None, :],
                                   (NS, SS, LANE)).reshape(R, LANE)
            acc = jnp.where(d_cur == dd, _take_lane(src, v), acc)
        return acc

    H2 = H
    for _ in range(3):
        H2 = jnp.where(H2 < super_end, at_super(H2, H2), H2)
    h2_scr[:, :] = H2

    def super_body(s, v):
        h8 = h2_scr[pl.ds(s * SS, SS), :]
        lo = s * SS * LANE
        in_sup = (v >= lo) & (v < lo + SS * LANE)
        d_cur = (v >> 7) & (SS - 1)
        nxt = jnp.zeros_like(v)
        for dd in range(SS):
            nxt = jnp.where(
                d_cur == dd,
                _take_lane(jnp.broadcast_to(h8[dd:dd + 1, :],
                                            (SS, LANE)), v), nxt)
        e2_scr[pl.ds(s, 1), :] = jnp.where(in_sup, v,
                                           jnp.int32(-1))[:1]
        return jnp.where(in_sup, nxt, v)

    jax.lax.fori_loop(0, NS, super_body,
                      jnp.zeros((SS, LANE), jnp.int32))

    h3 = H.reshape(NS, SS, LANE)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (NS, LANE), 0)
    cur = e2_scr[0:NS, :]
    ent = [jnp.full((NS, LANE), -1, jnp.int32) for _ in range(SS)]
    for _hop in range(SS):
        in_sup = (cur >= s_iota * SS * LANE) \
            & (cur < (s_iota + 1) * SS * LANE)
        d_cur = (cur >> 7) & (SS - 1)
        nxt = jnp.zeros_like(cur)
        for dd in range(SS):
            ent[dd] = jnp.where((d_cur == dd) & in_sup & (ent[dd] < 0),
                                cur, ent[dd])
            nxt = jnp.where(d_cur == dd,
                            _take_lane(h3[:, dd, :], cur), nxt)
        cur = jnp.where(in_sup, nxt, cur)
    # interleave entries back: segment S*SS + dd gets ent[dd] row S
    return jnp.stack(ent, axis=1).reshape(R, LANE)


def _seq_kernel(D, S_cap, P, cu_rounds, statics, *refs):
    (u32_ref, matched_ref, off_ref, mlen_ref, ea_ref, pre_ref,
     s0k_ref, litsrc_ref, ll_ref, offk_ref, mlk_ref, stats_ref,
     g_scr, acc_scr, h2_scr, e_scr, rank_scr, inrow_scr,
     tok_scr, offs_scr, mls_scr, litst_scr, litln_scr,
     mtok_scr, mlitst_scr, mlitln_scr, moff_scr, mml_scr,
     rank2_scr, inrow2_scr) = refs
    R = D // LANE
    RP = statics["RP"]
    SRK = statics["SRK"]              # padded slot rows (64-multiple)
    SRKP = statics["SRKP"]
    b = pl.program_id(0)
    end_abs = ea_ref[b, 0]
    pre_len = pre_ref[b, 0]

    # tools/probe_seq.py: cumulative early exit after a phase
    # (LZ4NET_SEQ_PROBE=upto:<g|chain|tok|cu|merge|kidx>)
    import os as _os
    _probe = _os.environ.get("LZ4NET_SEQ_PROBE", "")

    def _exit_with(feed):
        s = jnp.sum(feed.astype(jnp.int32)) & 0
        z = jnp.zeros((SRK, LANE), jnp.int32) + s
        s0k_ref[0] = z + jnp.int32(BIGKEY)
        litsrc_ref[0] = z
        ll_ref[0] = z
        offk_ref[0] = z
        mlk_ref[0] = z
        for c in range(8):
            stats_ref[b, c] = s

    matched = matched_ref[0]
    ml_all = jnp.clip(mlen_ref[0], 0, D)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    i_flat = r_iota * LANE + l_iota

    # ---- E3a/E3b: next-match table and the parse chain --------------
    nm = _rscan_min(jnp.where(matched == 1, i_flat, jnp.int32(D)))
    nch = R // DCR

    def g_chunk(c, _):
        mc = matched_ref[0, pl.ds(c * DCR, DCR), :]
        mlc = jnp.clip(mlen_ref[0, pl.ds(c * DCR, DCR), :], 0, D)
        base = c * DCR * LANE
        ic = base + jax.lax.broadcasted_iota(
            jnp.int32, (DCR, LANE), 0) * LANE + jax.lax.broadcasted_iota(
            jnp.int32, (DCR, LANE), 1)
        tgt = jnp.clip(ic + jnp.where(mc == 1, mlc, 1), 0, D - 1)
        rowc = tgt >> 7
        lanec = tgt & (LANE - 1)
        acc_scr[:, :] = jnp.zeros((DCR, LANE), jnp.int32)
        for seg in range(nch):
            @pl.when(seg >= c)
            def _():
                acc = acc_scr[:, :]
                blk = nm[seg * DCR:(seg + 1) * DCR]
                for k in range(DCR):
                    vals = _take_lane(
                        jnp.broadcast_to(blk[k:k + 1, :], lanec.shape),
                        lanec)
                    acc = jnp.where(rowc == seg * DCR + k, vals, acc)
                acc_scr[:, :] = acc
        g_scr[pl.ds(c * DCR, DCR), :] = acc_scr[:, :]
        return 0

    jax.lax.fori_loop(0, nch, g_chunk, 0)
    step_f = jnp.where(matched == 1, ml_all, 1)
    tgtf = i_flat + step_f
    nm_at_end = jnp.where(tgtf >= D, jnp.int32(D), g_scr[:, :])
    g = jnp.where(matched == 1, nm_at_end, nm)
    g = jnp.maximum(g, i_flat + 1)
    if _probe == "upto:g":
        return _exit_with(g)

    # ---- E3c: chain threading (P2 + two-level P3 + P4) --------------
    seg_end = (r_iota + 1) * LANE
    H = jnp.minimum(g, jnp.int32(D))
    for _ in range(6):
        H = jnp.where(H < seg_end, _take_lane(H, H), H)

    e3v = thread_entries_two_level(H, g, h2_scr, e_scr, R)

    seg_start = r_iota * LANE
    pos = e3v
    mark = jnp.zeros((R, LANE), jnp.int32)
    for _ in range(_cdiv(LANE, 3) + 1):
        valid = (pos >= seg_start) & (pos < seg_start + LANE)
        mark = mark | (valid & (l_iota == (pos & (LANE - 1)))
                       ).astype(jnp.int32)
        nxt = _take_lane(g, pos)
        pos = jnp.where(valid, nxt, jnp.int32(BIG))
    mark = mark * matched
    if _probe == "upto:chain":
        return _exit_with(mark)

    # ---- E4a: token compaction ---------------------------------------
    rank = _scan1d(mark, jnp.add, 0)
    rank_scr[:, :] = rank
    n_seqs = rank[R - 1, LANE - 1]
    pos_bits = max((D + 1).bit_length(), 8)
    fk = _tpose_col(rank[:, LANE - 1:LANE], R, RP, pos_bits)
    fk = jnp.where(jax.lax.broadcasted_iota(
        jnp.int32, (1, RP), 1) < R, fk, jnp.int32(BIG))
    inrow, _c = _inrow_compact(mark)
    inrow_scr[:, :] = inrow

    tok_scr[:, :] = jnp.full((SRK, LANE), D, jnp.int32)
    offs_scr[:, :] = jnp.zeros((SRK, LANE), jnp.int32)
    mls_scr[:, :] = jnp.zeros((SRK, LANE), jnp.int32)

    sc_iota = jax.lax.broadcasted_iota(jnp.int32, (SCH, LANE), 0)
    sl_iota = jax.lax.broadcasted_iota(jnp.int32, (SCH, LANE), 1)

    def find_rows(fkv_vec, nbanks, t, rmax):
        """#rows with cumulative rank < t, by binary search."""
        lo = jnp.zeros_like(t)
        stp = 1 << rmax.bit_length()
        while stp:
            cand = lo + stp
            v = _bank_take(fkv_vec, cand - 1, nbanks)
            lo = jnp.where((cand <= rmax) & (v < t), cand, lo)
            stp >>= 1
        return lo

    def tok_chunk(c, _):
        t = c * (SCH * LANE) + sc_iota * LANE + sl_iota + 1
        row_k = find_rows(fk, RP // LANE, t, R)
        dead = (t > n_seqs) | (row_k >= R)
        fkprev = jnp.where(row_k > 0,
                           _bank_take(fk, jnp.maximum(row_k - 1, 0),
                                      RP // LANE), 0)
        j = t - fkprev                      # 1-based index within row
        lane = _gsel_ref(
            lambda lo, n: inrow_scr[pl.ds(lo, n), :],
            jnp.clip(row_k * LANE + j - 1, 0, D - 1), R)
        tok = jnp.where(dead, jnp.int32(D), row_k * LANE + lane)
        tokc = jnp.clip(tok, 0, D - 1)
        off_s = _gsel_ref(lambda lo, n: off_ref[0, pl.ds(lo, n), :],
                          tokc, R)
        ml_s = _gsel_ref(lambda lo, n: mlen_ref[0, pl.ds(lo, n), :],
                         tokc, R)
        tok_scr[pl.ds(c * SCH, SCH), :] = tok
        offs_scr[pl.ds(c * SCH, SCH), :] = jnp.where(dead, 0, off_s)
        mls_scr[pl.ds(c * SCH, SCH), :] = jnp.where(dead, 0, ml_s)
        return 0

    n_tok_chunks = jnp.clip(
        (jnp.minimum(n_seqs, S_cap) + SCH * LANE - 1) // (SCH * LANE),
        0, SRK // SCH)
    jax.lax.fori_loop(0, n_tok_chunks, tok_chunk, 0)
    if _probe == "upto:tok":
        return _exit_with(tok_scr[:, :])

    # ---- E4b: literal runs (slot-domain arithmetic) ------------------
    tok = tok_scr[:, :]
    valid = tok < D
    tok_c = jnp.clip(tok, 0, D - 1)
    off_s = offs_scr[:, :]
    mlen_s = mls_scr[:, :]
    prev_end = _slot_shift_right(tok_c + mlen_s, jnp.int32(P))
    lit_start = jnp.where(valid, prev_end, 0)
    lit_len = jnp.where(valid, tok_c - lit_start, 0)
    litst_scr[:, :] = lit_start
    litln_scr[:, :] = lit_len

    # ---- E4c: catch-up (dynamic chunks; match END unchanged) --------
    floor_abs = P - pre_len

    def cu_chunk(c, _):
        sl = pl.ds(c * SCH, SCH)
        tokk = tok_scr[sl, :]
        vk = tokk < D
        tkc = jnp.clip(tokk, 0, D - 1)
        offk = offs_scr[sl, :]
        mlk = mls_scr[sl, :]
        llk = litln_scr[sl, :]
        cb = jnp.zeros((SCH, LANE), jnp.int32)
        can = (vk & (mlk > 0)).astype(jnp.int32)
        for _r in range(cu_rounds):
            cb_max = jnp.minimum(llk, tkc - offk - floor_abs)
            pa = jnp.clip(tkc - cb - 4, 0, D - 1)
            pb = jnp.clip(tkc - offk - cb - 4, 0, D - 1)
            wa = _gsel_ref(lambda lo, n: u32_ref[0, pl.ds(lo, n), :],
                           pa, R)
            wb = _gsel_ref(lambda lo, n: u32_ref[0, pl.ds(lo, n), :],
                           pb, R)
            nb = jnp.where((can == 1) & (tkc - cb - 4 >= 0)
                           & (tkc - offk - cb - 4 >= 0),
                           _xor_nb_rev(wa, wb), 0)
            cb = jnp.minimum(cb + nb, jnp.maximum(cb_max, 0))
            can = can * (nb == 4).astype(jnp.int32)
        litln_scr[sl, :] = llk - jnp.where(vk, cb, 0)
        mls_scr[sl, :] = mlk + jnp.where(vk, cb, 0)
        return 0

    jax.lax.fori_loop(0, n_tok_chunks, cu_chunk, 0)
    lit_len = litln_scr[:, :]
    mlen_s = mls_scr[:, :]
    if _probe == "upto:cu":
        return _exit_with(lit_len + mlen_s)

    # ---- E4d: contiguous same-offset merge ---------------------------
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (SRK, LANE), 0) * LANE \
        + jax.lax.broadcasted_iota(jnp.int32, (SRK, LANE), 1)
    prev_off = _slot_shift_right(off_s, jnp.int32(0))
    is_start = (~valid) | (k_iota == 0) | (lit_len != 0) \
        | (off_s != prev_off)
    mcum = _scan1d(mlen_s, jnp.add, 0)
    isv = is_start.astype(jnp.int32)
    is_start_next = jnp.concatenate(        # y[k] = is_start[k + 1]
        [isv[:, 1:], _shift_rows(isv, 1)[:, :1]], axis=1)
    # start_next[k] = is_start[k+1] ? k+1 : S_cap (last slot -> S_cap)
    nxt_start = jnp.where(
        (is_start_next == 1) & (k_iota + 1 < SRK * LANE),
        k_iota + 1, jnp.int32(S_cap))
    nxt_start = jnp.where(k_iota + 1 > S_cap, jnp.int32(BIG), nxt_start)
    nxt = _rscan_min(nxt_start)
    last = jnp.clip(nxt - 1, 0, S_cap - 1)
    mcum_last = jnp.zeros((SRK, LANE), jnp.int32)
    mc_scr = rank2_scr                      # reuse before rank2 phase
    mc_scr[:, :] = mcum
    mcum_last = _gsel_ref(lambda lo, n: mc_scr[pl.ds(lo, n), :],
                          last, SRK)
    merged_mlen = mcum_last - (mcum - mlen_s)
    if _probe == "upto:merge":
        return _exit_with(merged_mlen)

    # ---- E4e: compaction of merged records ---------------------------
    keep = (is_start & valid).astype(jnp.int32)
    rank2 = _scan1d(keep, jnp.add, 0)
    rank2_scr[:, :] = rank2
    n_m = rank2[SRK - 1, LANE - 1]
    slot_bits = max((SRK * LANE + 1).bit_length(), 8)
    fk2 = _tpose_col(rank2[:, LANE - 1:LANE], SRK, SRKP, slot_bits)
    fk2 = jnp.where(jax.lax.broadcasted_iota(
        jnp.int32, (1, SRKP), 1) < SRK, fk2, jnp.int32(BIG))
    inrow2, _c2 = _inrow_compact(keep)
    inrow2_scr[:, :] = inrow2
    mtok_scr[:, :] = jnp.full((SRK, LANE), S_cap, jnp.int32)
    mlitst_scr[:, :] = jnp.zeros((SRK, LANE), jnp.int32)
    mlitln_scr[:, :] = jnp.zeros((SRK, LANE), jnp.int32)
    moff_scr[:, :] = jnp.zeros((SRK, LANE), jnp.int32)
    mml_scr[:, :] = jnp.zeros((SRK, LANE), jnp.int32)
    # stage merged_mlen where mls_scr held pre-merge lengths: the kidx
    # gathers must see (keep ? merged : 0)-compatible raw tables
    mls_scr[:, :] = merged_mlen

    def kidx_chunk(c, _):
        t = c * (SCH * LANE) + sc_iota * LANE + sl_iota + 1
        row_k = find_rows(fk2, SRKP // LANE, t, SRK)
        dead = (t > n_m) | (row_k >= SRK)
        fkprev = jnp.where(row_k > 0,
                           _bank_take(fk2, jnp.maximum(row_k - 1, 0),
                                      SRKP // LANE), 0)
        j = t - fkprev
        lane = _gsel_ref(
            lambda lo, n: inrow2_scr[pl.ds(lo, n), :],
            jnp.clip(row_k * LANE + j - 1, 0, SRK * LANE - 1), SRK)
        kidx = jnp.where(dead, jnp.int32(S_cap), row_k * LANE + lane)
        kc = jnp.clip(kidx, 0, SRK * LANE - 1)
        ls = _gsel_ref(lambda lo, n: litst_scr[pl.ds(lo, n), :], kc,
                       SRK)
        ll = _gsel_ref(lambda lo, n: litln_scr[pl.ds(lo, n), :], kc,
                       SRK)
        of = _gsel_ref(lambda lo, n: offs_scr[pl.ds(lo, n), :], kc,
                       SRK)
        mm = _gsel_ref(lambda lo, n: mls_scr[pl.ds(lo, n), :], kc,
                       SRK)
        sl = pl.ds(c * SCH, SCH)
        mtok_scr[sl, :] = kidx
        mlitst_scr[sl, :] = jnp.where(dead, 0, ls)
        mlitln_scr[sl, :] = jnp.where(dead, 0, ll)
        moff_scr[sl, :] = jnp.where(dead, 0, of)
        mml_scr[sl, :] = jnp.where(dead, 0, mm)
        return 0

    n_m_chunks = jnp.clip(
        (jnp.minimum(n_m, S_cap) + SCH * LANE - 1) // (SCH * LANE),
        0, SRK // SCH)
    jax.lax.fori_loop(0, n_m_chunks, kidx_chunk, 0)
    if _probe == "upto:kidx":
        return _exit_with(mml_scr[:, :])

    # ---- E4f: final literal tail, sizes, output offsets --------------
    valid_m = mtok_scr[:, :] < S_cap
    lit_start_m = mlitst_scr[:, :]
    lit_len_m = mlitln_scr[:, :]
    off_m = moff_scr[:, :]
    mlen_m = mml_scr[:, :]
    tail_start = jnp.maximum(jnp.max(jnp.where(
        valid_m, lit_start_m + lit_len_m + mlen_m, 0)), P)
    is_final = (k_iota == n_m) & (k_iota < S_cap)
    lit_start_m = jnp.where(is_final, tail_start, lit_start_m)
    lit_len_m = jnp.where(is_final, end_abs - tail_start, lit_len_m)
    off_m = jnp.where(is_final, 0, off_m)
    mlen_m = jnp.where(is_final, 0, mlen_m)
    live = (valid_m | is_final) & (k_iota < S_cap)
    has_match = live & (mlen_m > 0)

    e_lit = jnp.maximum(lit_len_m - RUN_MASK, 0)
    lit_ext = jnp.where(live & (lit_len_m >= RUN_MASK),
                        1 + e_lit // 255, 0)
    e_m = jnp.maximum(mlen_m - MINMATCH - ML_MASK, 0)
    m_ext = jnp.where(has_match & (mlen_m - MINMATCH >= ML_MASK),
                      1 + e_m // 255, 0)
    size = jnp.where(live,
                     1 + lit_ext + lit_len_m
                     + jnp.where(has_match, 2 + m_ext, 0), 0)
    scum = _scan1d(size, jnp.add, 0)
    s0 = scum - size
    out_len = scum[SRK - 1, LANE - 1]

    s0k_ref[0] = jnp.where(live, s0, jnp.int32(BIGKEY))
    litsrc_ref[0] = jnp.where(live, lit_start_m, 0)
    ll_ref[0] = jnp.where(live, lit_len_m, 0)
    offk_ref[0] = jnp.where(live, off_m, 0)
    mlk_ref[0] = jnp.where(live, jnp.where(has_match, mlen_m, 0), 0)

    stats_ref[b, 0] = n_seqs
    stats_ref[b, 1] = n_m
    stats_ref[b, 2] = out_len
    first_lit = jnp.where(n_m > 0, lit_len_m[0, 0],
                          end_abs - tail_start)
    stats_ref[b, 3] = first_lit
    stats_ref[b, 4] = end_abs - tail_start
    stats_ref[b, 5] = tail_start
    stats_ref[b, 6] = 0
    stats_ref[b, 7] = 0

    import os as _os
    if _os.environ.get("LZ4NET_SEQ_DEBUG") == "chain" and R <= SRK:
        # debugging tap: expose chain intermediates via the outputs
        s0k_ref[0, 0:R, :] = mark
        litsrc_ref[0, 0:R, :] = g
        ll_ref[0, 0:R, :] = e3v
        offk_ref[0, 0:R, :] = H2
        mlk_ref[0, 0:R, :] = H


@functools.partial(jax.jit,
                   static_argnames=("D", "S_cap", "P", "cu_rounds"))
def sequence_records(u32, matched, off_all, mlen_all, end_abs, pre_len,
                     D: int, S_cap: int, P: int = 0,
                     cu_rounds: int = 2):
    """Parse + records: (s0k, lit_src, lit_len, off, match_ml
    [B, SRK*128], stats [B, 8]) — the emit kernel's operands.

    stats rows: (n_seqs, n_m, out_len, first_lit, tail_lit_start_
    relative fields): [0] token count, [1] merged record count,
    [2] output byte count, [3] first record's literal length,
    [4] final literal run length.  Slot arrays are padded to SRK*128
    >= S_cap slots; slots >= S_cap are dead (s0k = BIGKEY).
    """
    B = u32.shape[0]
    R = D // LANE
    RP = _cdiv(R, LANE) * LANE
    SRK = _cdiv(_cdiv(S_cap, LANE), DCR) * DCR
    SRKP = _cdiv(SRK, LANE) * LANE
    kern = functools.partial(
        _seq_kernel, D, S_cap, P, cu_rounds,
        {"RP": RP, "SRK": SRK, "SRKP": SRKP})
    vspec = pl.BlockSpec((1, R, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, SRK, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec((B, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM)
    outs = pl.pallas_call(
        kern,
        out_shape=tuple(
            [jax.ShapeDtypeStruct((B, SRK, LANE), jnp.int32)] * 5
            + [jax.ShapeDtypeStruct((B, 8), jnp.int32)]),
        grid=(B,),
        in_specs=[vspec] * 4 + [smem1, smem1],
        out_specs=tuple([sspec] * 5 + [
            pl.BlockSpec((B, 8), lambda b: (0, 0),
                         memory_space=pltpu.SMEM)]),
        scratch_shapes=[
            pltpu.VMEM((R, LANE), jnp.int32),        # g
            pltpu.VMEM((DCR, LANE), jnp.int32),      # staircase acc
            pltpu.VMEM((R, LANE), jnp.int32),        # H2
            pltpu.VMEM((R // SS, LANE), jnp.int32),  # supersegment e
            pltpu.VMEM((R, LANE), jnp.int32),        # rank
            pltpu.VMEM((R, LANE), jnp.int32),        # inrow
            pltpu.VMEM((SRK, LANE), jnp.int32),      # tok
            pltpu.VMEM((SRK, LANE), jnp.int32),      # off_s
            pltpu.VMEM((SRK, LANE), jnp.int32),      # mlen_s
            pltpu.VMEM((SRK, LANE), jnp.int32),      # lit_start
            pltpu.VMEM((SRK, LANE), jnp.int32),      # lit_len
            pltpu.VMEM((SRK, LANE), jnp.int32),      # kidx
            pltpu.VMEM((SRK, LANE), jnp.int32),      # m lit_start
            pltpu.VMEM((SRK, LANE), jnp.int32),      # m lit_len
            pltpu.VMEM((SRK, LANE), jnp.int32),      # m off
            pltpu.VMEM((SRK, LANE), jnp.int32),      # m mlen
            pltpu.VMEM((SRK, LANE), jnp.int32),      # rank2 / mcum
            pltpu.VMEM((SRK, LANE), jnp.int32),      # inrow2
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(u32.reshape(B, R, LANE), matched.reshape(B, R, LANE),
      off_all.reshape(B, R, LANE), mlen_all.reshape(B, R, LANE),
      end_abs.reshape(B, 1), pre_len.reshape(B, 1))
    s0k, litsrc, ll, offk, mlk, stats = outs
    SR = SRK * LANE
    return (s0k.reshape(B, SR), litsrc.reshape(B, SR),
            ll.reshape(B, SR), offk.reshape(B, SR),
            mlk.reshape(B, SR), stats)
