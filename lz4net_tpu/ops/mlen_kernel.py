"""Match-length megakernel (encode E2).

Given each position's candidate ``prev`` (from the hash kernel /
prefix-sort tiers), produce (matched, offset, mlen) for the whole block
in ONE Pallas kernel.  The XLA formulation (`encode_vector.
_match_lengths`) spends ~16 ms/MB across ~40 separate ops — full-domain
one-hot gathers, a survivor-compaction sort, 20 small gathers for the
extension rounds, a scatter and 12 equality-run scans (PROFILE_r04.md);
everything here is VMEM-resident and int32-native:

E2a  periodic offsets 1..4    equality-run suffix scans against
                              byte-shifted copies (pure VPU).
E2b  far round 1              u32 at ``prev+4`` via a STAIRCASE
                              select-loop gather: ``prev < i`` always
                              (candidates precede their position), so
                              destination chunk c only reads source
                              segments <= c+1 — half the passes of a
                              full select loop (the resolver kernel's
                              trick, `resolve_kernel.py`).
E2c  survivor compaction      the k-th surviving position is a
                              windowed binary search over the monotone
                              rank cumsum (the records-kernel pattern):
                              a per-slot-row base from the row-rank
                              transpose, a W-row one-hot window fetch,
                              a 7-round in-window lane search, and an
                              exact select-loop fallback that only runs
                              when a slot's rows overflow the window.
E2d  extension rounds         u32 compares at ``ppos+l`` (in-window)
                              and ``prev+l`` (select-loop gather), two
                              rounds per convergence check; survivors
                              stop early when every chain dies.
E2e  dominant offsets         exact unbounded lengths for the top-K
                              offsets (selected XLA-side by the caller,
                              `encode_vector._select_top_offsets`): the
                              d-shifted input is two dynamic-row reads
                              from a staged scratch plus a mod-128 lane
                              take — no gather — then one run scan per
                              offset.
E2f  format end rules         LASTLITERALS / MFLIMIT / MINLENGTH masks
                              (`original/lz4_format_description.txt:
                              93-104`), elementwise.

Bit-exactness contract: identical (matched, off, mlen) to
`_match_lengths` for any input satisfying ``prev[i] < i`` (asserted by
tests/test_mlen_kernel.py in interpret mode and by tools/certify.py on
silicon).  Reference semantics: the match search + length extension of
`original/lz4.c:404-448` / `src/LZ4ps/LZ4Codec.Safe64.Dirty.cs:117-166`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (LASTLITERALS, MAX_DISTANCE, MFLIMIT, MINLENGTH,
                         MINMATCH)
from .records_kernel import _cdiv, _interpret, _scan1d, _shift_rows, \
    _take_lane

LANE = 128
BIG = 1 << 30
DCR = 64          # staircase destination chunk rows
W = 16            # compaction window rows (W*128 positions per slot row)


def _rscan_min(x):
    """Inclusive suffix min over the flattened [R, LANE] row-major
    domain: y[i] = min(x[i:])."""
    R, L = x.shape
    y = x
    s = 1
    while s < L:
        pad = jnp.full((R, s), BIG, x.dtype)
        y = jnp.minimum(jnp.concatenate([y[:, s:], pad], axis=1), y)
        s *= 2
    c = jnp.broadcast_to(y[:, 0:1], (R, L))      # per-row suffix min
    s = 1
    while s < R:
        pad = jnp.full((s, L), BIG, x.dtype)
        c = jnp.minimum(jnp.concatenate([c[s:], pad], axis=0), c)
        s *= 2
    carry = jnp.concatenate([c[1:], jnp.full((1, L), BIG, x.dtype)],
                            axis=0)              # min over LATER rows
    return jnp.minimum(carry, y)


def _run_from_eq(eq_i32, i_flat, D):
    """run[i] = length of the run of ones starting at i."""
    nf = _rscan_min(jnp.where(eq_i32 == 0, i_flat, jnp.int32(D)))
    return nf - i_flat


def _shift_bytes_right(x, d):
    """y[i] = x[i - d] (zero fill), d in 1..LANE-1, on [R, LANE]."""
    up = _shift_rows(x, -1)
    return jnp.concatenate([up[:, LANE - d:], x[:, :LANE - d]], axis=1)


def _gsel_ref(tbl_ref, idx, R, seg=DCR):
    """out[q] = tbl[idx[q]]: full select-loop gather from a (row-
    sliceable) ref accessor; ``tbl_ref(lo, n)`` returns rows
    [lo, lo+n)."""
    row = idx >> 7
    lane = idx & (LANE - 1)

    def body(s, acc):
        blk = tbl_ref(s * seg, seg)
        for k in range(seg):
            vals = _take_lane(
                jnp.broadcast_to(blk[k:k + 1, :], lane.shape), lane)
            acc = jnp.where(row == s * seg + k, vals, acc)
        return acc

    return jax.lax.fori_loop(0, R // seg, body, jnp.zeros_like(idx))


def _bank_take(vec, idx, nbanks):
    """vec [1, nbanks*LANE] int32; out[q] = vec[0, idx[q]]."""
    lane = idx & (LANE - 1)
    bank = idx >> 7
    acc = jnp.zeros_like(idx)
    for bk in range(nbanks):
        bc = jnp.broadcast_to(vec[:, bk * LANE:(bk + 1) * LANE],
                              idx.shape)
        acc = jnp.where(bank == bk, _take_lane(bc, lane), acc)
    return acc


def _pickw(win, delta, lane_idx):
    """win [SR, W, LANE]; out[s] = win[s, delta[s], lane_idx[s]]."""
    lane = lane_idx & (LANE - 1)
    acc = jnp.zeros_like(lane_idx)
    for w in range(win.shape[1]):
        acc = jnp.where(delta == w, _take_lane(win[:, w, :], lane), acc)
    return acc


def _tpose_col(col, R, RP, bits):
    """Exact [R, 1] -> [1, RP] transpose (8-bit-plane identity matmuls;
    f32 MXU matmuls round through bf16 on silicon)."""
    ident = (jax.lax.broadcasted_iota(jnp.int32, (R, RP), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (R, RP), 1)
             ).astype(jnp.bfloat16)
    out = jnp.zeros((1, RP), jnp.int32)
    for p in range(_cdiv(bits, 8)):
        plane = ((col >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
        r = jax.lax.dot_general(
            plane, ident, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        out = out | (r << (8 * p))
    return out


def _win_fetch(tables_planes, base, SR, R):
    """One-hot fetch of W consecutive rows per slot row.

    tables_planes: list of (tbl [R, LANE] int32, nplanes).  Returns the
    per-table [SR, W, LANE] windows; window s covers table rows
    [base[s], base[s] + W)."""
    wsel = jnp.clip(
        base + jax.lax.broadcasted_iota(jnp.int32, (SR, W), 1), 0, R - 1)
    oh = (wsel[..., None] == jax.lax.broadcasted_iota(
        jnp.int32, (SR, W, R), 2)).astype(jnp.bfloat16).reshape(SR * W, R)
    wins = []
    for tbl, planes in tables_planes:
        acc = None
        for p in range(planes):
            plane = ((tbl >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
            v = jax.lax.dot_general(
                oh, plane, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32
            ).astype(jnp.int32).reshape(SR, W, LANE)
            acc = v if p == 0 else acc | (v << (8 * p))
        wins.append(acc)
    return wins


def _xor_nb(wa, wb):
    diff = jnp.bitwise_xor(wa, wb)
    return jnp.where(
        (diff & 0xFF) != 0, 0,
        jnp.where((diff & 0xFF00) != 0, 1,
                  jnp.where((diff & 0xFF0000) != 0, 2,
                            jnp.where(diff != 0, 3, 4))))


def _mlen_kernel(D, rcap, ext_rounds, K, statics, *refs):
    (x_ref, u32_ref, prev_ref, m8_ref, dks_ref, ea_ref, bl_ref,
     matched_ref, off_ref, mlen_ref,
     xs2_scr, wp4_scr, acc_scr, rank_scr, ppos_scr, prevc_scr,
     wa_scr) = refs
    # tools/probe_mlen.py: strip phases to attribute on-chip cost
    import os as _os
    _strip = _os.environ.get("LZ4NET_MLEN_PROBE", "")
    parts = {"per", "stair", "ext", "top"}
    if _strip == "empty":
        parts = set()
    elif _strip.startswith("only:"):
        parts = set(_strip[5:].split(","))
    elif _strip.startswith("no"):
        parts.discard(_strip[2:])
    R = D // LANE
    RP = statics["RP"]
    SR = rcap // LANE
    b = pl.program_id(0)

    x = x_ref[0]
    u32 = u32_ref[0]
    prev = prev_ref[0]
    m8 = m8_ref[0]
    end_abs = ea_ref[b, 0]
    blk_len = bl_ref[b, 0]

    r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)
    i_flat = r_iota * LANE + l_iota

    off = i_flat - prev
    matched = ((prev >= 0) & (off <= MAX_DISTANCE)).astype(jnp.int32)

    # ---- E2a: periodic offsets 1..4 ---------------------------------
    mlen = jnp.zeros((R, LANE), jnp.int32)
    if "per" in parts:
        for d in range(1, 5):
            eq = (x == _shift_bytes_right(x, d)).astype(jnp.int32)
            run = _run_from_eq(eq, i_flat, D)
            mlen = jnp.where((matched == 1) & (off == d), run, mlen)

    # ---- E2b: far round 1 (staircase gather of u32[prev+4]) ---------
    nch = R // DCR

    def chunk_body(c, _):
        idxc = jnp.clip(
            prev_ref[0, pl.ds(c * DCR, DCR), :] + 4, 0, D - 1)
        rowc = idxc >> 7
        lanec = idxc & (LANE - 1)
        acc_scr[:, :] = jnp.zeros((DCR, LANE), jnp.int32)
        for seg in range(nch):
            @pl.when(seg <= c + 1)
            def _():
                acc = acc_scr[:, :]
                blk = u32[seg * DCR:(seg + 1) * DCR]
                for k in range(DCR):
                    vals = _take_lane(
                        jnp.broadcast_to(blk[k:k + 1, :], lanec.shape),
                        lanec)
                    acc = jnp.where(rowc == seg * DCR + k, vals, acc)
                acc_scr[:, :] = acc
        wp4_scr[pl.ds(c * DCR, DCR), :] = acc_scr[:, :]
        return 0

    if "stair" in parts:
        jax.lax.fori_loop(0, nch, chunk_body, 0)
        w_p4 = wp4_scr[:, :]
    else:
        w_p4 = jnp.zeros((R, LANE), jnp.int32)

    w_i4 = jnp.concatenate(
        [u32[:, 4:], _shift_rows(u32, 1)[:, :4]], axis=1)
    nb1 = jnp.where(m8 != 0, 4, _xor_nb(w_i4, w_p4))
    far = (matched == 1) & (off > 4)
    l_far = jnp.where(far, MINMATCH + nb1, 0)
    alive = far & (nb1 == 4)

    # ---- E2c/E2d: survivor compaction + extension rounds ------------
    if "ext" in parts:
        rank = _scan1d(alive.astype(jnp.int32), jnp.add, 0)
        rank_scr[:, :] = rank
        fk = _tpose_col(rank[:, LANE - 1:LANE], R, RP,
                        max((D + 1).bit_length(), 8))
        fk = jnp.where(jax.lax.broadcasted_iota(
            jnp.int32, (1, RP), 1) < R, fk, jnp.int32(BIG))

        sr_iota = jax.lax.broadcasted_iota(jnp.int32, (SR, LANE), 0)
        sl_iota = jax.lax.broadcasted_iota(jnp.int32, (SR, LANE), 1)
        t = sr_iota * LANE + sl_iota + 1                  # target rank

        row_k = jnp.zeros((SR, LANE), jnp.int32)
        step = 1 << R.bit_length()
        while step:
            cand = row_k + step
            fkv = _bank_take(fk, cand - 1, RP // LANE)
            row_k = jnp.where((cand <= R) & (fkv < t), cand, row_k)
            step >>= 1
        exhausted = row_k >= R

        base = jnp.broadcast_to(row_k[:, 0:1], (SR, LANE))
        delta = row_k - base
        # W-2: the +1 source row of the ppos+l extension picks must fit too
        miss = (~exhausted) & (delta > W - 2)
        any_miss = jnp.sum(miss.astype(jnp.int32)) > 0

        mprev = jnp.maximum(prev, 0)
        pos_bits = max((D + 1).bit_length(), 8)
        wrank, wprev, wu32 = _win_fetch(
            [(rank, _cdiv(pos_bits, 8)), (mprev, _cdiv(pos_bits, 8)),
             (u32, 4)], base[:, 0:1], SR, R)

        lane0 = jnp.zeros((SR, LANE), jnp.int32)
        for stepl in (64, 32, 16, 8, 4, 2, 1):
            cand = lane0 + stepl
            rv = _pickw(wrank, delta, cand - 1)
            lane0 = jnp.where((cand <= LANE) & (rv < t), cand, lane0)

        ppos = jnp.where(exhausted, jnp.int32(D), row_k * LANE + lane0)
        ppos_scr[:, :] = ppos
        prevc_scr[:, :] = _pickw(wprev, delta, lane0)

        @pl.when(any_miss)
        def _():
            lane_f = jnp.zeros((SR, LANE), jnp.int32)
            for stepl in (64, 32, 16, 8, 4, 2, 1):
                cand = lane_f + stepl
                rv = _gsel_ref(
                    lambda lo, n: rank_scr[pl.ds(lo, n), :],
                    jnp.clip(row_k * LANE + cand - 1, 0, D - 1), R)
                lane_f = jnp.where((cand <= LANE) & (rv < t), cand, lane_f)
            ppos_f = jnp.where(exhausted, jnp.int32(D),
                               row_k * LANE + lane_f)
            ppos_scr[:, :] = jnp.where(miss, ppos_f, ppos_scr[:, :])
            pc_f = jnp.maximum(_gsel_ref(
                lambda lo, n: prev_ref[0, pl.ds(lo, n), :],
                jnp.clip(ppos_f, 0, D - 1), R), 0)
            prevc_scr[:, :] = jnp.where(miss, pc_f, prevc_scr[:, :])

        ppos = ppos_scr[:, :]
        prev_c = prevc_scr[:, :]
        ppos_c = jnp.clip(ppos, 0, D - 1)

        # ---- E2d: extension rounds (2 per convergence check) ------------
        def u32_at(idx):
            return _gsel_ref(lambda lo, n: u32_ref[0, pl.ds(lo, n), :],
                             idx, R)

        def one_round(l_c, palive):
            awa = jnp.clip(ppos_c + l_c, 0, D - 1)
            wa_scr[:, :] = _pickw(wu32, (awa >> 7) - base, awa & (LANE - 1))

            @pl.when(any_miss)
            def _():
                wa_scr[:, :] = jnp.where(miss, u32_at(awa), wa_scr[:, :])
            wa = wa_scr[:, :]
            wb = u32_at(jnp.clip(prev_c + l_c, 0, D - 1))
            nb = jnp.where(palive != 0, _xor_nb(wa, wb), 0)
            return l_c + nb, palive * (nb == 4).astype(jnp.int32)

        def ext_cond(st):
            l_c, palive, r = st
            return (r < ext_rounds) & (jnp.sum(palive) > 0)

        def ext_body(st):
            l_c, palive, r = st
            l_c, palive = one_round(l_c, palive)
            l_c, palive = one_round(l_c, palive)
            return l_c, palive, r + 2

        assert ext_rounds % 2 == 0, ext_rounds
        l_c0 = jnp.full((SR, LANE), MINMATCH + 4, jnp.int32)
        pal0 = (ppos < D).astype(jnp.int32)
        l_c, _pal, _r = jax.lax.while_loop(
            ext_cond, ext_body, (l_c0, pal0, jnp.int32(0)))

        # scatter-back as a gather from the slot domain: alive position i
        # with rank-1 < rcap reads slot rank-1's extension
        extra = jnp.where(ppos < D, l_c - (MINMATCH + 4), 0)
        slot = rank - 1
        srow = slot >> 7
        slane = slot & (LANE - 1)
        ext_at = jnp.zeros((R, LANE), jnp.int32)
        for s in range(SR):
            vals = _take_lane(
                jnp.broadcast_to(extra[s:s + 1, :], slane.shape), slane)
            ext_at = jnp.where(srow == s, vals, ext_at)
        l_far = l_far + jnp.where(alive & (slot < rcap), ext_at, 0)
    mlen = jnp.where(far, l_far, mlen)

    # ---- E2e: dominant offsets, exact unbounded lengths -------------
    xs2_scr[0:R, :] = jnp.zeros((R, LANE), jnp.int32)
    xs2_scr[R:2 * R, :] = x
    for tk in range(K if "top" in parts else 0):
        dk = dks_ref[b, tk]
        q = dk >> 7
        m = dk & (LANE - 1)
        A = xs2_scr[pl.ds(R - q, R), :]          # x[r - q]
        Bm = xs2_scr[pl.ds(R - q - 1, R), :]     # x[r - q - 1]
        la = (l_iota - m) & (LANE - 1)
        elem = jnp.where(l_iota >= m, _take_lane(A, la),
                         _take_lane(Bm, la))
        eq = ((x == elem) & (i_flat >= dk)).astype(jnp.int32)
        run = _run_from_eq(eq, i_flat, D)
        mlen = jnp.where(far & (off == dk), run, mlen)

    # ---- E2f: format end rules --------------------------------------
    limit = end_abs - LASTLITERALS - i_flat
    mlen = jnp.minimum(mlen, jnp.maximum(limit, 0))
    m_out = (matched == 1) & (mlen >= MINMATCH) \
        & (i_flat <= end_abs - MFLIMIT) & (blk_len >= MINLENGTH)
    matched_ref[0] = m_out.astype(jnp.int32)
    off_ref[0] = jnp.where(m_out, off, 0)
    mlen_ref[0] = jnp.where(m_out, mlen, 0)


@functools.partial(jax.jit,
                   static_argnames=("D", "rcap", "ext_rounds"))
def match_lengths_fused(x, u32, prev, m8, dks, end_abs, blk_len,
                        D: int, rcap: int, ext_rounds: int = 10):
    """(matched, off, mlen) for every position, one kernel per block.

    x/u32/prev/m8: [B, D] int32 (D % 8192 == 0; prev[i] < i or -1);
    dks: [B, K] int32 dominant offsets (0 = unused slot);
    end_abs/blk_len: [B] int32.  rcap % 128 == 0; ext_rounds even.
    Bit-identical to `encode_vector._match_lengths` given the same dks.
    """
    B = x.shape[0]
    R = D // LANE
    K = dks.shape[1]
    RP = _cdiv(R, LANE) * LANE
    SR = rcap // LANE
    kern = functools.partial(_mlen_kernel, D, rcap, ext_rounds, K,
                             {"RP": RP})
    vspec = pl.BlockSpec((1, R, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    matched, offv, mlenv = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((B, R, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((B, R, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((B, R, LANE), jnp.int32)),
        grid=(B,),
        in_specs=[vspec] * 4 + [
            pl.BlockSpec((B, K), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((B, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM)],
        out_specs=(vspec, vspec, vspec),
        scratch_shapes=[pltpu.VMEM((2 * R, LANE), jnp.int32),
                        pltpu.VMEM((R, LANE), jnp.int32),
                        pltpu.VMEM((DCR, LANE), jnp.int32),
                        pltpu.VMEM((R, LANE), jnp.int32),
                        pltpu.VMEM((SR, LANE), jnp.int32),
                        pltpu.VMEM((SR, LANE), jnp.int32),
                        pltpu.VMEM((SR, LANE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x.reshape(B, R, LANE), u32.reshape(B, R, LANE),
      prev.reshape(B, R, LANE), m8.reshape(B, R, LANE),
      dks, end_abs.reshape(B, 1), blk_len.reshape(B, 1))
    return (matched.reshape(B, D).astype(bool),
            offv.reshape(B, D), mlenv.reshape(B, D))
