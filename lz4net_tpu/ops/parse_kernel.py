"""Token-parse megakernel: compressed bytes → token marks in ONE kernel.

Replaces the decode pipeline's P1–P4 XLA phases (speculative parse,
segment-exit doubling, chain threading, token marking — 4.2 ms per
16×64 KB batch as ~60 separate [B, C] ops, each paying an HBM round
trip) with one VMEM-resident Pallas kernel per block:

P1  parse fields      255-extension runs from a suffix-min scan (the
                      next-non-255 index is an associative min);
                      extension values via a 6-row forward diagonal
                      window; the long-range match-extension lookup at
                      ``mpos+2`` uses a 24-row diagonal window and,
                      instead of a fallback gather, *post-validates*:
                      a window miss only matters on a byte the token
                      chain actually visits, and every visited byte is
                      marked by P4 — so ``miss = any(mark & oob)`` is a
                      sound block-level certificate (miss → the caller
                      retries on the exact XLA path or the host oracle).
P2  segment exits     6 pointer-doubling rounds; the in-segment lookup
                      is a native lane shuffle (`take_along_axis`).
P3  chain threading   sequential scan over the 128-byte segments with
                      the carry kept as a lanes-broadcast vector — no
                      scalar extraction, ~8 vector ops per segment.
P4  token marking     in-segment chain walk from each entry, all
                      segments in parallel (44 shuffle rounds).

Outputs feed `records_kernel.records_to_state` unchanged.

Reference semantics: the sequence loop of `LZ4_uncompress`
(`/root/reference/src/LZ4ps/LZ4Codec.Safe64.Dirty.cs:533-659`) and the
255-extension rule of `original/lz4_format_description.txt:39-57`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .records_kernel import (_cdiv, _diag_window, _interpret, _take_lane,
                             _shift_rows)

LANE = 128
M17 = (1 << 17) - 1
W_TERM = 6           # forward window for extension terminators (≤377 B)
W_EXT = 24           # forward window for the mpos+2 lookup (≈3 KB)
BIG = 1 << 30


def _suffix_scan1d(x, op, identity):
    """Inclusive suffix scan over the flattened [R, 128] row-major
    domain (mirror of records_kernel._scan1d)."""
    R, L = x.shape
    y = x
    s = 1
    while s < L:
        pad = jnp.full((R, s), identity, x.dtype)
        y = op(y, jnp.concatenate([y[:, s:], pad], axis=1))
        s *= 2
    c = jnp.broadcast_to(y[:, 0:1], (R, L))      # per-row suffix totals
    s = 1
    while s < R:
        pad = jnp.full((s, L), identity, x.dtype)
        c = op(c, jnp.concatenate([c[s:], pad], axis=0))
        s *= 2
    carry = jnp.concatenate(
        [c[1:], jnp.full((1, L), identity, x.dtype)], axis=0)
    return op(y, carry)


def _parse_kernel(C, comp_ref, cl_ref, mark_ref, ll_ref,
                  ml_ref, stats_ref, h_scr, e_scr):
    Cr = C // LANE
    b = pl.program_id(0)
    comp = comp_ref[0]
    comp_len = cl_ref[b, 0]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (Cr, LANE), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (Cr, LANE), 1)
    q = r_iota * LANE + l_iota

    # ---- P1: parse fields -------------------------------------------
    # run255[q] = next-non-255 index minus q (associative suffix min)
    nn = _suffix_scan1d(jnp.where(comp != 255, q, jnp.int32(BIG)),
                        jnp.minimum, jnp.int32(BIG))
    run255 = jnp.clip(nn - q, 0, C)

    term_idx = jnp.clip(q + run255, 0, C - 1)
    term, band_tb = _diag_window(comp, term_idx, 0, W_TERM)
    band_t = band_tb.astype(jnp.int32)
    ext_val = jnp.clip(255 * run255 + jnp.where(band_tb, term, 0), 0, M17)

    lit_nib = comp >> 4
    ml_nib = comp & 15

    # literal-side extension starts at q+1: flat shift-left by one
    ext_lit = jnp.concatenate(
        [ext_val[:, 1:], _shift_rows(ext_val, 1)[:, :1]], axis=1)
    bt_lit = jnp.concatenate(
        [band_t[:, 1:], _shift_rows(band_t, 1)[:, :1]], axis=1)
    lit_len = jnp.where(lit_nib == 15, 15 + ext_lit, lit_nib)
    lit_len = jnp.clip(lit_len, 0, M17)
    hdr = 1 + jnp.where(lit_nib == 15, 1 + ext_lit // 255, 0)

    # match-side extension at mpos+2: the terminator-validity bit rides
    # in bit 18 of the packed value so one window serves both
    mpos = jnp.clip(q + hdr + lit_len, 0, C - 1)
    mp2 = jnp.clip(mpos + 2, 0, C - 1)
    packv = ext_val | (band_t << 18)
    got_m, band_mb = _diag_window(packv, mp2, 0, W_EXT)
    ext_m_ok = band_mb & (((got_m >> 18) & 1) == 1)
    ext_m = jnp.clip(jnp.where(band_mb, got_m & M17, 0), 0, M17)
    mlen = 4 + jnp.where(ml_nib == 15, 15 + ext_m, ml_nib)
    mlen = jnp.clip(mlen, 0, M17)
    mext = jnp.where(ml_nib == 15, 1 + ext_m // 255, 0)

    g = jnp.clip(mpos + 2 + mext, q + 3, C - 1)

    # ---- P2: segment exits by in-segment pointer doubling -----------
    seg_end = (r_iota + 1) * LANE
    H = g
    for _ in range(6):
        nxt = _take_lane(H, H)          # H[q] in q's row ⇒ lane shuffle
        H = jnp.where(H < seg_end, nxt, H)

    # ---- P3: two-level chain threading (Cr/8 sequential steps) ------
    # supersegment-exit doubling + carry walk + vectorised in-
    # supersegment row walk (seq_kernel.thread_entries_two_level); the
    # previous flat row walk was Cr fori iterations and dominated this
    # kernel's on-chip cost
    from .seq_kernel import thread_entries_two_level
    pos = thread_entries_two_level(H, g, h_scr, e_scr, Cr)

    # ---- P4: mark all chain positions, segments in parallel ---------
    seg_start = r_iota * LANE
    mark = jnp.zeros((Cr, LANE), jnp.int32)
    for _ in range(_cdiv(LANE, 3) + 1):
        valid = (pos >= seg_start) & (pos < seg_start + LANE)
        mark = mark | (valid & (l_iota == (pos & (LANE - 1)))
                       ).astype(jnp.int32)
        nxt = _take_lane(g, pos)
        pos = jnp.where(valid, nxt, jnp.int32(BIG))
    mark = mark * (q < comp_len).astype(jnp.int32)

    # ---- certification: every marked token's window lookups held ----
    lit_oob = (lit_nib == 15) & (bt_lit == 0)
    m_oob = (ml_nib == 15) & ~ext_m_ok
    miss = jnp.sum(mark * (lit_oob | m_oob).astype(jnp.int32)) > 0

    mark_ref[0] = mark
    ll_ref[0] = lit_len
    ml_ref[0] = mlen
    stats_ref[b, 0] = miss.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("C",))
def parse_tokens(comp, comp_len, C: int):
    """comp: [B, C] int32 bytes (C % 128 == 0), comp_len: [B] int32.
    Returns (mark, lit_len, mlen) [B, C] int32 and miss [B] bool (miss
    ⇒ a marked token needed an out-of-window extension lookup; the
    caller must re-decode that block on an exact path)."""
    B = comp.shape[0]
    Cr = C // LANE
    kern = functools.partial(_parse_kernel, C)
    cspec = pl.BlockSpec((1, Cr, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((B, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM)
    mark, ll, ml, stats = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((B, Cr, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((B, Cr, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((B, Cr, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1), jnp.int32)),
        grid=(B,),
        in_specs=[cspec, sspec],
        out_specs=(cspec, cspec, cspec, sspec),
        scratch_shapes=[pltpu.VMEM((Cr, LANE), jnp.int32),
                        pltpu.VMEM((Cr, LANE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(comp.reshape(B, Cr, LANE), comp_len.reshape(B, 1))
    return (mark.reshape(B, C), ll.reshape(B, C), ml.reshape(B, C),
            stats[:, 0].astype(bool))
