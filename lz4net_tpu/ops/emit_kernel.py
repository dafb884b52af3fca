"""Encode emission megakernel: per-record fields → compressed bytes.

Replaces encode_vector's E5 stage (≈8 `scatter_add_planes` calls at
~2.8 ms each plus three O-length cumsums and a jump-scatter — the
dominant cost of the device encoder after the candidate sorts) with ONE
VMEM-resident kernel per block, the mirror image of
`records_kernel.records_to_state`:

* record output starts ``s0`` are monotone (sizes are non-negative and
  dead records are keyed out at +inf), so the record governing
  compressed byte ``o`` is found by the same windowed binary search the
  decode records kernel uses — no scatters;
* within a record, every byte is arithmetic in the record's fields:
  token, length-extension runs (255s + remainder), the 16-bit offset,
  match-length extensions;
* literal bytes return their INPUT source index (``cidx``) instead of a
  value — their sources are monotone in ``o``, so the caller resolves
  them with one `fused_gather.rowbase_gather`, exactly like the decode
  pipeline's literal glue.

Live records occupy a contiguous prefix (encode_vector compacts kept
records to the front and appends the final literal-only record), so the
search keys stay monotone.

Reference semantics: the sequence-emission side of `LZ4_compressCtx`
(`/root/reference/src/LZ4ps/LZ4Codec.Safe64.Dirty.cs:151-249`) and the
length-extension rule of `original/lz4_format_description.txt:39-57`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import MINMATCH, ML_MASK, RUN_MASK
from .records_kernel import _cdiv, _interpret, _take_lane

LANE = 128
W = 2                # record-row window per output row: 128 output
                     # bytes span <= ceil(128/3)+1 = 44 records, well
                     # inside 2*128 with one row of anchor slack
DCH = 64             # output rows per fetch chunk (8 KB)
BIGKEY = 1 << 23     # dead-record key sentinel; MUST fit the 3
                     # 8-bit fetch planes (s0+1 < 2^18 stays below)


def _emit_kernel(O, SR, statics, *refs):
    (s0_ref, ls_ref, ll_ref, off_ref, ml_ref, ol_ref,
     direct_ref, cidx_ref, stats_ref, base_scr) = refs
    SRP = statics["SRP"]
    OR = O // LANE

    b = pl.program_id(0)
    s0 = s0_ref[0]
    ls = ls_ref[0]
    ll = ll_ref[0]
    off = off_ref[0]
    ml = ml_ref[0]
    out_len = ol_ref[b, 0]

    # keys: s0 + 1 for live records (0 = "no record"), monotone
    key = s0 + 1

    # map_lo[d] = last record row whose first key <= first byte of
    # output row d (plane-decomposed transpose — f32 MXU matmuls round
    # through bf16 on silicon, the round-2 corruption)
    first_key = key[:, :1]
    ident = (jax.lax.broadcasted_iota(jnp.int32, (SR, SRP), 0)
             == jax.lax.broadcasted_iota(
                 jnp.int32, (SR, SRP), 1)).astype(jnp.bfloat16)
    fk = jnp.zeros((1, SRP), jnp.int32)
    for p in range(3):
        fplane = ((first_key >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
        r = jax.lax.dot_general(
            fplane, ident,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        fk = fk | (r << (8 * p))
    fk = jnp.where(jax.lax.broadcasted_iota(
        jnp.int32, (1, SRP), 1) < SR, fk, jnp.int32(1 << 30))
    drow = jax.lax.broadcasted_iota(jnp.int32, (OR, 1), 0)
    thresh = drow * LANE + 1
    map_lo = jnp.sum((fk <= thresh).astype(jnp.int32), axis=1,
                     keepdims=True) - 1
    base = jnp.clip(map_lo, 0, SR - 1)
    base_scr[:, :] = jnp.broadcast_to(base, (OR, LANE))

    fetch_fields = [(key, 3), (ls, 3), (ll, 3), (off, 3), (ml, 3)]

    def chunk_body(c, miss):
        dlo = c * DCH
        bs = base_scr[pl.ds(dlo, DCH), :][:, :1]
        o = dlo * LANE \
            + jax.lax.broadcasted_iota(jnp.int32, (DCH, LANE), 0) * LANE \
            + jax.lax.broadcasted_iota(jnp.int32, (DCH, LANE), 1)

        wsel = jnp.clip(bs + jax.lax.broadcasted_iota(
            jnp.int32, (DCH, W), 1), 0, SR - 1)
        oh = (wsel[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, (DCH, W, SR), 2)).astype(jnp.bfloat16)
        oh = oh.reshape(DCH * W, SR)

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
        wkey, wls, wll, woff, wml = wins

        ko = o + 1
        wrow = jnp.zeros((DCH, LANE), jnp.int32)
        for wr in range(1, W):
            wrow = jnp.where(wkey[:, wr, :1] <= ko, wr, wrow)
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
        found = (kq > 0) & (kq <= ko) & (kq < BIGKEY)
        s0q = kq - 1
        lsq = pick(wls)
        llq = pick(wll)
        offq = pick(woff)
        mlq = pick(wml)

        # per-record derived layout
        e_lit = jnp.maximum(llq - RUN_MASK, 0)
        lit_ext = jnp.where(llq >= RUN_MASK, 1 + e_lit // 255, 0)
        has_m = mlq > 0
        mm = jnp.maximum(mlq - MINMATCH, 0)
        e_m = jnp.maximum(mm - ML_MASK, 0)
        m_ext = jnp.where(has_m & (mm >= ML_MASK), 1 + e_m // 255, 0)
        size = 1 + lit_ext + llq + jnp.where(has_m, 2 + m_ext, 0)

        r = o - s0q
        live_o = found & (o < out_len) & (r < size)
        tok = (jnp.minimum(llq, RUN_MASK) << 4) \
            | jnp.minimum(jnp.where(has_m, mm, 0), ML_MASK)

        lit_o = 1 + lit_ext                  # record-relative offsets
        off_o = lit_o + llq
        mext_o = off_o + 2

        # length-extension byte values (255s then remainder)
        j_l = r - 1
        lext_b = jnp.where(j_l < lit_ext - 1, 255,
                           e_lit - 255 * jnp.maximum(lit_ext - 1, 0))
        j_m = r - mext_o
        mext_b = jnp.where(j_m < m_ext - 1, 255,
                           e_m - 255 * jnp.maximum(m_ext - 1, 0))

        direct = jnp.where(
            r == 0, tok,
            jnp.where(r < lit_o, lext_b,
                      jnp.where(r < off_o, 0,          # literal: cidx
                                jnp.where(r == off_o, offq & 0xFF,
                                          jnp.where(r == off_o + 1,
                                                    offq >> 8,
                                                    mext_b)))))
        in_lit = live_o & (r >= lit_o) & (r < off_o)
        cidx = jnp.where(in_lit, lsq + (r - lit_o), -1)

        direct_ref[0, pl.ds(dlo, DCH), :] = jnp.where(
            live_o, direct & 0xFF, 0)
        cidx_ref[0, pl.ds(dlo, DCH), :] = cidx
        return miss + jnp.sum((~found & (o < out_len)).astype(jnp.int32))

    miss = jax.lax.fori_loop(0, OR // DCH, chunk_body, jnp.int32(0))
    stats_ref[b, 0] = miss


@functools.partial(jax.jit, static_argnames=("O",))
def emit_bytes(s0, lit_start, lit_len, off, mlen, out_len, O: int):
    """Compressed-byte emission from per-record fields.

    s0/lit_start/lit_len/off/mlen: [B, S_cap] int32 (dead records must
    carry s0 >= BIGKEY); out_len: [B].  Returns (direct [B, O] bytes
    with 0 at literal positions, cidx [B, O] literal source index or
    -1, miss [B] int32 count of ungoverned bytes — 0 for well-formed
    records).
    """
    B, S_cap = s0.shape
    SR = S_cap // LANE
    SRP = _cdiv(SR, LANE) * LANE
    OR = O // LANE
    kern = functools.partial(_emit_kernel, O, SR, {"SRP": SRP})
    rspec = pl.BlockSpec((1, SR, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((B, 1), lambda b: (0, 0),
                         memory_space=pltpu.SMEM)
    ospec = pl.BlockSpec((1, OR, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    direct, cidx, stats = pl.pallas_call(
        kern,
        out_shape=(jax.ShapeDtypeStruct((B, OR, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((B, OR, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((B, 1), jnp.int32)),
        grid=(B,),
        in_specs=[rspec] * 5 + [sspec],
        out_specs=(ospec, ospec, sspec),
        scratch_shapes=[pltpu.VMEM((OR, LANE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(s0.reshape(B, SR, LANE), lit_start.reshape(B, SR, LANE),
      lit_len.reshape(B, SR, LANE), off.reshape(B, SR, LANE),
      mlen.reshape(B, SR, LANE), out_len.reshape(B, 1))
    return (direct.reshape(B, O), cidx.reshape(B, O), stats[:, 0])
