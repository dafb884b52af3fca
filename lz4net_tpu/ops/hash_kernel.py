"""Per-block hash-table candidate search (batched Mosaic kernel).

The reference's match finder is a hash table: ``HashTable[hash(u32 at
position)] = most recent position``, probed then updated per position
(`/root/reference/original/lz4.c:248,345-520`; the <64 KB
specialisation uses an 8192-bucket table, `HASH64K_LOG=13`,
`src/LZ4ps/LZ4Codec.cs:63`).  Rounds 1-3 answered the same query with
corpus-wide stable sorts (`encode_vector._prev_occurrence`) — exact but
the dominant encode cost on chip (PROFILE_r03.md).

This module reproduces the reference's structure TPU-style at two
prefix widths (the prev4/prev8 sort tiers: an 8-byte-prefix occurrence
usually heads a longer match, worth preferring even when a 4-byte
occurrence is nearer).  Blocks are scanned in 512-position chunks; for
every position i the result is the first hit of:

    1. nearest j in i's near WINDOW with 8 bytes equal
    2. the 8-byte table's entry for bucket8(i), if its u32 matches
    3. nearest j in the window with u32[j] == u32[i]
    4. the 4-byte table's entry for bucket4(i), if its u32 matches

else -1.  The near window is i's 128-position row plus the previous row
of the same chunk (128..256 positions of exact-match lookback); both 8
K-bucket tables hold state as of the chunk start and are updated once
per chunk with a COUNT-GUARDED sum-scatter: buckets hit exactly once in
the chunk take the new (position+1, u32) entry, buckets hit more than
once keep their old entry ("poison-keep-old").  A stale entry still
verifies by content — LZ4 offsets cost 2 bytes at any distance, so a
farther occurrence of the same bytes is as good as a near one; only
genuinely divergent content loses, and the window arm covers the near
field.  Every candidate's u32 is verified before being returned.

Three implementations share these exact semantics:
  * `_bucket_prev_pallas` — ONE Mosaic kernel, grid over chunks, every
    block batched per step (per-block grids measured ~6 us/step of pure
    overhead and starve the VPU with [2,128] ops; see git history).
    Tables persist in VMEM scratch across grid steps.
  * `_bucket_prev_scan` — the same math as a `lax.scan` (CPU/test
    path; on chip the scan's ~20 fusions x step sank encode to
    0.0048 GB/s in launch overhead alone).
  * the NumPy oracle in tests/test_hash_kernel.py.
Cross-implementation agreement is asserted bit-for-bit on CPU (tests)
and on silicon (tools/certify.py encode.hashkernel).

Mosaic lessons encoded here: no i1 vreg concatenations; transposes as
exact 8-bit-plane identity matmuls; compare tensors oriented so the
LAST TWO dims are big ([B, 128, 128], sources on sublanes, queries on
lanes) — a batch dim in the middle decomposes every op into tiny
slices and measured 10x slower.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .records_kernel import _cdiv, _interpret, _take_lane

LANE = 128
CROWS = 4                  # chunk = CROWS x 128 positions
CHUNK = CROWS * LANE
NBROWS = 64                # 8192 buckets = the reference's 64K table
NB = NBROWS * LANE
MAXB = 32                  # kernel batch cap: B*CROWS <= 128
# numpy scalars, NOT jnp: a module-level jnp scalar is a committed
# device array; traces closing over it get it lifted to a runtime
# parameter, which jax 0.9's re-execution fastpath then drops
# ("Execution supplied 2 buffers but compiled program expected 4")
HASH_MUL = np.int32(-1640531535)         # 2654435761 as int32
MIX8 = np.int32(-1262405129)             # odd mixer for the 8-byte key


def hash_bucket(w):
    """The reference's multiplicative hash onto NB buckets
    (`original/lz4.c:248`: (x * 2654435761) >> (32 - HASH64K_LOG))."""
    return ((w * HASH_MUL) >> (32 - 13)) & (NB - 1)


def hash_bucket8(wa, wb):
    """Bucket of the 8-byte prefix (wa = u32 at i, wb = u32 at i+4)."""
    return hash_bucket(wa ^ (wb * MIX8))


# ---------------------------------------------------------------- scan

def _bucket_prev_scan(wa, wb, h4, h8, D: int):
    """XLA-scan implementation (CPU/test path; semantics above)."""
    B = wa.shape[0]
    nch = D // CHUNK

    def chunked(x):
        return jnp.moveaxis(x.reshape(B, nch, CROWS, LANE), 1, 0)

    xs = tuple(chunked(v) for v in (wa, wb, h4, h8))

    def step(carry, xc):
        t4p, t4w, t8p, t8w, cbase = carry
        wa_c, wb_c, h4_c, h8_c = xc               # [B, CROWS, LANE]
        ar = jnp.arange(LANE, dtype=jnp.int32) + (wa_c[0, 0, :1] & 0)

        # near-window arms: row r sources = rows r and r-1
        m4 = []
        m8 = []
        for r in range(CROWS):
            m4r = jnp.full((B, LANE), -1, jnp.int32)
            m8r = jnp.full((B, LANE), -1, jnp.int32)
            for sr in ([r - 1] if r else []) + [r]:
                eqa = wa_c[:, r, :, None] == wa_c[:, sr, None, :]
                eqb = wb_c[:, r, :, None] == wb_c[:, sr, None, :]
                spos = sr * LANE + ar[None, None, :]
                if sr == r:
                    eqa = eqa & (ar[None, :, None] > ar[None, None, :])
                m4r = jnp.maximum(m4r, jnp.max(
                    jnp.where(eqa, spos, -1), axis=2))
                m8r = jnp.maximum(m8r, jnp.max(
                    jnp.where(eqa & eqb, spos, -1), axis=2))
            m4.append(m4r)
            m8.append(m8r)
        m4 = jnp.stack(m4, axis=1)                # [B, CROWS, LANE]
        m8 = jnp.stack(m8, axis=1)

        # table probes (pre-update)
        def probe(tp, tw, h):
            hf = h.reshape(B, CHUNK)
            c = jnp.take_along_axis(tp, hf, axis=-1).reshape(h.shape)
            w = jnp.take_along_axis(tw, hf, axis=-1).reshape(h.shape)
            return c, (c > 0) & (w == wa_c)

        t4c, t4ok = probe(t4p, t4w, h4_c)
        t8c, t8ok = probe(t8p, t8w, h8_c)

        prev = jnp.where(
            m8 >= 0, cbase + m8,
            jnp.where(t8ok, t8c - 1,
                      jnp.where(m4 >= 0, cbase + m4,
                                jnp.where(t4ok, t4c - 1, -1))))

        # count-guarded table updates
        val_pos = (cbase.reshape(1, 1, 1)
                   + jax.lax.broadcasted_iota(
                       jnp.int32, (B, CROWS, LANE), 1) * LANE
                   + ar[None, None, :] + 1)

        def upd(tp, tw, h):
            # factored row x lane one-hots (a dense [B, CHUNK, 8192]
            # one-hot is 64x bigger for nothing).  HIGHEST precision on
            # every einsum: XLA TPU's default f32 matmul rounds through
            # bf16 and quantised the summed positions to multiples of 8
            # (caught by certify's pallas-vs-scan A/B, where the
            # plane-decomposed Mosaic kernel was the CORRECT side)
            hf = h.reshape(B, CHUNK)
            rr = jnp.arange(NBROWS, dtype=jnp.int32) + (hf[0, :1] & 0)
            ll = jnp.arange(LANE, dtype=jnp.int32) + (hf[0, :1] & 0)
            A = ((hf >> 7)[:, :, None]
                 == rr[None, None, :]).astype(jnp.float32)
            O = ((hf & (LANE - 1))[:, :, None]
                 == ll[None, None, :]).astype(jnp.float32)
            cnt = jnp.einsum("bkr,bkl->brl", A, O, precision="highest").reshape(B, NB)
            vp = val_pos.reshape(B, CHUNK)
            sp = jnp.einsum("bkr,bkl->brl",
                            A * vp.astype(jnp.float32)[:, :, None],
                            O, precision="highest").reshape(B, NB)
            sw_acc = jnp.zeros((B, NB), jnp.int32)
            waf = wa_c.reshape(B, CHUNK)
            for p in range(4):
                plane = ((waf >> (8 * p)) & 0xFF).astype(jnp.float32)
                sw_acc = sw_acc | ((jnp.einsum(
                    "bkr,bkl->brl", A * plane[:, :, None],
                    O, precision="highest").reshape(B, NB).astype(jnp.int32)
                    & 0xFF) << (8 * p))
            one = cnt == 1
            return (jnp.where(one, sp.astype(jnp.int32), tp),
                    jnp.where(one, sw_acc, tw))

        t4p, t4w = upd(t4p, t4w, h4_c)
        t8p, t8w = upd(t8p, t8w, h8_c)
        return (t4p, t4w, t8p, t8w, cbase + CHUNK), prev

    z = jnp.broadcast_to(wa[:, :1] & 0, (B, NB))
    cbase0 = wa[0, :1] & 0
    _, prevs = jax.lax.scan(step, (z, z, z, z, cbase0), xs)
    return jnp.moveaxis(prevs, 0, 1).reshape(B, D)


# -------------------------------------------------------------- pallas

def _tpose_perm(x, bits, perm_oh):
    """Exact [A, L] -> [L, A] transpose with column reorder folded in:
    out[l, j] = x[perm(j), l], via 8-bit-plane matmuls against the
    one-hot ``perm_oh [A, A]`` (perm_oh[k, j] = 1 iff k == perm(j))."""
    out = None
    for p in range(_cdiv(bits, 8)):
        plane = ((x >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
        r = jax.lax.dot_general(
            plane, perm_oh, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        out = r << (8 * p) if out is None else out | (r << (8 * p))
    return out


def _arms(B, BR, wa, wb):
    """Near-window arms: nearest exact 8-byte / u32 predecessor within
    the query's row plus the previous row of the chunk.

    Orientation matters enormously on Mosaic: sources ride SUBLANES
    (as per-block transposed columns), queries ride LANES, so every
    compare is [B, 128(s), 128(q)] — B full (128,128) tiles per op —
    and the max-over-sources reduction lands the result directly in
    row layout (no result transposes).  The first formulation put the
    batch dim in the middle ([q, B, s]) and measured 22.8 ms/MB: each
    op decomposed into 128 tiny [16,128] slices."""
    sub_s = jax.lax.broadcasted_iota(jnp.int32, (1, LANE, 1), 1)
    lane_q = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANE), 2)
    wa_f = wa.reshape(BR, LANE)
    wb_f = wb.reshape(BR, LANE)
    waT = _tpose(wa_f, 32)                             # [LANE, BR]
    wbT = _tpose(wb_f, 32)

    def col(T, b, r):
        # per-block source column [128(s), 1] at flat row b*CROWS+r
        return T[:, b * CROWS + r:b * CROWS + r + 1]

    def cols(T, r):
        return jnp.stack([col(T, b, r) for b in range(B)], axis=0)

    sa_cols = [cols(waT, r) for r in range(CROWS)]     # [B, 128, 1]
    sb_cols = [cols(wbT, r) for r in range(CROWS)]
    m4_rows = []
    m8_rows = []
    for qr in range(CROWS):
        Qa = wa[:, qr, :][:, None, :]                  # [B, 1, 128]
        Qb = wb[:, qr, :][:, None, :]
        m4q = jnp.full((B, LANE), -1, jnp.int32)
        m8q = jnp.full((B, LANE), -1, jnp.int32)
        for sr in ([qr - 1] if qr else []) + [qr]:
            eqa = sa_cols[sr] == Qa                    # [B, 128s, 128q]
            eqb = sb_cols[sr] == Qb
            if sr == qr:
                eqa = eqa & (sub_s < lane_q)
            spos = sr * LANE + jnp.broadcast_to(sub_s, eqa.shape)
            m4q = jnp.maximum(m4q, jnp.max(
                jnp.where(eqa, spos, -1), axis=1))
            m8q = jnp.maximum(m8q, jnp.max(
                jnp.where(eqa & eqb, spos, -1), axis=1))
        m4_rows.append(m4q)                            # [B, 128] rows
        m8_rows.append(m8q)
    return m4_rows, m8_rows


def _tpose(x, bits):
    """Exact [A, L] -> [L, A] transpose via 8-bit-plane identity
    matmuls (f32 MXU matmuls round through bf16 on silicon)."""
    A = x.shape[0]
    eye = (jax.lax.broadcasted_iota(jnp.int32, (A, A), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (A, A), 1)
           ).astype(jnp.bfloat16)
    return _tpose_perm(x, bits, eye)


def _hash_kernel(B, D, pos_planes, *refs):
    (wa_ref, wb_ref, h4_ref, h8_ref, prev_ref,
     t4p_scr, t4w_scr, t8p_scr, t8w_scr) = refs
    c = pl.program_id(0)
    BR = B * CROWS
    # tools/probe_hash.py: strip phases to attribute on-chip cost
    _strip = os.environ.get("LZ4NET_HASH_PROBE", "")
    parts = {"ap", "probe", "update"}
    if _strip == "empty":
        parts = set()
    elif _strip.startswith("no"):
        parts.discard(_strip[2:])

    @pl.when(c == 0)
    def _():
        z = jnp.zeros((B, NBROWS, LANE), jnp.int32)
        t4p_scr[:, :, :] = z
        t4w_scr[:, :, :] = z
        t8p_scr[:, :, :] = z
        t8w_scr[:, :, :] = z

    wa = wa_ref[0]                                    # [B, CROWS, LANE]
    wb = wb_ref[0]
    h4 = h4_ref[0]
    h8 = h8_ref[0]

    if "ap" not in parts:               # probe-tool stripped variant
        m4_rows = [jnp.full((B, LANE), -1, jnp.int32)] * CROWS
        m8_rows = m4_rows
    else:
        m4_rows, m8_rows = _arms(B, BR, wa, wb)

    # ---- table probes (pre-update): select-loop over table rows ----
    # all operands flattened to [B*CROWS, LANE]: Mosaic's
    # take_along_axis supports 2D only
    def probe(tp_scr, tw_scr, h):
        # per (table-row, chunk-row) passes on [B, 128] operands — one
        # full tile per op, no repeat copies, 2D takes only (Mosaic's
        # take_along_axis is 2D-only and lane-local)
        tcs = []
        tws = []
        for cr in range(CROWS):
            hr = h[:, cr, :]
            hrow = hr >> 7
            hlane = hr & (LANE - 1)
            tc = jnp.zeros((B, LANE), jnp.int32)
            tw = jnp.zeros((B, LANE), jnp.int32)
            for r in range(NBROWS):
                sel = hrow == r
                tc = jnp.where(sel, _take_lane(tp_scr[:, r, :], hlane),
                               tc)
                tw = jnp.where(sel, _take_lane(tw_scr[:, r, :], hlane),
                               tw)
            tcs.append(tc)
            tws.append(tw)
        shaped = jnp.stack(tcs, axis=1)               # [B, CROWS, LANE]
        ok = (shaped > 0) & (jnp.stack(tws, axis=1) == wa)
        return shaped, ok

    if "probe" in parts:
        t4c, t4ok = probe(t4p_scr, t4w_scr, h4)
        t8c, t8ok = probe(t8p_scr, t8w_scr, h8)
    else:
        t4c = t8c = jnp.zeros((B, CROWS, LANE), jnp.int32)
        t4ok = t8ok = t4c > 0

    # ---- combine + write, one row at a time (static row index) -----
    cbase = c * CHUNK
    for qr in range(CROWS):
        prev_row = jnp.where(
            m8_rows[qr] >= 0, cbase + m8_rows[qr],
            jnp.where(t8ok[:, qr, :], t8c[:, qr, :] - 1,
                      jnp.where(m4_rows[qr] >= 0, cbase + m4_rows[qr],
                                jnp.where(t4ok[:, qr, :],
                                          t4c[:, qr, :] - 1, -1))))
        prev_ref[0, :, qr, :] = prev_row

    # ---- count-guarded table updates (batched one-hot matmuls) -----
    def upd(tp_scr, tw_scr, h):
        cnt = jnp.zeros((B, NBROWS, LANE), jnp.float32)
        accp = [jnp.zeros((B, NBROWS, LANE), jnp.float32)
                for _ in range(pos_planes)]
        accw = [jnp.zeros((B, NBROWS, LANE), jnp.float32)
                for _ in range(4)]
        for r in range(CROWS):
            hr = h[:, r, :]                           # [B, 128]
            # a[b, row, i]: contributor i of row r lands in table row
            a = ((hr >> 7)[:, None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (B, NBROWS, 1), 1)).astype(jnp.bfloat16)
            # ohl[b, i, lane]: contributor i lands in table lane
            ohl = ((hr & (LANE - 1))[:, :, None]
                   == jax.lax.broadcasted_iota(
                       jnp.int32, (B, LANE, LANE), 2)
                   ).astype(jnp.bfloat16)

            def bdot(lhs):
                return jax.lax.dot_general(
                    lhs, ohl,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)

            cnt = cnt + bdot(a)
            vpos = (cbase + r * LANE + 1
                    + jax.lax.broadcasted_iota(jnp.int32, (B, LANE), 1))
            for p in range(pos_planes):
                plane = ((vpos >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
                accp[p] = accp[p] + bdot(a * plane[:, None, :])
            war = wa[:, r, :]
            for p in range(4):
                plane = ((war >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
                accw[p] = accw[p] + bdot(a * plane[:, None, :])
        one = cnt == 1.0
        newp = jnp.zeros((B, NBROWS, LANE), jnp.int32)
        for p in range(pos_planes):
            newp = newp | ((accp[p].astype(jnp.int32) & 0xFF)
                           << (8 * p))
        neww = jnp.zeros((B, NBROWS, LANE), jnp.int32)
        for p in range(4):
            neww = neww | ((accw[p].astype(jnp.int32) & 0xFF)
                           << (8 * p))
        tp_scr[:, :, :] = jnp.where(one, newp, tp_scr[:, :, :])
        tw_scr[:, :, :] = jnp.where(one, neww, tw_scr[:, :, :])

    if "update" in parts:
        upd(t4p_scr, t4w_scr, h4)
        upd(t8p_scr, t8w_scr, h8)


def _bucket_prev_pallas(wa, wb, h4, h8, D: int):
    B = wa.shape[0]
    if B == 1:
        # Mosaic's gather lowering rejects [1, 128] lane shuffles (the
        # probe's take_along_axis); pad the batch and slice back
        pad = lambda v: jnp.concatenate([v, v], axis=0)
        return _bucket_prev_pallas(pad(wa), pad(wb), pad(h4), pad(h8),
                                   D)[:1]
    if B > MAXB:
        parts = [
            _bucket_prev_pallas(wa[i:i + MAXB], wb[i:i + MAXB],
                                h4[i:i + MAXB], h8[i:i + MAXB], D)
            for i in range(0, B, MAXB)]
        return jnp.concatenate(parts, axis=0)
    nch = D // CHUNK
    pos_planes = _cdiv(max((D + 1).bit_length(), 8), 8)
    kern = functools.partial(_hash_kernel, B, D, pos_planes)
    spec = pl.BlockSpec((1, B, CROWS, LANE), lambda c: (c, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    prev = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((nch, B, CROWS, LANE), jnp.int32),
        grid=(nch,),
        in_specs=[spec] * 4,
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((B, NBROWS, LANE), jnp.int32)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*(jnp.moveaxis(v.reshape(B, nch, CROWS, LANE), 1, 0)
        for v in (wa, wb, h4, h8)))
    return jnp.moveaxis(prev, 0, 1).reshape(B, D)


def bucket_prev_impl(wa, wb, h4, h8, D: int):
    """prev[b, i] = two-tier hash-table candidate for position i (see
    module docstring), else -1.  Every candidate's u32 is verified.

    wa/wb: [B, D] int32 u32 words at i and i+4; h4/h8: [B, D] int32
    bucket ids (see ``hash_bucket``/``hash_bucket8``); D % 512 == 0.

    Dispatch: the Mosaic kernel on real TPU, the semantically identical
    XLA scan on CPU.  Override with LZ4NET_HASH_IMPL=scan|pallas.
    """
    impl = os.environ.get("LZ4NET_HASH_IMPL")
    if impl == "scan" or (impl != "pallas" and _interpret()):
        return _bucket_prev_scan(wa, wb, h4, h8, D)
    return _bucket_prev_pallas(wa, wb, h4, h8, D)


bucket_prev = functools.partial(jax.jit, static_argnames=("D",))(
    bucket_prev_impl)



# ------------------------------------------------- HC candidate tables
#
# The reference HC search walks a 4-byte-hash chain of up to
# `hc_level_attempts` previous positions keeping the longest match
# (`/root/reference/original/lz4hc.c:358-460`: HashTable + ChainTable).
# The TPU formulation replaces the sequential walk with WIDE-PREFIX
# bucket tables — an occurrence sharing a 12/16/32-byte prefix hash is
# overwhelmingly a long match, so "widest prefix table that hits" is a
# strong stand-in for "longest match on the chain" — plus a STICKY
# 8-byte table ("first writer wins") standing in for the far end of
# the chain (the deepest occurrence the walk can reach), plus three
# small BYTE-RUN tables (run-start positions keyed by byte value and a
# minimum-run tier) covering the RLE field the prefix tables
# systematically lose (a run's first byte only matches an EARLIER run
# start).  Rounds 3-4 answered these queries with corpus-wide stable
# sorts (`encode_vector._prev_occurrence` per tier, ~4-5 ms each on
# chip); the tables below run in one Mosaic kernel with the same
# count-guarded sum-scatter update as the fast-mode tables above.
#
# Candidates are u32-verified in-kernel (stored word == query word);
# bytes past 4 are NOT content-verified (hash-trusted), so callers
# must evaluate true lengths with claim=False.  Sticky tables keep
# their FIRST committed entry: buckets hit more than once in their
# first chunk stay poisoned (0) for that chunk and take the next
# chunk's single writer — a bounded approximation of
# `_first_occurrence`.

MIX12 = np.int32(-1028477387)    # odd mixers for wide-prefix keys
MIX16 = np.int32(-1640531527)
MIX32 = np.int32(-2048144789)
RUN_ROWS = 8                     # byte-run tables: 768 keys -> 8 rows


def hash_fold(words, mix):
    """Bucket id of a wide prefix: fold words with an odd mixer, then
    the reference's multiplicative hash onto NB buckets."""
    h = words[0]
    for w in words[1:]:
        h = (h * mix) ^ w
    return hash_bucket(h)


def _hc_tables_scan(wa, hs, sticky, nrows, D: int):
    """XLA-scan implementation of the HC tables (CPU/test path).

    wa: [B, D] u32 words (verification values); hs: tuple of [B, D]
    bucket-id streams, one table each; sticky[t]: first-writer-wins;
    nrows[t]: table size in 128-lane rows.  Returns per-table
    candidate streams [B, D] (position or -1), probed pre-update."""
    B = wa.shape[0]
    nch = D // CHUNK
    nt = len(hs)

    def chunked(x):
        return jnp.moveaxis(x.reshape(B, nch, CROWS, LANE), 1, 0)

    xs = tuple(chunked(v) for v in (wa,) + tuple(hs))

    def step(carry, xc):
        tabs, cbase = carry
        wa_c = xc[0]
        cands = []
        new_tabs = []
        val_pos = (cbase.reshape(1, 1)
                   + jnp.arange(CHUNK, dtype=jnp.int32)[None, :] + 1)
        for t in range(nt):
            h_c = xc[1 + t]
            tp, tw = tabs[t]
            nb_t = nrows[t] * LANE
            hf = jnp.clip(h_c.reshape(B, CHUNK), 0, nb_t - 1)
            c = jnp.take_along_axis(tp, hf, axis=-1).reshape(h_c.shape)
            w = jnp.take_along_axis(tw, hf, axis=-1).reshape(h_c.shape)
            ok = (c > 0) & (w == wa_c)
            cands.append(jnp.where(ok, c - 1, -1))
            # count-guarded update (same einsum scheme as fast tables)
            rr = jnp.arange(nrows[t], dtype=jnp.int32) + (hf[0, :1] & 0)
            ll = jnp.arange(LANE, dtype=jnp.int32) + (hf[0, :1] & 0)
            A = ((hf >> 7)[:, :, None]
                 == rr[None, None, :]).astype(jnp.float32)
            O = ((hf & (LANE - 1))[:, :, None]
                 == ll[None, None, :]).astype(jnp.float32)
            cnt = jnp.einsum("bkr,bkl->brl", A, O,
                             precision="highest").reshape(B, nb_t)
            sp = jnp.einsum(
                "bkr,bkl->brl",
                A * jnp.broadcast_to(val_pos, (B, CHUNK)
                                     ).astype(jnp.float32)[:, :, None],
                O, precision="highest").reshape(B, nb_t)
            sw_acc = jnp.zeros((B, nb_t), jnp.int32)
            waf = wa_c.reshape(B, CHUNK)
            for p in range(4):
                plane = ((waf >> (8 * p)) & 0xFF).astype(jnp.float32)
                sw_acc = sw_acc | ((jnp.einsum(
                    "bkr,bkl->brl", A * plane[:, :, None], O,
                    precision="highest").reshape(B, nb_t).astype(jnp.int32)
                    & 0xFF) << (8 * p))
            one = cnt == 1
            if sticky[t]:
                one = one & (tp == 0)
            new_tabs.append((jnp.where(one, sp.astype(jnp.int32), tp),
                             jnp.where(one, sw_acc, tw)))
        return (tuple(new_tabs), cbase + CHUNK), tuple(cands)

    tabs0 = tuple(
        (jnp.broadcast_to(wa[:, :1] & 0, (B, nrows[t] * LANE)),) * 2
        for t in range(nt))
    cbase0 = wa[0, :1] & 0
    _, cands = jax.lax.scan(step, (tabs0, cbase0), xs)
    return tuple(jnp.moveaxis(cv, 0, 1).reshape(B, D) for cv in cands)


def _hc_kernel(B, D, pos_planes, nt, sticky, nrows, *refs):
    wa_ref = refs[0]
    h_refs = refs[1:1 + nt]
    cand_refs = refs[1 + nt:1 + 2 * nt]
    scr = refs[1 + 2 * nt:]                 # (tp, tw) per table
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        for t in range(nt):
            z = jnp.zeros((B, nrows[t], LANE), jnp.int32)
            scr[2 * t][:, :, :] = z
            scr[2 * t + 1][:, :, :] = z

    wa = wa_ref[0]                          # [B, CROWS, LANE]
    cbase = c * CHUNK

    for t in range(nt):
        h = h_refs[t][0]
        tp_scr, tw_scr = scr[2 * t], scr[2 * t + 1]
        nr = nrows[t]
        # probe pre-update: select-loop over table rows, 2D takes
        for cr in range(CROWS):
            hr = h[:, cr, :]
            hrow = hr >> 7
            hlane = hr & (LANE - 1)
            tc = jnp.zeros((B, LANE), jnp.int32)
            tw = jnp.zeros((B, LANE), jnp.int32)
            for r in range(nr):
                sel = hrow == r
                tc = jnp.where(sel, _take_lane(tp_scr[:, r, :], hlane),
                               tc)
                tw = jnp.where(sel, _take_lane(tw_scr[:, r, :], hlane),
                               tw)
            ok = (tc > 0) & (tw == wa[:, cr, :])
            cand_refs[t][0, :, cr, :] = jnp.where(ok, tc - 1, -1)
        # count-guarded update (batched one-hot matmuls)
        cnt = jnp.zeros((B, nr, LANE), jnp.float32)
        accp = [jnp.zeros((B, nr, LANE), jnp.float32)
                for _ in range(pos_planes)]
        accw = [jnp.zeros((B, nr, LANE), jnp.float32)
                for _ in range(4)]
        for r in range(CROWS):
            hr = h[:, r, :]
            a = ((hr >> 7)[:, None, :] == jax.lax.broadcasted_iota(
                jnp.int32, (B, nr, 1), 1)).astype(jnp.bfloat16)
            ohl = ((hr & (LANE - 1))[:, :, None]
                   == jax.lax.broadcasted_iota(
                       jnp.int32, (B, LANE, LANE), 2)).astype(jnp.bfloat16)

            def bdot(lhs):
                return jax.lax.dot_general(
                    lhs, ohl,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)

            cnt = cnt + bdot(a)
            vpos = (cbase + r * LANE + 1
                    + jax.lax.broadcasted_iota(jnp.int32, (B, LANE), 1))
            for p in range(pos_planes):
                plane = ((vpos >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
                accp[p] = accp[p] + bdot(a * plane[:, None, :])
            war = wa[:, r, :]
            for p in range(4):
                plane = ((war >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
                accw[p] = accw[p] + bdot(a * plane[:, None, :])
        one = cnt == 1.0
        newp = jnp.zeros((B, nr, LANE), jnp.int32)
        for p in range(pos_planes):
            newp = newp | ((accp[p].astype(jnp.int32) & 0xFF) << (8 * p))
        neww = jnp.zeros((B, nr, LANE), jnp.int32)
        for p in range(4):
            neww = neww | ((accw[p].astype(jnp.int32) & 0xFF) << (8 * p))
        if sticky[t]:
            one = one & (tp_scr[:, :, :] == 0)
        tp_scr[:, :, :] = jnp.where(one, newp, tp_scr[:, :, :])
        tw_scr[:, :, :] = jnp.where(one, neww, tw_scr[:, :, :])


def _hc_tables_pallas(wa, hs, sticky, nrows, D: int):
    B = wa.shape[0]
    nt = len(hs)
    if B == 1:
        pad = lambda v: jnp.concatenate([v, v], axis=0)
        return tuple(
            r[:1] for r in _hc_tables_pallas(
                pad(wa), tuple(pad(h) for h in hs), sticky, nrows, D))
    if B > MAXB:
        parts = [
            _hc_tables_pallas(wa[i:i + MAXB],
                              tuple(h[i:i + MAXB] for h in hs),
                              sticky, nrows, D)
            for i in range(0, B, MAXB)]
        return tuple(jnp.concatenate([p[t] for p in parts], axis=0)
                     for t in range(nt))
    nch = D // CHUNK
    pos_planes = _cdiv(max((D + 1).bit_length(), 8), 8)
    kern = functools.partial(_hc_kernel, B, D, pos_planes, nt,
                             tuple(sticky), tuple(nrows))
    spec = pl.BlockSpec((1, B, CROWS, LANE), lambda c: (c, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    scratch = []
    for t in range(nt):
        scratch += [pltpu.VMEM((B, nrows[t], LANE), jnp.int32)] * 2
    cands = pl.pallas_call(
        kern,
        out_shape=tuple(
            jax.ShapeDtypeStruct((nch, B, CROWS, LANE), jnp.int32)
            for _ in range(nt)),
        grid=(nch,),
        in_specs=[spec] * (1 + nt),
        out_specs=tuple([spec] * nt),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=_interpret(),
    )(*((jnp.moveaxis(v.reshape(B, nch, CROWS, LANE), 1, 0)
         for v in (wa,) + tuple(hs))))
    return tuple(jnp.moveaxis(cv, 0, 1).reshape(B, D) for cv in cands)


def hc_tables(wa, hs, sticky, nrows, D: int):
    """Probe-then-update bucket tables over position streams (see
    module comment above).  Dispatch mirrors ``bucket_prev_impl``."""
    impl = os.environ.get("LZ4NET_HASH_IMPL")
    if impl == "scan" or (impl != "pallas" and _interpret()):
        return _hc_tables_scan(wa, hs, sticky, nrows, D)
    return _hc_tables_pallas(wa, hs, sticky, nrows, D)


def hc_candidates(x, wa, wb, is_rs, run_fwd, D: int, tables=None):
    """HC candidate streams from one fused table pass.

    Returns (deep, first, runs) — ``deep`` [B, D] is the widest-prefix
    table hit (32B > 16B > 12B bucket tables, count-guarded latest
    entry), ``first`` the sticky 8-byte table (the far end of the
    reference's chain walk), ``runs`` a list of three byte-run
    candidate streams (min-run tiers 4/16/64; writers and queries are
    run starts with at least the tier's run length).  All streams are
    position-or--1 and u32-verified in-kernel; bytes past 4 are
    hash-trusted, so evaluate ``deep``/``first`` with claim=False.
    Run candidates carry a content GUARANTEE from the u32 verify: the
    candidate starts >= 4 bytes of the same byte value, so
    min(run_fwd[i], run_fwd[cand]) is a valid match-length lower
    bound (the analytic injection in the HC parse)."""
    def sh(nbytes):
        return jnp.concatenate(
            [x[:, nbytes:], jnp.zeros_like(x[:, :nbytes])], axis=1)
    w8, w12 = _u32_of(sh(8)), _u32_of(sh(12))
    w16, w20 = _u32_of(sh(16)), _u32_of(sh(20))
    w24, w28 = _u32_of(sh(24)), _u32_of(sh(28))
    h12 = hash_fold((wa, wb, w8), MIX12)
    h16 = hash_fold((wa, wb, w8, w12), MIX16)
    h32 = hash_fold((wa, wb, w8, w12, w16, w20, w24, w28), MIX32)
    h8s = hash_bucket8(wa, wb)
    DUMP = np.int32(RUN_ROWS * LANE - 1)     # poisoned catch-all bucket
    run_hs = tuple(
        jnp.where(is_rs & (run_fwd >= mr), x + np.int32(256 * ti),
                  DUMP)
        for ti, mr in enumerate((4, 16, 64)))
    # table-set selection (callers pass ``tables``; the env knob is
    # the tools/probe_encode.py A/B override): e.g.
    # LZ4NET_HC_TABLES=12,32,s8,runs drops the 16B tier
    sel = os.environ.get("LZ4NET_HC_TABLES",
                         tables or "12,16,32,s8,runs")
    want = [w.strip() for w in sel.split(",") if w.strip()]
    spec = {"12": (h12, False, NBROWS), "16": (h16, False, NBROWS),
            "32": (h32, False, NBROWS), "s8": (h8s, True, NBROWS)}
    names = [w for w in want if w in spec]
    hs = tuple(spec[w][0] for w in names)
    sticky = tuple(spec[w][1] for w in names)
    nrows = tuple(spec[w][2] for w in names)
    use_runs = "runs" in want
    if use_runs:
        hs += run_hs
        sticky += (False, False, False)
        nrows += (RUN_ROWS, RUN_ROWS, RUN_ROWS)
    out = hc_tables(wa, hs, sticky, nrows, D)
    by = dict(zip(names, out))
    none = jnp.full_like(wa, -1)
    deep = none
    for w in ("12", "16", "32"):        # widest prefix wins
        if w in by:
            deep = jnp.where(by[w] >= 0, by[w], deep)
    runs = list(out[len(names):]) if use_runs else [none, none, none]
    return deep, by.get("s8", none), runs


def _u32_of(x):
    b1 = jnp.concatenate([x[:, 1:], jnp.zeros_like(x[:, :1])], axis=1)
    b2 = jnp.concatenate([x[:, 2:], jnp.zeros_like(x[:, :2])], axis=1)
    b3 = jnp.concatenate([x[:, 3:], jnp.zeros_like(x[:, :3])], axis=1)
    return x | (b1 << 8) | (b2 << 16) | (b3 << 24)
