"""Per-block hash-table candidate search (batched XLA scan).

The reference's match finder is a hash table: ``HashTable[hash(u32 at
position)] = most recent position``, probed then updated per position
(`/root/reference/original/lz4.c:248,345-520`; the <64 KB
specialisation uses an 8192-bucket table, `HASH64K_LOG=13`,
`src/LZ4ps/LZ4Codec.cs:63`).  Rounds 1-3 answered the same query with
corpus-wide stable sorts (`encode_vector._prev_occurrence`) — exact but
~2.8 ms per sort on chip, the dominant encode cost (PROFILE_r03.md).

This module reproduces the reference's data structure TPU-style, at two
prefix widths (the sort pipeline's prev4/prev8 tiers: an 8-byte-prefix
occurrence usually heads a longer match, worth preferring even when a
4-byte occurrence is nearer).  For every position i it returns the
first hit in priority order:

    1. nearest j in [chunk_start(i), i) with 8 bytes equal
    2. the 8-byte table's entry for bucket8(i), if its u32 matches
    3. nearest j in [chunk_start(i), i) with u32[j] == u32[i]
    4. the 4-byte table's entry for bucket4(i), if its u32 matches

else -1.  Both tables are 8 K-bucket and live in the carry of ONE
`lax.scan` over 256-position chunks, batched over every block at once —
XLA keeps the [B, 8192] tables on-chip across steps.  Per step:

* chunk-internal arms: [B, 256, 256] all-pairs equality on the actual
  words (exact, so candidates are pre-verified);
* table probes: one `take_along_axis` per table field;
* table updates: factored one-hot einsums over exact 8-bit bf16 planes
  (bucket row one-hot x bucket lane one-hot) — ``is_last``
  (chunk-internal last occurrence per bucket) guarantees at most one
  contributor per bucket, so the sum-scatter is exact.  Every entry
  carries its position's u32, so table candidates are verified >= 4-byte
  matches before being returned.  (Arm 2 may rarely be a 4-byte-only
  match via a bucket8 collision; extension computes true lengths, so
  only candidate quality is affected.)

A pure-XLA scan rather than a Pallas kernel by design: every op here is
layout-friendly (broadcast compares, lane-local takes, plane matmuls),
the scan carry already pins the tables to VMEM, and identical
CPU-vs-TPU semantics remove the Mosaic-divergence risk class that cost
rounds 1-2 (no mod-128 takes, no f32-matmul rounding — planes are bf16
exact).

Why chunked at all: the chunk-internal arms skip colliders with exact
byte compares; this structure inserts EVERY position, so its collision
stream is denser than the reference's skip-accelerated insert order (a
strict single-slot per-position replay measured 0.15% WORSE ratio than
the reference on the silesia-like corpus).
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
CROWS = 2                  # chunk = CROWS x 128 positions
CHUNK = CROWS * LANE
NBROWS = 64                # 8192 buckets = the reference's 64K table
NB = NBROWS * LANE
# numpy scalars, NOT jnp: a module-level jnp scalar is a committed
# device array; traces that close over it lift it to a runtime
# parameter, and jax 0.9's pjit re-execution fastpath then drops such
# params ("Execution supplied 2 buffers but compiled program expected
# 4" once several static variants of the caller are compiled)
HASH_MUL = np.int32(-1640531535)         # 2654435761 as int32
MIX8 = np.int32(-1262405129)             # odd mixer for the 8-byte key


def hash_bucket(w):
    """The reference's multiplicative hash onto NB buckets
    (`original/lz4.c:248`: (x * 2654435761) >> (32 - HASH64K_LOG))."""
    return ((w * HASH_MUL) >> (32 - 13)) & (NB - 1)


def hash_bucket8(wa, wb):
    """Bucket of the 8-byte prefix (wa = u32 at i, wb = u32 at i+4)."""
    return hash_bucket(wa ^ (wb * MIX8))


def _scatter_last(table_fields, h, is_last, fields_bits, B, ar):
    """tables[b, bucket] <- field value of the chunk's last same-bucket
    position.  Factored one-hot einsum per 8-bit plane; exact because
    ``is_last`` leaves at most one contributor per bucket.  ``ar`` is a
    TRACED arange (see bucket_prev_impl: large constant index tensors
    must never appear in the jaxpr)."""
    hrow = (h >> 7).astype(jnp.int32)
    hlane = h & (LANE - 1)
    a = ((hrow[:, None, :] == ar[None, :NBROWS, None])
         & is_last[:, None, :]).astype(jnp.bfloat16)
    ohl = ((hlane[:, :, None] == ar[None, None, :LANE])
           & is_last[:, :, None]).astype(jnp.bfloat16)
    out = []
    for field, bits in fields_bits:
        acc = jnp.zeros((B, NBROWS, LANE), jnp.int32)
        for p in range(-(-bits // 8)):
            plane = ((field >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
            r = jnp.einsum("brc,bcl->brl", a * plane[:, None, :], ohl,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.int32)
            acc = acc | ((r & 0xFF) << (8 * p))
        out.append(acc.reshape(B, NB))
    upd = out[0] > 0                      # field 0 is pos+1: 0 = empty
    return [jnp.where(upd, n, o) for n, o in zip(out, table_fields)]


def _bucket_prev_scan(wa, wb, h4, h8, D: int):
    """XLA-scan implementation (CPU / test path; see bucket_prev_impl)."""
    B = wa.shape[0]
    nch = D // CHUNK

    def chunked(x):
        return jnp.moveaxis(x.reshape(B, nch, CHUNK), 1, 0)

    xs = tuple(chunked(v) for v in (wa, wb, h4, h8))

    def step(carry, xc):
        t4p, t4w, t8p, t8w, cbase = carry
        wa_c, wb_c, h4_c, h8_c = xc
        # TRACED arange: jnp index tensors built from static shapes are
        # evaluated eagerly into jaxpr CONSTANTS; at [256, 256] sizes
        # XLA lifts them to runtime buffers and jax's re-execution
        # fastpath then under-supplies them ("Execution supplied 2
        # buffers but compiled program expected 4").  Adding a traced
        # zero keeps every index tensor a real HLO op.
        ar = jnp.arange(CHUNK, dtype=jnp.int32) + (wa_c[0, :1] & 0)
        q_i = ar[None, :, None]
        s_i = ar[None, None, :]
        lt = s_i < q_i
        gt = q_i > s_i

        # chunk-internal arms: exact all-pairs on the words
        eqwa = wa_c[:, :, None] == wa_c[:, None, :]       # [B, q, s]
        m4 = jnp.max(jnp.where(eqwa & lt, s_i, -1), axis=2)
        eq8w = eqwa & (wb_c[:, :, None] == wb_c[:, None, :])
        m8 = jnp.max(jnp.where(eq8w & lt, s_i, -1), axis=2)
        eq4 = h4_c[:, :, None] == h4_c[:, None, :]
        eq8 = h8_c[:, :, None] == h8_c[:, None, :]
        il4 = ~jnp.any(eq4 & gt, axis=1)   # last of bucket in chunk
        il8 = ~jnp.any(eq8 & gt, axis=1)

        # table probes (pre-update state)
        t4c = jnp.take_along_axis(t4p, h4_c, axis=-1)
        t4ok = (t4c > 0) & (jnp.take_along_axis(t4w, h4_c, axis=-1)
                            == wa_c)
        t8c = jnp.take_along_axis(t8p, h8_c, axis=-1)
        t8ok = (t8c > 0) & (jnp.take_along_axis(t8w, h8_c, axis=-1)
                            == wa_c)

        prev = jnp.where(
            m8 >= 0, cbase + m8,
            jnp.where(t8ok, t8c - 1,
                      jnp.where(m4 >= 0, cbase + m4,
                                jnp.where(t4ok, t4c - 1, -1))))

        # table updates
        val_pos = jnp.broadcast_to(
            (cbase[:, None] + ar[None, :] + 1), (B, CHUNK))
        pos_bits = (D + 1).bit_length()
        t4p, t4w = _scatter_last(
            [t4p, t4w], h4_c, il4,
            [(val_pos, pos_bits), (wa_c, 32)], B, ar)
        t8p, t8w = _scatter_last(
            [t8p, t8w], h8_c, il8,
            [(val_pos, pos_bits), (wa_c, 32)], B, ar)
        return (t4p, t4w, t8p, t8w, cbase + CHUNK), prev

    # traced zero inits: a concrete [B, NB] zeros constant would be
    # lifted to a runtime buffer and dropped by jax's re-execution
    # fastpath (see ``ar`` note in step)
    z = jnp.broadcast_to(wa[:, :1] & 0, (B, NB))
    cbase0 = wa[0, :1] & 0
    (_, _, _, _, _), prevs = jax.lax.scan(
        step, (z, z, z, z, cbase0), xs)
    return jnp.moveaxis(prevs, 0, 1).reshape(B, D)


# ---- Mosaic kernel (silicon path) ---------------------------------------
# Identical semantics to _bucket_prev_scan, but the whole chunk loop
# runs INSIDE one Pallas kernel per block: the XLA scan emits ~20
# fusions per step and 288 steps per 64 KB block, and the measured
# launch overhead alone put device encode at 0.0048 GB/s.  Sub-patterns
# are the proven kernel forms: plane-matmul transposes (emit kernel),
# select-loop probes (resolver), factored one-hot matmul scatters.


def _tpose(x, bits):
    """Exact transpose of ``x [A, B]`` int32 (A, B <= 128) via 8-bit
    plane identity matmuls (f32 MXU rounds through bf16 on silicon, so
    int32 must move in exact <= 8-bit planes)."""
    A = x.shape[0]
    ident = (jax.lax.broadcasted_iota(jnp.int32, (A, A), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (A, A), 1)
             ).astype(jnp.bfloat16)
    out = None
    for p in range(_cdiv(bits, 8)):
        plane = ((x >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
        r = jax.lax.dot_general(
            plane, ident, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        out = r << (8 * p) if out is None else out | (r << (8 * p))
    return out


def _probe(tpos, twa, h, wa):
    """Select-loop table probe: (candidate pos+1, u32-verified)."""
    hrow = h >> 7
    hlane = h & (LANE - 1)
    tp = jnp.zeros((CROWS, LANE), jnp.int32)
    tw = jnp.zeros((CROWS, LANE), jnp.int32)
    for r in range(NBROWS):
        sel = hrow == r
        tp = jnp.where(sel, _take_lane(
            jnp.broadcast_to(tpos[r:r + 1, :], (CROWS, LANE)), hlane), tp)
        tw = jnp.where(sel, _take_lane(
            jnp.broadcast_to(twa[r:r + 1, :], (CROWS, LANE)), hlane), tw)
    return tp, (tp > 0) & (tw == wa)


def _hash_kernel(D, pos_planes, *refs):
    (wa_ref, wb_ref, h4_ref, h8_ref, prev_ref,
     t4p_scr, t4w_scr, t8p_scr, t8w_scr) = refs
    nch = D // CHUNK
    # tools/probe_hash.py: strip phases to attribute on-chip cost
    _strip = os.environ.get("LZ4NET_HASH_PROBE", "")
    parts = {"ap", "probe", "update"}
    if _strip == "empty":
        parts = set()
    elif _strip.startswith("no"):
        parts.discard(_strip[2:])

    lane_i = jax.lax.broadcasted_iota(jnp.int32, (CROWS, LANE), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (CROWS, LANE), 0)
    pos_rel = row_i * LANE + lane_i                       # 0..CHUNK-1
    sub_col = jax.lax.broadcasted_iota(jnp.int32, (LANE, 1), 0)
    lane_row = jax.lax.broadcasted_iota(jnp.int32, (1, LANE), 1)
    bucket_r = jax.lax.broadcasted_iota(jnp.int32, (NBROWS, LANE), 0)

    def update(acc_fields, h, is_last, fields_bits):
        """Factored one-hot MXU scatter of this chunk's last-per-bucket
        entries into the [NBROWS, LANE] tables; exact because
        ``is_last`` leaves at most one contributor per bucket."""
        hrow = h >> 7
        hlane = h & (LANE - 1)
        out = [jnp.zeros((NBROWS, LANE), jnp.int32) for _ in acc_fields]
        for g in range(CROWS):
            mrow = is_last[g:g + 1, :] > 0                # [1, 128]
            a = ((jnp.broadcast_to(hrow[g:g + 1, :], (NBROWS, LANE))
                  == bucket_r)
                 & jnp.broadcast_to(mrow, (NBROWS, LANE))
                 ).astype(jnp.bfloat16)
            # OHl[l, i] = contributor i lands in table lane l
            ohl = ((jnp.broadcast_to(hlane[g:g + 1, :], (LANE, LANE))
                    == sub_col)
                   & jnp.broadcast_to(mrow, (LANE, LANE))
                   ).astype(jnp.bfloat16)
            for fi, (field, bits) in enumerate(fields_bits):
                got = jnp.zeros((NBROWS, LANE), jnp.int32)
                for p in range(_cdiv(bits, 8)):
                    plane = ((field[g:g + 1, :] >> (8 * p)) & 0xFF
                             ).astype(jnp.bfloat16)
                    ap = a * jnp.broadcast_to(plane, (NBROWS, LANE))
                    r = jax.lax.dot_general(
                        ap, ohl,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32
                    ).astype(jnp.int32)
                    got = got | ((r & 0xFF) << (8 * p))
                out[fi] = out[fi] | got
        upd = out[0] > 0                  # field 0 is pos+1: 0 = empty
        return [jnp.where(upd, n, o) for n, o in zip(out, acc_fields)]

    def chunk_body(c, _):
        # tables live in SCRATCH refs, not loop carries: carrying four
        # [64,128] arrays as fori_loop values measured ~6 us/iteration
        # of pure overhead (28 ms/MB for an EMPTY loop —
        # tools/probe_hash.py); chunk c is its own aligned tile
        wa = wa_ref[0, c]                                 # [2,128]
        wb = wb_ref[0, c]
        h4 = h4_ref[0, c]
        h8 = h8_ref[0, c]

        if "ap" not in parts:              # probe-tool stripped variant
            m4r = m8r = jnp.full((CROWS, LANE), -1, jnp.int32)
            il4 = il8 = jnp.ones((CROWS, LANE), jnp.int32)
            return _tail(c, wa, h4, h8, m4r, m8r, il4, il8)

        # ---- chunk-internal arms: queries as columns, sources as rows
        waT = _tpose(wa, 32)
        wbT = _tpose(wb, 32)
        h4T = _tpose(h4, 16)
        h8T = _tpose(h8, 16)
        m4 = []                 # nearest same-u32 pos (exact bytes)
        m8 = []                 # nearest same-8-byte pos (exact bytes)
        # int32 0/1 masks: Mosaic rejects sublane-concatenated i1
        # vregs ("Invalid vector register cast" on bitcast_vreg i1->i32)
        hl4 = [jnp.zeros((1, LANE), jnp.int32) for _ in range(CROWS)]
        hl8 = [jnp.zeros((1, LANE), jnp.int32) for _ in range(CROWS)]
        for qr in range(CROWS):
            qpos = qr * LANE + sub_col                    # [128, 1]
            m4q = jnp.full((LANE, 1), -1, jnp.int32)
            m8q = jnp.full((LANE, 1), -1, jnp.int32)
            for sr in range(CROWS):
                spos = sr * LANE + lane_row               # [1, 128]
                eqwa = waT[:, qr:qr + 1] == wa[sr:sr + 1, :]
                eqwb = wbT[:, qr:qr + 1] == wb[sr:sr + 1, :]
                eq4 = h4T[:, qr:qr + 1] == h4[sr:sr + 1, :]
                eq8 = h8T[:, qr:qr + 1] == h8[sr:sr + 1, :]
                lt = jnp.broadcast_to(spos, (LANE, LANE)) < qpos
                gt = jnp.broadcast_to(qpos, (LANE, LANE)) > spos
                m4q = jnp.maximum(m4q, jnp.max(
                    jnp.where(eqwa & lt, spos, -1),
                    axis=1, keepdims=True))
                m8q = jnp.maximum(m8q, jnp.max(
                    jnp.where(eqwa & eqwb & lt, spos, -1),
                    axis=1, keepdims=True))
                # has_later[s] = any q > s with the same bucket (reduce
                # over the query/sublane axis) — the is_last inputs
                hl4[sr] = jnp.maximum(hl4[sr], jnp.max(
                    jnp.where(eq4 & gt, 1, 0), axis=0, keepdims=True))
                hl8[sr] = jnp.maximum(hl8[sr], jnp.max(
                    jnp.where(eq8 & gt, 1, 0), axis=0, keepdims=True))
            m4.append(m4q)
            m8.append(m8q)
        m4r = _tpose(jnp.concatenate(m4, axis=1) + 1, 16) - 1
        m8r = _tpose(jnp.concatenate(m8, axis=1) + 1, 16) - 1
        il4 = 1 - jnp.concatenate(hl4, axis=0)            # [CROWS, 128]
        il8 = 1 - jnp.concatenate(hl8, axis=0)
        return _tail(c, wa, h4, h8, m4r, m8r, il4, il8)

    def _tail(c, wa, h4, h8, m4r, m8r, il4, il8):
        t4p, t4w = t4p_scr[:, :], t4w_scr[:, :]
        t8p, t8w = t8p_scr[:, :], t8w_scr[:, :]
        # ---- table probes (before update)
        if "probe" in parts:
            t4c, t4ok = _probe(t4p, t4w, h4, wa)
            t8c, t8ok = _probe(t8p, t8w, h8, wa)
        else:
            t4c = t8c = jnp.zeros((CROWS, LANE), jnp.int32)
            t4ok = t8ok = t4c > 0

        prev = jnp.where(
            m8r >= 0, c * CHUNK + m8r,
            jnp.where(t8ok, t8c - 1,
                      jnp.where(m4r >= 0, c * CHUNK + m4r,
                                jnp.where(t4ok, t4c - 1, -1))))
        prev_ref[0, c] = prev

        # ---- table updates
        if "update" in parts:
            val_pos = c * CHUNK + pos_rel + 1
            n4p, n4w = update([t4p, t4w], h4, il4,
                              [(val_pos, 8 * pos_planes), (wa, 32)])
            n8p, n8w = update([t8p, t8w], h8, il8,
                              [(val_pos, 8 * pos_planes), (wa, 32)])
            t4p_scr[:, :] = n4p
            t4w_scr[:, :] = n4w
            t8p_scr[:, :] = n8p
            t8w_scr[:, :] = n8w
        return 0

    t4p_scr[:, :] = jnp.zeros((NBROWS, LANE), jnp.int32)
    t4w_scr[:, :] = jnp.zeros((NBROWS, LANE), jnp.int32)
    t8p_scr[:, :] = jnp.zeros((NBROWS, LANE), jnp.int32)
    t8w_scr[:, :] = jnp.zeros((NBROWS, LANE), jnp.int32)
    jax.lax.fori_loop(0, nch, chunk_body, 0)


def _bucket_prev_pallas(wa, wb, h4, h8, D: int):
    B = wa.shape[0]
    nch = D // CHUNK
    pos_planes = _cdiv(max((D + 1).bit_length(), 8), 8)
    kern = functools.partial(_hash_kernel, D, pos_planes)
    spec = pl.BlockSpec((1, nch, CROWS, LANE), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    prev = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, nch, CROWS, LANE), jnp.int32),
        grid=(B,),
        in_specs=[spec] * 4,
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((NBROWS, LANE), jnp.int32)] * 4,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(wa.reshape(B, nch, CROWS, LANE), wb.reshape(B, nch, CROWS, LANE),
      h4.reshape(B, nch, CROWS, LANE), h8.reshape(B, nch, CROWS, LANE))
    return prev.reshape(B, D)


def bucket_prev_impl(wa, wb, h4, h8, D: int):
    """prev[b, i] = two-tier hash-table candidate for position i (see
    module docstring), else -1.  Every candidate's u32 is verified.

    wa/wb: [B, D] int32 u32 words at i and i+4; h4/h8: [B, D] int32
    bucket ids (see ``hash_bucket``/``hash_bucket8``); D % 256 == 0.

    Dispatch: the Mosaic kernel on real TPU (one launch per batch); the
    semantically identical XLA scan on CPU, where Mosaic is unavailable
    and interpret-mode per-chunk dispatch would crawl.  Override with
    LZ4NET_HASH_IMPL=scan|pallas.  Cross-implementation agreement is
    asserted by tools/certify.py on silicon.
    """
    impl = os.environ.get("LZ4NET_HASH_IMPL")
    if impl == "scan" or (impl != "pallas" and _interpret()):
        return _bucket_prev_scan(wa, wb, h4, h8, D)
    return _bucket_prev_pallas(wa, wb, h4, h8, D)


bucket_prev = functools.partial(jax.jit, static_argnames=("D",))(
    bucket_prev_impl)
