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

import jax
import jax.numpy as jnp
import numpy as np

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


def bucket_prev_impl(wa, wb, h4, h8, D: int):
    """prev[b, i] = two-tier hash-table candidate for position i (see
    module docstring), else -1.  Every candidate's u32 is verified.

    wa/wb: [B, D] int32 u32 words at i and i+4; h4/h8: [B, D] int32
    bucket ids (see ``hash_bucket``/``hash_bucket8``); D % 256 == 0.
    """
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


bucket_prev = functools.partial(jax.jit, static_argnames=("D",))(
    bucket_prev_impl)
