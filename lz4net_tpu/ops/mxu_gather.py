"""Random-access gather routed through the MXU (two-level one-hot).

TPU has no hardware gather: XLA lowers `take_along_axis` to a scalarized
loop that we measured at ~0.1 Gelem/s on v5e — unusable for a codec whose
every phase is index chasing.  This primitive rebuilds gather out of the
two units the hardware is actually good at:

    out[k] = table[idx[k]]
           = sum_t  one_hot(idx[k] >> 7)[t] * (table_tiles[t] . one_hot(idx[k] & 127))

* stage 1 — tile select: ``one_hot(hi) @ table.reshape(T, 128)`` is a
  [K, T] x [T, 128] matmul (MXU, ~128 MACs per gathered element);
* stage 2 — lane select: elementwise multiply with ``one_hot(lo)`` and a
  128-lane row reduction (VPU).

Construction of the one-hots costs (T + 128) VPU compares per element —
~640 ops for a 64 K window vs 65 536 for a flat one-hot.  Estimated rate
~1 Gelem/s for byte-valued tables, an order of magnitude over XLA gather.

Exactness: bf16 carries integers up to 256 exactly, so byte tables use
bf16 (full MXU rate).  Wider integers (e.g. positions for pointer
doubling) are gathered per byte-plane and reassembled.

This is the building block for the round-2 vectorised decode/encode
pipeline (see ARCHITECTURE.md); kept standalone + tested now so kernels
can build on it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANE = 128


def _one_hot_bf16(idx, depth):
    """one_hot via broadcast compare (bf16 output for MXU consumption)."""
    iota = jax.lax.broadcasted_iota(jnp.int32, idx.shape + (depth,),
                                    idx.ndim)
    return (idx[..., None] == iota).astype(jnp.bfloat16)


def gather_bytes(table, idx, chunk: int = 2048):
    """Gather byte values (0..255): out[..., k] = table[..., idx[..., k]].

    table: [..., N] int32 byte values, N a multiple of 128.
    idx:   [..., K] int32 indices into the last axis of ``table``.
    Returns [..., K] int32.

    Out-of-range indices must be pre-clamped by the caller.
    """
    n = table.shape[-1]
    assert n % LANE == 0, n
    tiles = n // LANE
    tbl = table.reshape(table.shape[:-1] + (tiles, LANE)).astype(jnp.bfloat16)

    k = idx.shape[-1]
    pad = (-k) % chunk
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.zeros(idx.shape[:-1] + (pad,), idx.dtype)], axis=-1)
    nchunks = idx.shape[-1] // chunk
    idx_c = idx.reshape(idx.shape[:-1] + (nchunks, chunk))

    def per_chunk(c):
        ix = idx_c[..., c, :]
        hi = ix >> 7
        lo = ix & (LANE - 1)
        oh_hi = _one_hot_bf16(hi, tiles)              # [..., chunk, tiles]
        rows = jnp.einsum("...ct,...tl->...cl", oh_hi, tbl,
                          preferred_element_type=jnp.float32)
        oh_lo = _one_hot_bf16(lo, LANE).astype(jnp.float32)
        return jnp.sum(rows * oh_lo, axis=-1)         # [..., chunk]

    out = jax.lax.map(per_chunk, jnp.arange(nchunks))
    # lax.map stacks on axis 0: [nchunks, ..., chunk] -> [..., K]
    out = jnp.moveaxis(out, 0, -2).reshape(idx.shape[:-1] + (-1,))
    out = out[..., :k] if pad else out
    return out.astype(jnp.int32)


def gather_i32(table, idx, bits: int = 24, chunk: int = 2048):
    """Gather wider integers (< 2^bits) by byte planes.

    Used for position/index tables (e.g. pointer doubling over a 64 K
    window needs 17-bit values)."""
    nbytes = (bits + 7) // 8
    out = jnp.zeros(idx.shape, jnp.int32)
    for plane in range(nbytes):
        vals = gather_bytes((table >> (8 * plane)) & 0xFF, idx, chunk)
        out = out | (vals << (8 * plane))
    return out


@functools.partial(jax.jit, static_argnames=("chunk",))
def gather_bytes_jit(table, idx, chunk: int = 2048):
    return gather_bytes(table, idx, chunk)
