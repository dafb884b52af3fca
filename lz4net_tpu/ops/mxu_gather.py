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


def _gather_planes(planes, idx, chunk: int):
    """Core gather: planes [..., P, N] of byte values (exact in bf16),
    idx [..., K] -> [..., P, K] int32.  One one-hot construction serves all
    P planes (they ride as extra lanes in the stage-1 matmul)."""
    n = planes.shape[-1]
    p = planes.shape[-2]
    assert n % LANE == 0, n
    tiles = n // LANE
    # [..., tiles, P*LANE]: plane-major lane blocks per tile
    tbl = jnp.moveaxis(
        planes.reshape(planes.shape[:-2] + (p, tiles, LANE)), -3, -2)
    tbl = tbl.reshape(planes.shape[:-2] + (tiles, p * LANE)).astype(jnp.bfloat16)

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
        oh_lo = _one_hot_bf16(lo, LANE).astype(jnp.float32)
        tbl_p = tbl.reshape(tbl.shape[:-1] + (p, LANE))
        # one fused matmul+reduce per plane; a combined [*, chunk, P*LANE]
        # rows tensor defeats XLA's epilogue fusion (bandwidth-bound)
        outs = []
        for pi in range(p):
            rows = jnp.einsum("...ct,...tm->...cm", oh_hi, tbl_p[..., pi, :],
                              preferred_element_type=jnp.float32)
            outs.append(jnp.sum(rows * oh_lo, axis=-1))
        return jnp.stack(outs, axis=-1)               # [..., chunk, P]

    out = jax.lax.map(per_chunk, jnp.arange(nchunks))
    # [nchunks, ..., chunk, P] -> [..., P, K]
    out = jnp.moveaxis(out, 0, -3)
    out = out.reshape(idx.shape[:-1] + (-1, p))
    out = jnp.moveaxis(out, -1, -2)
    if pad:
        out = out[..., :k]
    return out.astype(jnp.int32)


def gather_bytes(table, idx, chunk: int = 2048):
    """Gather byte values (0..255): out[..., k] = table[..., idx[..., k]].

    table: [..., N] int32 byte values, N a multiple of 128.
    idx:   [..., K] int32 indices into the last axis of ``table``.
    Returns [..., K] int32.

    Out-of-range indices must be pre-clamped by the caller.  Byte values
    are exact in bf16 products with f32 accumulation, so the matmuls run
    at full MXU rate.
    """
    return _gather_planes(table[..., None, :], idx, chunk)[..., 0, :]


def gather_i32(table, idx, bits: int = 24, chunk: int = 2048):
    """Gather wider integers (< 2^bits) by byte planes sharing one one-hot
    construction (positions for pointer doubling need 17+ bits)."""
    nbytes = (bits + 7) // 8
    planes = jnp.stack([(table >> (8 * p)) & 0xFF for p in range(nbytes)],
                       axis=-2)
    vals = _gather_planes(planes, idx, chunk)
    out = jnp.zeros(idx.shape, jnp.int32)
    for p in range(nbytes):
        out = out | (vals[..., p, :] << (8 * p))
    return out


@functools.partial(jax.jit, static_argnames=("chunk",))
def gather_bytes_jit(table, idx, chunk: int = 2048):
    return gather_bytes(table, idx, chunk)


def scatter_add(idx, weights, depth: int, chunk: int = 2048):
    """MXU-routed scatter-add: out[..., d] = sum_k weights[..., k] where
    idx[..., k] == d.

    Same two-level decomposition as the gather, with the einsum transposed:
    ``out[h, l] = sum_k w[k] * onehot_hi(idx)[k, h] * onehot_lo(idx)[k, l]``.
    Weights are split into byte planes so every matmul carries only exact
    bf16 values at full MXU rate; weights must be non-negative ints < 2^24.

    depth must be a multiple of 128.  Out-of-range indices must be
    pre-clamped; to drop an element, zero its weight.
    """
    assert depth % LANE == 0, depth
    tiles = depth // LANE

    k = idx.shape[-1]
    pad = (-k) % chunk
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.zeros(idx.shape[:-1] + (pad,), idx.dtype)], axis=-1)
        weights = jnp.concatenate(
            [weights,
             jnp.zeros(weights.shape[:-1] + (pad,), weights.dtype)], axis=-1)
    nchunks = idx.shape[-1] // chunk
    idx_c = idx.reshape(idx.shape[:-1] + (nchunks, chunk))
    w_c = weights.reshape(weights.shape[:-1] + (nchunks, chunk))

    def per_chunk(c):
        ix = idx_c[..., c, :]
        hi = ix >> 7
        lo = ix & (LANE - 1)
        oh_hi = _one_hot_bf16(hi, tiles)
        oh_lo = _one_hot_bf16(lo, LANE)
        w = w_c[..., c, :]
        acc = None
        for p in range(3):
            wp = ((w >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
            part = jnp.einsum("...k,...kh,...kl->...hl", wp, oh_hi, oh_lo,
                              preferred_element_type=jnp.float32)
            part = part.astype(jnp.int32) << (8 * p)
            acc = part if acc is None else acc + part
        return acc

    parts = jax.lax.map(per_chunk, jnp.arange(nchunks))
    out = jnp.sum(parts, axis=0)
    return out.reshape(out.shape[:-2] + (depth,))
