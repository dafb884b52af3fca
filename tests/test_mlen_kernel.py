"""E2 megakernel vs the XLA `_match_lengths` formulation, bit-for-bit.

The kernel's contract (`ops/mlen_kernel.py`) is exact agreement with
`encode_vector._match_lengths` for any candidate stream with
``prev[i] < i`` — exercised here in interpret mode on compressible,
random and run-heavy inputs, with both hash-kernel and prefix-sort
candidate tiers, at caps small enough to force the survivor-compaction
window fallback.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lz4net_tpu.ops import encode_vector as ev  # noqa: E402
from lz4net_tpu.ops.mlen_kernel import match_lengths_fused  # noqa: E402
from lz4net_tpu.utils import corpus  # noqa: E402

D = 8192
B = 3


def _mk_inputs(data_blocks):
    x = np.zeros((len(data_blocks), D), np.int32)
    dl = np.zeros(len(data_blocks), np.int32)
    for j, blk in enumerate(data_blocks):
        x[j, :len(blk)] = np.frombuffer(blk, np.uint8)
        dl[j] = len(blk)
    xj = jnp.asarray(x)
    u32 = ev._u32(xj)
    return xj, u32, jnp.asarray(dl)


def _compare(x, u32, prev, m8, end_abs, blk_len, rcap, top_offsets=8,
             sub_step=16):
    m_ref, off_ref, ml_ref = ev._match_lengths(
        x, u32, prev, m8, end_abs, blk_len, D, rcap,
        top_offsets=top_offsets, sub_step=sub_step)
    i = jnp.arange(D, dtype=jnp.int32)
    off = i[None, :] - prev
    far = (prev >= 0) & (off <= ev.MAX_DISTANCE) & (off > 4)
    dks = ev._top_offsets_select(off, far, top_offsets, sub_step)
    m_k, off_k, ml_k = match_lengths_fused(
        x, u32, prev, m8.astype(jnp.int32), dks, end_abs, blk_len,
        D, rcap)
    np.testing.assert_array_equal(np.asarray(m_ref), np.asarray(m_k))
    np.testing.assert_array_equal(np.asarray(off_ref), np.asarray(off_k))
    np.testing.assert_array_equal(np.asarray(ml_ref), np.asarray(ml_k))


def _blocks(rng):
    comp = corpus.silesia_like(D - 100, seed=7)
    rnd = bytes(rng.getrandbits(8) for _ in range(D // 2))
    runs = (b"A" * 700 + b"BC" * 400 + rnd[:64] + b"A" * 900
            + bytes(rng.getrandbits(8) for _ in range(512))) * 4
    return [comp, rnd, runs[:D - 1]]


def test_fast_tier_bit_equal(rng):
    """Hash-kernel candidates (the production fast path)."""
    from lz4net_tpu.ops.hash_kernel import (bucket_prev_impl, hash_bucket,
                                            hash_bucket8)
    x, u32, dl = _mk_inputs(_blocks(rng))
    u32s4 = jnp.concatenate(
        [u32[:, 4:], jnp.zeros_like(u32[:, :4])], axis=1)
    prev = bucket_prev_impl(u32, u32s4, hash_bucket(u32),
                            hash_bucket8(u32, u32s4), D)
    m8 = jnp.zeros(prev.shape, bool)
    _compare(x, u32, prev, m8, dl, dl, rcap=512)


def test_hc_tier_bit_equal(rng):
    """Prefix-sort candidates with the m8 claim, HC-style knobs, and a
    cap small enough that compaction windows overflow (fallback path)."""
    x, u32, dl = _mk_inputs(_blocks(rng))
    u32s4 = jnp.concatenate(
        [u32[:, 4:], jnp.zeros_like(u32[:, :4])], axis=1)
    prev4 = ev._prev_occurrence((u32,))
    prev8 = ev._prev_occurrence((u32, u32s4))
    i = jnp.arange(D, dtype=jnp.int32)
    m8 = (prev8 >= 0) & (i[None, :] - prev8 <= ev.MAX_DISTANCE)
    prev = jnp.where(m8, prev8, prev4)
    _compare(x, u32, prev, m8, dl, dl, rcap=256, top_offsets=24,
             sub_step=8)


def test_sparse_alive_fallback(rng):
    """Nearly incompressible input: few survivors, wide slot spans —
    the windowed compaction must fall back without diverging."""
    rnd = bytes(rng.getrandbits(8) for _ in range(D))
    # sprinkle far-apart long matches so alive is sparse but non-empty
    buf = bytearray(rnd)
    for s in range(0, D - 2200, 2048):
        buf[s + 2000:s + 2040] = buf[s:s + 40]
    x, u32, dl = _mk_inputs([bytes(buf)])
    prev4 = ev._prev_occurrence((u32,))
    m8 = jnp.zeros(prev4.shape, bool)
    _compare(x, u32, prev4, m8, dl, dl, rcap=256)
