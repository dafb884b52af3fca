"""bucket_prev vs a literal NumPy replay of its two-tier hash tables.

The oracle walks chunks sequentially like `original/lz4.c`'s
probe/update loop — single-slot 8K-bucket tables updated once per
256-position chunk — with the kernel's documented priority order:
chunk-internal exact 8-byte, 8-byte table, chunk-internal exact u32,
4-byte table.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lz4net_tpu.ops.hash_kernel import (CHUNK, NB, bucket_prev,  # noqa: E402
                                        hash_bucket, hash_bucket8)
from lz4net_tpu.utils import corpus  # noqa: E402


def _u32_np(x, off=0):
    b = np.zeros((len(x) + 7,), np.uint32)
    b[:len(x)] = x
    s = off
    return (b[s:s + len(x)] | (b[s + 1:s + 1 + len(x)] << 8)
            | (b[s + 2:s + 2 + len(x)] << 16)
            | (b[s + 3:s + 3 + len(x)] << 24)).astype(np.uint32)


def _oracle(wa, wb, h4, h8):
    t4 = np.full(NB, -1, np.int64)
    t8 = np.full(NB, -1, np.int64)
    n = len(wa)
    prev = np.full(n, -1, np.int32)
    for cs in range(0, n, CHUNK):
        ce = min(cs + CHUNK, n)
        for i in range(cs, ce):
            got = -1
            for j in range(i - 1, cs - 1, -1):     # arm 1: exact 8B
                if wa[j] == wa[i] and wb[j] == wb[i]:
                    got = j
                    break
            if got < 0:                            # arm 2: 8B table
                j = t8[h8[i]]
                if j >= 0 and wa[j] == wa[i]:
                    got = j
            if got < 0:                            # arm 3: exact u32
                for j in range(i - 1, cs - 1, -1):
                    if wa[j] == wa[i]:
                        got = j
                        break
            if got < 0:                            # arm 4: 4B table
                j = t4[h4[i]]
                if j >= 0 and wa[j] == wa[i]:
                    got = j
            prev[i] = got
        for i in range(cs, ce):
            t4[h4[i]] = i
            t8[h8[i]] = i
    return prev


def _run(data):
    D = len(data)
    wa = _u32_np(data).astype(np.int32)
    wb = _u32_np(data, 4).astype(np.int32)
    xa = jnp.asarray(wa[None, :], jnp.int32)
    xb = jnp.asarray(wb[None, :], jnp.int32)
    h4 = hash_bucket(xa)
    h8 = hash_bucket8(xa, xb)
    got = np.asarray(bucket_prev(xa, xb, h4, h8, D))[0]
    want = _oracle(wa, wb, np.asarray(h4)[0].astype(np.int64),
                   np.asarray(h8)[0].astype(np.int64))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed,kind", [(0, "silesia"), (1, "random"),
                                       (2, "runs")])
def test_bucket_prev_matches_sequential_tables(seed, kind):
    D = 2048
    rng = np.random.default_rng(seed)
    if kind == "silesia":
        data = np.frombuffer(corpus.silesia_like(D, seed=seed), np.uint8)
    elif kind == "random":
        data = rng.integers(0, 256, D, dtype=np.uint8)
    else:
        data = np.repeat(rng.integers(0, 7, D // 16, dtype=np.uint8), 16)
    _run(data)


def test_bucket_prev_batched_blocks_independent():
    D = 1024
    rng = np.random.default_rng(7)
    rows = []
    for b in range(3):
        rows.append(rng.integers(0, 5, D, dtype=np.uint8))
    wa = np.stack([_u32_np(r).astype(np.int32) for r in rows])
    wb = np.stack([_u32_np(r, 4).astype(np.int32) for r in rows])
    xa, xb = jnp.asarray(wa), jnp.asarray(wb)
    h4, h8 = hash_bucket(xa), hash_bucket8(xa, xb)
    got = np.asarray(bucket_prev(xa, xb, h4, h8, D))
    for b in range(3):
        want = _oracle(wa[b], wb[b], np.asarray(h4)[b].astype(np.int64),
                       np.asarray(h8)[b].astype(np.int64))
        np.testing.assert_array_equal(got[b], want)


def test_pallas_impl_matches_scan_impl():
    """The Mosaic kernel (interpret here; silicon via tools/certify.py)
    and the XLA scan must agree bit-for-bit."""
    from lz4net_tpu.ops.hash_kernel import (_bucket_prev_pallas,
                                            _bucket_prev_scan)
    D = 2048
    for seed, kind in ((0, "silesia"), (2, "runs")):
        rng = np.random.default_rng(seed)
        if kind == "silesia":
            data = np.frombuffer(corpus.silesia_like(D, seed=seed),
                                 np.uint8)
        else:
            data = np.repeat(rng.integers(0, 7, D // 16,
                                          dtype=np.uint8), 16)
        wa = jnp.asarray(_u32_np(data).astype(np.int32)[None, :])
        wb = jnp.asarray(_u32_np(data, 4).astype(np.int32)[None, :])
        h4, h8 = hash_bucket(wa), hash_bucket8(wa, wb)
        a = np.asarray(_bucket_prev_pallas(wa, wb, h4, h8, D))
        b = np.asarray(_bucket_prev_scan(wa, wb, h4, h8, D))
        np.testing.assert_array_equal(a, b)
