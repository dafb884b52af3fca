"""bucket_prev vs a literal NumPy replay of its two-tier hash tables.

The oracle walks 512-position chunks sequentially with the module's
documented semantics: the near-window arms (query's 128-lane row plus
the previous row of the same chunk) at 8- then 4-byte exactness,
interleaved with the 8- and 4-byte single-slot tables (state as of the
chunk start; count-guarded updates keep the old entry for any bucket
hit more than once in a chunk).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lz4net_tpu.ops.hash_kernel import (CHUNK, LANE, NB,  # noqa: E402
                                        bucket_prev, hash_bucket,
                                        hash_bucket8)
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
            row = (i - cs) // LANE
            wlo = cs + max(0, row - 1) * LANE      # near-window start
            got = -1
            for j in range(i - 1, wlo - 1, -1):    # arm 1: exact 8B
                if wa[j] == wa[i] and wb[j] == wb[i]:
                    got = j
                    break
            if got < 0:                            # arm 2: 8B table
                j = t8[h8[i]]
                if j >= 0 and wa[j] == wa[i]:
                    got = j
            if got < 0:                            # arm 3: exact u32
                for j in range(i - 1, wlo - 1, -1):
                    if wa[j] == wa[i]:
                        got = j
                        break
            if got < 0:                            # arm 4: 4B table
                j = t4[h4[i]]
                if j >= 0 and wa[j] == wa[i]:
                    got = j
            prev[i] = got
        for tab, h in ((t4, h4), (t8, h8)):        # count-guarded
            hits = {}
            for i in range(cs, ce):
                hits.setdefault(h[i], []).append(i)
            for b, js in hits.items():
                if len(js) == 1:
                    tab[b] = js[0]
    return prev


def _run(rows):
    rows = np.atleast_2d(rows)
    D = rows.shape[1]
    wa = np.stack([_u32_np(r).astype(np.int32) for r in rows])
    wb = np.stack([_u32_np(r, 4).astype(np.int32) for r in rows])
    xa, xb = jnp.asarray(wa), jnp.asarray(wb)
    h4, h8 = hash_bucket(xa), hash_bucket8(xa, xb)
    got = np.asarray(bucket_prev(xa, xb, h4, h8, D))
    for b in range(rows.shape[0]):
        want = _oracle(wa[b], wb[b],
                       np.asarray(h4)[b].astype(np.int64),
                       np.asarray(h8)[b].astype(np.int64))
        np.testing.assert_array_equal(got[b], want)


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
    rng = np.random.default_rng(7)
    _run(rng.integers(0, 5, (3, 1024), dtype=np.uint8))


def test_pallas_impl_matches_scan_impl():
    """The Mosaic kernel (interpret here; silicon via tools/certify.py)
    and the XLA scan must agree bit-for-bit."""
    from lz4net_tpu.ops.hash_kernel import (_bucket_prev_pallas,
                                            _bucket_prev_scan)
    D = 2048
    for seed, kind in ((0, "silesia"), (2, "runs")):
        rng = np.random.default_rng(seed)
        if kind == "silesia":
            data = np.frombuffer(corpus.silesia_like(2 * D, seed=seed),
                                 np.uint8).reshape(2, D)
        else:
            data = np.repeat(rng.integers(0, 7, (2, D // 16),
                                          dtype=np.uint8), 16, axis=1)
        wa = jnp.asarray(np.stack(
            [_u32_np(r).astype(np.int32) for r in data]))
        wb = jnp.asarray(np.stack(
            [_u32_np(r, 4).astype(np.int32) for r in data]))
        h4, h8 = hash_bucket(wa), hash_bucket8(wa, wb)
        a = np.asarray(_bucket_prev_pallas(wa, wb, h4, h8, D))
        b = np.asarray(_bucket_prev_scan(wa, wb, h4, h8, D))
        np.testing.assert_array_equal(a, b)


def test_mark_chain_matches_xla_machinery():
    """chain_kernel.mark_chain (interpret here; silicon via certify's
    fused-encode round-trips) vs the XLA segment machinery on real
    encoder chain graphs."""
    from lz4net_tpu.ops.chain_kernel import mark_chain
    from lz4net_tpu.ops.decode_vector import (SEG, _mark_tokens,
                                              _segment_exits,
                                              _thread_chain)
    rng = np.random.default_rng(11)
    D = 1024
    B = 3
    # synthesize valid chain graphs: matched positions with mlen>=4,
    # g = next match at/after the step target, else next match
    g_rows = []
    for b in range(B):
        matched = rng.random(D) < 0.2
        mlen = rng.integers(4, 40, D)
        nxt = np.full(D + 1, D, np.int64)
        for i2 in range(D - 1, -1, -1):
            nxt[i2] = i2 if matched[i2] else nxt[i2 + 1]
        g = np.empty(D, np.int64)
        for i2 in range(D):
            t = i2 + (mlen[i2] if matched[i2] else 1)
            g[i2] = D if t >= D else nxt[t] if matched[i2] else nxt[i2 + 1] if i2 + 1 <= D - 1 else D
        g = np.maximum(g, np.arange(D) + 1)
        g_rows.append(g.astype(np.int32))
    gj = jnp.asarray(np.stack(g_rows))
    got = np.asarray(mark_chain(gj, D))
    nseg = D // SEG
    g3 = gj.reshape(B, nseg, SEG)
    H3 = _segment_exits(g3, nseg)
    entries = _thread_chain(H3, nseg)
    want = np.asarray(_mark_tokens(g3, entries, nseg)).reshape(B, D)
    np.testing.assert_array_equal(got, want)
