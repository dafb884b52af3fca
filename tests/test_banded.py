"""Unit tests for the banded MXU gather/scatter layer (CPU, exactness)."""

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.quick

from lz4net_tpu.ops import banded


RNG = np.random.default_rng(7)


def _mk_table(B, N, bits):
    return RNG.integers(0, 1 << bits, (B, N)).astype(np.int32)


def test_plane_roundtrip():
    t1 = _mk_table(2, 256, 17)
    t2 = _mk_table(2, 256, 8)
    planes, spans = banded.plane_split([(jnp.asarray(t1), 17),
                                        (jnp.asarray(t2), 8)])
    assert planes.shape == (2, 4, 256)
    # join of gathered identity
    idx = jnp.asarray(np.tile(np.arange(256, dtype=np.int32), (2, 1)))
    vals = banded.full_gather(planes, idx)
    back = banded.plane_join(vals, spans)
    np.testing.assert_array_equal(np.asarray(back[0]), t1)
    np.testing.assert_array_equal(np.asarray(back[1]), t2)


@pytest.mark.parametrize("ch,w,back", [(256, 512, 256), (128, 1024, 512),
                                       (512, 512, 0)])
def test_banded_gather_in_band(ch, w, back):
    B, N, K = 2, 2048, 1024
    table = _mk_table(B, N, 16)
    # indices that stay inside each chunk's window
    base = (np.arange(K) // ch) * ch - back
    span = RNG.integers(0, w, (B, K))
    idx = np.clip(base[None, :] + span, 0, N - 1).astype(np.int32)
    in_band_exp = (idx - base[None, :] >= 0) & (idx - base[None, :] < w)

    planes, spans = banded.plane_split([(jnp.asarray(table), 16)])
    vals, in_band = banded.banded_gather(planes, jnp.asarray(idx),
                                         ch, w, back)
    got = np.asarray(banded.plane_join(vals, spans)[0])
    ib = np.asarray(in_band)
    np.testing.assert_array_equal(ib, in_band_exp)
    exp = np.take_along_axis(table, idx, axis=1)
    np.testing.assert_array_equal(got[ib], exp[ib])


def test_hier_gather_with_fallback():
    B, N, K, ch, w = 2, 4096, 1024, 256, 512
    table = _mk_table(B, N, 17)
    idx = RNG.integers(0, N, (B, K)).astype(np.int32)  # mostly out of band
    vals, overflow = banded.hier_gather(
        [(jnp.asarray(table), 17)], jnp.asarray(idx),
        ch=ch, w=w, back=256, k2_cap=1024)
    assert int(np.asarray(overflow).max()) == 0
    exp = np.take_along_axis(table, idx, axis=1)
    np.testing.assert_array_equal(np.asarray(vals[0]), exp)


def test_hier_gather_overflow_reported():
    B, N, K = 1, 2048, 512
    table = _mk_table(B, N, 8)
    idx = RNG.integers(1024, N, (B, K)).astype(np.int32)  # all far
    _, overflow = banded.hier_gather(
        [(jnp.asarray(table), 8)], jnp.asarray(idx),
        ch=128, w=128, back=0, k2_cap=128)
    assert int(np.asarray(overflow)[0]) == K - 128


def test_hier_gather_valid_mask_suppresses_fallback():
    B, N, K = 1, 2048, 512
    table = _mk_table(B, N, 8)
    idx = RNG.integers(1024, N, (B, K)).astype(np.int32)
    valid = np.zeros((B, K), bool)
    valid[:, :64] = True
    vals, overflow = banded.hier_gather(
        [(jnp.asarray(table), 8)], jnp.asarray(idx),
        ch=128, w=128, back=0, valid=jnp.asarray(valid), k2_cap=128)
    assert int(np.asarray(overflow)[0]) == 0
    exp = np.take_along_axis(table, idx, axis=1)
    np.testing.assert_array_equal(np.asarray(vals[0])[valid], exp[valid])


def test_scatter_add_planes_bits():
    B, K, depth = 2, 512, 256
    idx = RNG.integers(0, depth, (B, K)).astype(np.int32)
    w = RNG.integers(0, 1 << 20, (B, K)).astype(np.int32)
    out = np.asarray(banded.scatter_add_planes(
        jnp.asarray(idx), jnp.asarray(w), depth, bits=24))
    exp = np.zeros((B, depth), np.int64)
    for b in range(B):
        np.add.at(exp[b], idx[b], w[b].astype(np.int64))
    np.testing.assert_array_equal(out, exp.astype(np.int32))


def test_sorted_compact():
    B, N = 2, 1024
    mask = RNG.random((B, N)) < 0.1
    got = np.asarray(banded.sorted_compact(jnp.asarray(mask), 256, N + 5))
    for b in range(B):
        pos = np.nonzero(mask[b])[0]
        exp = np.full(256, N + 5, np.int32)
        exp[:len(pos)] = pos[:256]
        np.testing.assert_array_equal(got[b], exp)


def test_compact_indices_matches_sorted_compact(monkeypatch):
    monkeypatch.setenv("LZ4NET_COMPACT", "bsearch")   # exercise the
    import numpy as np                                # non-delegating path
    import jax.numpy as jnp
    from lz4net_tpu.ops.banded import compact_indices, sorted_compact
    rng = np.random.default_rng(3)
    for N, cap, density in ((256, 16, 0.5), (1024, 64, 0.02),
                            (4096, 4096, 0.9), (512, 8, 0.0)):
        mask = jnp.asarray(rng.random((3, N)) < density)
        a = np.asarray(sorted_compact(mask, cap, big=N))
        b = np.asarray(compact_indices(mask, cap, big=N))
        np.testing.assert_array_equal(a, b)
