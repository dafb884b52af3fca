"""Correctness tests for the MXU-routed gather primitive."""

import numpy as np
import pytest

from lz4net_tpu.ops import mxu_gather as G


def test_gather_bytes_basic():
    rng = np.random.default_rng(0)
    table = rng.integers(0, 256, 1024).astype(np.int32)
    idx = rng.integers(0, 1024, 300).astype(np.int32)
    got = np.asarray(G.gather_bytes_jit(table, idx))
    np.testing.assert_array_equal(got, table[idx])


def test_gather_bytes_batched():
    rng = np.random.default_rng(1)
    table = rng.integers(0, 256, (4, 2048)).astype(np.int32)
    idx = rng.integers(0, 2048, (4, 513)).astype(np.int32)
    got = np.asarray(G.gather_bytes_jit(table, idx))
    want = np.take_along_axis(table, idx, axis=1)
    np.testing.assert_array_equal(got, want)


def test_gather_bytes_large_window():
    rng = np.random.default_rng(2)
    table = rng.integers(0, 256, 65536).astype(np.int32)
    idx = rng.integers(0, 65536, 5000).astype(np.int32)
    got = np.asarray(G.gather_bytes_jit(table, idx, chunk=1024))
    np.testing.assert_array_equal(got, table[idx])


def test_gather_i32_positions():
    rng = np.random.default_rng(3)
    table = rng.integers(0, 1 << 17, 4096).astype(np.int32)
    idx = rng.integers(0, 4096, 777).astype(np.int32)
    got = np.asarray(G.gather_i32(table, idx))
    np.testing.assert_array_equal(got, table[idx])


def test_gather_chunk_padding_edge():
    table = np.arange(256, dtype=np.int32) % 256
    idx = np.array([0, 255, 128, 1], np.int32)  # K far below chunk size
    got = np.asarray(G.gather_bytes_jit(table, idx))
    np.testing.assert_array_equal(got, table[idx])


def test_pointer_doubling_with_mxu_gather():
    """The decode match-resolution pattern: iterate idx = f[idx] to a fixed
    point, entirely through the MXU gather."""
    n = 2048
    f = np.arange(n, dtype=np.int32)
    f[1:] = np.arange(n - 1)     # each position points one back; 0 is root
    import jax.numpy as jnp
    idx = jnp.asarray(np.arange(n, dtype=np.int32))
    ftab = jnp.asarray(f)
    for _ in range(11):          # 2^11 = 2048 covers the longest chain
        idx = G.gather_i32(ftab, idx, bits=16)
        ftab = G.gather_i32(ftab, ftab, bits=16)
    assert (np.asarray(idx) == 0).all()
