"""Vectorised decode pipeline tests (CPU backend; same code runs on TPU,
where it was validated bit-exact on hardware)."""

import random

import numpy as np
import pytest

from lz4net_tpu.models import native as N
from lz4net_tpu.models import reference as R
from lz4net_tpu.ops.decode_vector import VectorDecoder
from lz4net_tpu.utils import corpus


def _compress(b):
    return N.compress_block(b) if N.is_available() else R.compress_block(b)


@pytest.fixture(scope="module")
def dec():
    return VectorDecoder()


CASES = {
    "text": (b"the quick brown fox jumps over the lazy dog. " * 100)[:3000],
    "rle1": b"\x01" * 5000,                    # analytic-overlap path
    "period7": b"abcdefg" * 700,
    "incompressible": bytes(map(random.Random(4).randrange, [256] * 2500)),
    "tiny": b"x" * 13,
    "lit15": b"A" * 15,                        # literal ext boundary (0 byte)
    "lit270": b"A" * 270 + b"XYZWV",           # 255-run literal extension
    "token0": (b"ab" * 40 + b"Q") * 300,       # immediate re-match chains
}


@pytest.mark.parametrize("name", list(CASES))
def test_vector_decode_matches_oracle(dec, name):
    data = CASES[name]
    got = dec.decode_batch([_compress(data)], [len(data)])[0]
    assert got == data


def test_vector_decode_batch_and_hc(dec):
    data = corpus.silesia_like(4 * 8192, seed=11)
    blocks = corpus.split_blocks(data, 8192)
    packed = [(N.compress_block_hc(b) if N.is_available()
               else R.compress_block_hc(b)) for b in blocks]
    got = dec.decode_batch(packed, [len(b) for b in blocks])
    assert got == blocks


def test_vector_decode_deep_nesting(dec):
    deep = b"0123"
    for _ in range(11):
        deep = deep + deep
    deep = deep[:12000]
    packed = _compress(deep)
    assert dec.decode_batch([packed], [len(deep)])[0] == deep


def test_vector_decode_rejects_truncation(dec):
    data = CASES["text"]
    packed = _compress(data)
    with pytest.raises(R.CorruptedBlockError):
        dec.decode_batch([packed[:len(packed) // 2]], [len(data)])


def test_scatter_add_batched():
    import jax
    from lz4net_tpu.ops.mxu_gather import scatter_add
    rng = np.random.default_rng(3)
    idx = rng.integers(0, 512, (3, 1000)).astype(np.int32)
    w = rng.integers(0, 1 << 20, (3, 1000)).astype(np.int32)
    got = np.asarray(jax.jit(
        lambda i, w: scatter_add(i, w, 512))(idx, w))
    want = np.zeros((3, 512), np.int64)
    for b in range(3):
        np.add.at(want[b], idx[b], w[b])
    np.testing.assert_array_equal(got, want.astype(np.int32))
