"""E3+E4 megakernel vs the XLA pipeline, bit-for-bit.

`ops/seq_kernel.py` must reproduce the XLA E3/E4/E5 stages exactly:
the full fused encoder is run twice (LZ4NET_SEQ_IMPL=kernel vs =xla)
in interpret mode and every output (bytes, lengths, ok, aux) compared,
then round-tripped against the reference decoder.
"""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from lz4net_tpu.constants import maximum_output_length  # noqa: E402
from lz4net_tpu.models import reference  # noqa: E402
from lz4net_tpu.ops import encode_vector as ev  # noqa: E402
from lz4net_tpu.utils import corpus  # noqa: E402

D = 8192
S_CAP = (D // 4 // 128 + 2) * 128


def _run(blocks, hc_level, impl, dictionary=None):
    os.environ["LZ4NET_SEQ_IMPL"] = impl
    try:
        P = 0
        pre_len = None
        if dictionary is not None:
            P = D
            pre_len = jnp.asarray(
                np.full(len(blocks), len(dictionary), np.int32))
        x = np.zeros((len(blocks), P + D), np.int32)
        dl = np.zeros(len(blocks), np.int32)
        for j, blk in enumerate(blocks):
            if dictionary is not None:
                x[j, P - len(dictionary):P] = np.frombuffer(
                    dictionary, np.uint8)
            x[j, P:P + len(blk)] = np.frombuffer(blk, np.uint8)
            dl[j] = len(blk)
        O = ((maximum_output_length(D) + 1) // 128 + 1) * 128
        out, out_len, ok, aux = ev.encode_batch_vectorized(
            jnp.asarray(x), jnp.asarray(dl), P + D, O, S_CAP,
            rcap=512, hc_level=hc_level, P=P, pre_len=pre_len,
            fused=True)
        return (np.asarray(out), np.asarray(out_len), np.asarray(ok),
                np.asarray(aux))
    finally:
        os.environ.pop("LZ4NET_SEQ_IMPL", None)


def _blocks(rng):
    comp = corpus.silesia_like(D - 60, seed=11)
    runs = (b"x" * 500 + b"lz4seq" * 120
            + bytes(rng.getrandbits(8) for _ in range(300))) * 5
    return [comp, runs[:D - 7]]


def test_seq_kernel_bit_equal(rng):
    blocks = _blocks(rng)
    k = _run(blocks, 0, "kernel")
    x = _run(blocks, 0, "xla")
    np.testing.assert_array_equal(k[1], x[1])       # out_len
    np.testing.assert_array_equal(k[2], x[2])       # ok
    np.testing.assert_array_equal(k[3], x[3])       # aux
    np.testing.assert_array_equal(k[0], x[0])       # bytes
    # and the bytes decode to the originals on the reference decoder
    for j, blk in enumerate(blocks):
        payload = k[0][j, :k[1][j]].astype(np.uint8).tobytes()
        assert reference.decompress_block(payload, len(blk)) == blk


def test_seq_kernel_dict_mode(rng):
    blocks = [corpus.silesia_like(D - 200, seed=3)]
    dictionary = corpus.silesia_like(2048, seed=4)
    k = _run(blocks, 0, "kernel", dictionary)
    x = _run(blocks, 0, "xla", dictionary)
    np.testing.assert_array_equal(k[1], x[1])
    np.testing.assert_array_equal(k[0], x[0])
    np.testing.assert_array_equal(k[3], x[3])
