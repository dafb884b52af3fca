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


def _compress_dict(dictionary, data):
    return (N.compress_block_dict(dictionary, data) if N.is_available()
            else R.compress_block_dict(dictionary, data))


def test_vector_decode_preset_dictionary(dec):
    """On-device dictionary decode: matches reach into a prefix region of
    the kernel's output domain (SURVEY.md §2.10 broadcast pattern)."""
    dictionary = (b"shared preset dictionary with common phrases: "
                  b"the quick brown fox jumps over the lazy dog. ") * 40
    records = [
        b"the quick brown fox jumps over the lazy dog. " * 30,
        b"common phrases: the quick brown fox" * 17,
        dictionary[200:900],                       # pure dictionary match
        bytes(map(random.Random(9).randrange, [256] * 700)),
    ]
    packed = [_compress_dict(dictionary, r) for r in records]
    # dictionary must actually help (pure-dict record compresses tiny)
    assert len(packed[2]) < len(records[2]) // 4
    got = dec.decode_batch(packed, [len(r) for r in records],
                           dictionary=dictionary)
    assert got == records


def test_vector_decode_dictionary_larger_than_window(dec):
    """Only the last 64 KB of a dictionary is reachable; larger preset
    dictionaries must still round-trip (right-aligned window)."""
    rnd = random.Random(7)
    big_dict = bytes(rnd.getrandbits(8) for _ in range(70 * 1024))
    data = big_dict[-3000:] + b"tail text " * 50
    packed = _compress_dict(big_dict, data)
    got = dec.decode_batch([packed], [len(data)], dictionary=big_dict)
    assert got == [data]


def test_vector_decode_unknown_length(dec):
    """Device-side unknown-output-length decode returns the exact decoded
    size (`LZ4_uncompress_unknownOutputSize` semantics)."""
    for name, data in CASES.items():
        packed = _compress(data)
        got = dec.decode_batch_unknown([packed], [len(data) + 1000])
        assert got == [data], name
    # batch with heterogeneous sizes
    datas = [CASES["text"], CASES["rle1"], CASES["tiny"]]
    packs = [_compress(d) for d in datas]
    got = dec.decode_batch_unknown(packs, [len(d) + 64 for d in datas])
    assert got == datas


def test_vector_decode_unknown_rejects_bad_input(dec):
    data = CASES["text"]
    packed = _compress(data)
    with pytest.raises(R.CorruptedBlockError):
        dec.decode_batch_unknown([packed], [len(data) // 2])  # overflow
    with pytest.raises(R.CorruptedBlockError):
        dec.decode_batch_unknown([packed[:-3]], [len(data)])  # truncated
    with pytest.raises(R.CorruptedBlockError):
        dec.decode_batch_unknown([b""], [64])                 # empty


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


def test_fused_path_interpret_mode_matches_oracle():
    """The fused-Pallas gather path (ops/fused_gather), exercised in
    interpret mode off-TPU: byte-exact against the CPU oracle for a mix
    of structural cases in one batch.  On TPU this is the production
    decode path (tools/check_fused_decode.py validates it on silicon)."""
    import jax.numpy as jnp
    from lz4net_tpu.ops.decode_vector import (CH, LANE, _cdiv,
                                              decode_batch_vectorized)

    datas = [CASES["text"], CASES["rle1"], CASES["period7"],
             CASES["token0"]]
    packs = [_compress(d) for d in datas]
    C = _cdiv(max(len(p) for p in packs) + 1, 4096) * 4096
    D = _cdiv(max(len(d) for d in datas) + 1, CH) * CH
    S_cap = _cdiv(C // 3 + 2, LANE) * LANE
    comp = np.zeros((len(packs), C), np.int32)
    for i, p in enumerate(packs):
        comp[i, :len(p)] = np.frombuffer(p, np.uint8)
    out, total, ok, strict, _cons, needed = decode_batch_vectorized(
        jnp.asarray(comp),
        jnp.asarray(np.array([len(p) for p in packs], np.int32)),
        jnp.asarray(np.array([len(d) for d in datas], np.int32)),
        C, D, S_cap, 2 * S_cap, 2048, fused=True, w_seq=16)
    out = np.asarray(out)
    for i, d in enumerate(datas):
        assert bool(np.asarray(ok)[i]) and bool(np.asarray(strict)[i])
        assert int(np.asarray(total)[i]) == len(d)
        assert out[i, :len(d)].astype(np.uint8).tobytes() == d
