"""Vectorised greedy encoder tests (CPU backend; same code on TPU).

Fast-mode contract (SURVEY.md §7 step 4): output is format-valid — it
decodes bit-exactly on the hardened CPU engines — and compressed size is
competitive with the reference greedy parse (typically smaller thanks to
exact match candidates).  Parse identity is NOT asserted; that is the
strict engines' contract (`tests/test_tpu_encode.py`).
"""

import random

import pytest

from lz4net_tpu.models import native as N
from lz4net_tpu.models import reference as R
from lz4net_tpu.ops.encode_vector import VectorEncoder
from lz4net_tpu.utils import corpus

ENG = N if N.is_available() else R


@pytest.fixture(scope="module")
def enc():
    return VectorEncoder()


# all <= 8 KB so the module shares one compiled shape
CASES = {
    "text": (b"the quick brown fox jumps over the lazy dog. " * 150)[:6500],
    "rle": b"\x07" * 5000,
    "period3": b"abc" * 2000,
    "period7": b"abcdefg" * 900,
    "incompressible": bytes(map(random.Random(4).randrange, [256] * 2500)),
    "tiny13": b"x" * 13,
    "sub_minlength": b"hello world!",         # <13 bytes: pure literals
    "longdup": (lambda d: d + b"-MID-" + d)(
        bytes(map(random.Random(8).randrange, [256] * 3000))),
    "lit_ext_boundary": bytes(map(random.Random(5).randrange, [256] * 300))
    + b"Z" * 40 + bytes(map(random.Random(6).randrange, [256] * 300)),
    "silesia8k": corpus.silesia_like(8000, seed=13),
}


@pytest.mark.parametrize("name", list(CASES))
def test_fast_encode_roundtrips_and_ratio(enc, name):
    data = CASES[name]
    got = enc.encode_batch([data])[0]
    assert ENG.decompress_block(got, len(data)) == data
    # hardened unknown-length decoder accepts it too (full format check)
    assert R.decompress_block_unknown(got, len(data) + 64) == data
    ref = ENG.compress_block(data)
    assert len(got) <= len(ref) + max(4, len(ref) // 50), \
        f"{name}: {len(got)} vs reference {len(ref)}"


def test_fast_encode_batch_heterogeneous(enc):
    datas = [CASES["text"], CASES["rle"], CASES["incompressible"],
             CASES["tiny13"]]
    outs = enc.encode_batch(datas)
    for d, c in zip(datas, outs):
        assert ENG.decompress_block(c, len(d)) == d


def test_fast_encode_corpus_beats_reference(enc):
    """Aggregate ratio on the silesia-like corpus must not exceed the
    reference's (exact candidates beat the 4K-entry hash table)."""
    data = corpus.silesia_like(4 * 8192, seed=21)
    blocks = corpus.split_blocks(data, 8192)
    ours = sum(len(c) for c in enc.encode_batch(blocks))
    ref = sum(len(ENG.compress_block(b)) for b in blocks)
    assert ours <= ref, (ours, ref)
    for b, c in zip(blocks, enc.encode_batch(blocks)):
        assert ENG.decompress_block(c, len(b)) == b


def test_fast_encode_respects_dst_maxlen(enc):
    data = CASES["incompressible"]
    got = enc.encode_batch([data], [len(data) // 2])[0]
    assert got == b""           # reference's Encode-returns-0 convention


def test_fast_encode_empty_and_oversize_fall_back(enc):
    outs = enc.encode_batch([b"", b"q" * 100])
    assert ENG.decompress_block(outs[1], 100) == b"q" * 100
    assert outs[0] == ENG.compress_block(b"")


def test_codec_facade_fast_mode(monkeypatch):
    """mode='fast' routes through the vector encoder when TPU is forced,
    and serves from strict engines otherwise."""
    from lz4net_tpu import codec
    data = CASES["text"]
    packed = codec.encode(data, mode="fast")
    assert codec.decode(packed, len(data)) == data


def test_fused_emission_matches_xla_emission():
    """The emission megakernel (ops/emit_kernel.py, fused=True) must
    emit byte-identical output to the XLA scatter path at both levels
    (interpret mode; the chip path is covered by tools/certify.py)."""
    import jax.numpy as jnp
    import numpy as np
    from lz4net_tpu.constants import MINMATCH, maximum_output_length
    from lz4net_tpu.ops.decode_vector import CH, LANE, _cdiv
    from lz4net_tpu.ops.encode_vector import encode_batch_vectorized
    from lz4net_tpu.utils import corpus
    B = 2
    data = corpus.silesia_like(B * 12288, seed=91)
    blocks = corpus.split_blocks(data, 12288)
    D = _cdiv(12288 + 1, CH) * CH
    O = _cdiv(maximum_output_length(D) + 1, CH) * CH
    S_cap = _cdiv(D // MINMATCH + 2, LANE) * LANE + LANE
    x = np.zeros((B, D), np.int32)
    dl = np.zeros(B, np.int32)
    for i, b in enumerate(blocks):
        x[i, :len(b)] = np.frombuffer(b, np.uint8)
        dl[i] = len(b)
    for lvl in (0, 9):
        o1, l1, k1, _ = encode_batch_vectorized(
            jnp.asarray(x), jnp.asarray(dl), D, O, S_cap,
            hc_level=lvl, fused=False)
        o2, l2, k2, _ = encode_batch_vectorized(
            jnp.asarray(x), jnp.asarray(dl), D, O, S_cap,
            hc_level=lvl, fused=True)
        o1, o2 = np.asarray(o1), np.asarray(o2)
        l1, l2 = np.asarray(l1), np.asarray(l2)
        assert (l1 == l2).all()
        assert np.asarray(k2).all()
        for i in range(B):
            assert (o1[i, :l1[i]] == o2[i, :l2[i]]).all()
