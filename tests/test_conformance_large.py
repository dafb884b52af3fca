"""Opt-in large-scale cross-engine conformance pass.

Mirrors the reference's ConformanceTests
(`/root/reference/src/LZ4.Tests/ConformanceTests.cs:56-147`): stream
hundreds of MB of corpus data in log-uniform random blocks (≤10 MB)
through every registered engine, assert every compressor emits
byte-identical output (`:121-133`) and every decompressor round-trips
(`:135-147`), for both LZ4 and LZ4HC.

Deselected by default (pyproject addopts `-m 'not slow'`); run with:

    python -m pytest tests/test_conformance_large.py -m slow -q

Size defaults to 256 MB; override with LZ4NET_CONFORMANCE_MB.
"""

import math
import os
import random

import pytest

from lz4net_tpu.models import native as N
from lz4net_tpu.models import reference as R
from lz4net_tpu.utils import corpus

TOTAL_MB = int(os.environ.get("LZ4NET_CONFORMANCE_MB", "256"))
MAX_BLOCK = 10 << 20


def _engines(hc: bool):
    yield ("python",
           (lambda d: R.compress_block_hc(d)) if hc else R.compress_block,
           R.decompress_block)
    if N.is_available():
        yield ("native",
               (lambda d: N.compress_block_hc(d)) if hc else N.compress_block,
               N.decompress_block)


@pytest.mark.slow
@pytest.mark.parametrize("hc", [False, True], ids=["lz4", "lz4hc"])
def test_large_conformance(hc):
    rng = random.Random(0x51E51A)
    total = TOTAL_MB << 20
    # python engine is ~100x slower than native; scale its share so the
    # pass finishes, while native covers the full volume
    py_budget = total // 64
    engines = list(_engines(hc))
    assert engines, "no engines available"

    done = 0
    blocks = 0
    while done < total:
        size = min(max(16, int(math.exp(rng.random() * math.log(MAX_BLOCK)))),
                   total - done)
        data = corpus.silesia_like(size, seed=rng.randrange(1 << 30))
        packed_first = None
        for name, enc, dec in engines:
            if name == "python" and done > py_budget:
                continue
            packed = enc(data)
            if packed_first is None:
                packed_first = packed
            else:
                assert packed == packed_first, (
                    f"{name} compressed output differs at block {blocks} "
                    f"({len(data)} bytes)")
            out = dec(packed, len(data))
            assert out == data, (
                f"{name} round-trip failed at block {blocks}")
        done += size
        blocks += 1
    assert blocks > 0


@pytest.mark.slow
def test_large_stream_roundtrip():
    """256 MB LZ4Stream write-then-read round-trip (the reference's
    StreamTests scale, `StreamTests.cs:46-75`), hashed not held."""
    import hashlib
    import io

    from lz4net_tpu.stream import (LZ4Stream, LZ4StreamFlags, LZ4StreamMode)

    rng = random.Random(99)
    total = (TOTAL_MB << 20)
    sink = io.BytesIO()
    h_in = hashlib.md5()
    with LZ4Stream(sink, LZ4StreamMode.COMPRESS,
                   LZ4StreamFlags.ISOLATE_INNER_STREAM) as s:
        done = 0
        while done < total:
            size = min(rng.randint(1, 4 << 20), total - done)
            data = corpus.silesia_like(size, seed=rng.randrange(1 << 30))
            h_in.update(data)
            s.write(data)
            done += size
    sink.seek(0)
    h_out = hashlib.md5()
    with LZ4Stream(sink, LZ4StreamMode.DECOMPRESS) as s:
        while chunk := s.read(1 << 20):
            h_out.update(chunk)
    assert h_in.hexdigest() == h_out.hexdigest()
