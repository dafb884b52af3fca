"""LZ4Stream framing tests (reference `src/LZ4.Tests/StreamTests.cs`)."""

import io

import pytest

pytestmark = pytest.mark.quick

from lz4net_tpu import LZ4Stream, LZ4StreamFlags, LZ4StreamMode
from lz4net_tpu.stream import (
    compress_stream,
    decompress_stream,
    read_varint,
    try_read_varint,
    write_varint,
)


@pytest.mark.parametrize("value", [0, 1, 127, 128, 300, 16383, 16384,
                                   1 << 20, (1 << 32) - 1])
def test_varint_round_trip(value):
    sink = io.BytesIO()
    write_varint(sink, value)
    sink.seek(0)
    assert read_varint(sink) == value


def test_varint_wire_format():
    sink = io.BytesIO()
    write_varint(sink, 300)  # 300 = 0b10_0101100 -> AC 02
    assert sink.getvalue() == b"\xac\x02"


def test_varint_clean_eof_vs_truncation():
    assert try_read_varint(io.BytesIO(b"")) is None
    with pytest.raises(EOFError):
        read_varint(io.BytesIO(b"\x80"))  # continuation bit then EOF


def test_stream_round_trip_basic(make_test_data):
    data = make_test_data(300_000, entropy=0.3)
    framed = compress_stream(data, block_size=64 * 1024)
    assert decompress_stream(framed) == data
    assert len(framed) < len(data)


def test_stream_round_trip_hc(make_test_data):
    data = make_test_data(40_000, entropy=0.2)
    framed = compress_stream(data, high_compression=True, block_size=16 * 1024)
    assert decompress_stream(framed) == data


def test_stream_incompressible_chunks_stored_raw(rng):
    data = bytes(rng.getrandbits(8) for _ in range(50_000))
    framed = compress_stream(data, block_size=8192)
    # raw chunks add only the header overhead
    assert len(framed) < len(data) + 64
    assert decompress_stream(framed) == data


def test_stream_small_writes_and_single_byte_reads(make_test_data):
    data = make_test_data(10_000, entropy=0.3)
    sink = io.BytesIO()
    out = LZ4Stream(sink, LZ4StreamMode.COMPRESS,
                    LZ4StreamFlags.ISOLATE_INNER_STREAM, block_size=1024)
    for i in range(0, len(data), 7):
        out.write(data[i:i + 7])
    out.close()

    src = io.BytesIO(sink.getvalue())
    stream = LZ4Stream(src, LZ4StreamMode.DECOMPRESS)
    got = bytearray()
    while True:
        b = stream.read(1)
        if not b:
            break
        got += b
    assert bytes(got) == data


def test_stream_interactive_read_returns_partial(make_test_data):
    data = make_test_data(5000, entropy=0.3)
    framed = compress_stream(data, block_size=1024)
    stream = LZ4Stream(io.BytesIO(framed), LZ4StreamMode.DECOMPRESS,
                       LZ4StreamFlags.INTERACTIVE_READ)
    # an interactive read never blocks for more than one chunk
    first = stream.read(len(data))
    assert 0 < len(first) <= 1024
    rest = bytearray(first)
    while True:
        chunk = stream.read(len(data))
        if not chunk:
            break
        rest += chunk
    assert bytes(rest) == data


def test_stream_isolate_inner_stream():
    sink = io.BytesIO()
    with LZ4Stream(sink, LZ4StreamMode.COMPRESS,
                   LZ4StreamFlags.ISOLATE_INNER_STREAM) as stream:
        stream.write(b"data" * 100)
    assert not sink.closed  # isolated inner stream stays open
    assert decompress_stream(sink.getvalue()) == b"data" * 100


def test_stream_mode_enforcement():
    stream = LZ4Stream(io.BytesIO(), LZ4StreamMode.COMPRESS)
    with pytest.raises(io.UnsupportedOperation):
        stream.read(1)
    stream2 = LZ4Stream(io.BytesIO(), LZ4StreamMode.DECOMPRESS)
    with pytest.raises(io.UnsupportedOperation):
        stream2.write(b"x")
    assert not stream.seekable()


def test_stream_empty_round_trip():
    assert decompress_stream(compress_stream(b"")) == b""
    assert compress_stream(b"") == b""  # no chunks at all


def test_stream_multiple_flushes(make_test_data):
    data1 = make_test_data(1000, entropy=0.2)
    data2 = make_test_data(1000, entropy=0.2)
    sink = io.BytesIO()
    stream = LZ4Stream(sink, LZ4StreamMode.COMPRESS,
                       LZ4StreamFlags.ISOLATE_INNER_STREAM)
    stream.write(data1)
    stream.flush()
    mid = sink.tell()
    assert mid > 0
    stream.write(data2)
    stream.close()
    assert decompress_stream(sink.getvalue()) == data1 + data2


def test_stream_concatenated_frames_resume():
    """Chunk independence makes the stream format resumable: decoding a
    concatenation of two complete framed streams yields both payloads
    (the checkpoint/resume property, SURVEY.md §5)."""
    a = b"first segment " * 500
    b = b"second segment " * 500
    framed = compress_stream(a, block_size=2048) + \
        compress_stream(b, block_size=2048)
    assert decompress_stream(framed) == a + b


def test_stream_reader_stops_at_clean_chunk_boundary():
    data = b"payload " * 1000
    framed = compress_stream(data, block_size=4096)
    src = io.BytesIO(framed + b"")  # exact boundary EOF
    with LZ4Stream(src, LZ4StreamMode.DECOMPRESS) as stream:
        assert stream.read() == data
        assert stream.read(10) == b""  # clean EOF, not an error


def test_stream_read_uses_batched_decode(monkeypatch, make_test_data):
    """The read path must decode chunks through ONE codec.decode_batch
    dispatch (the device hot path), not chunk-at-a-time decode calls
    (the reference's loop shape, `LZ4Stream.cs:274-312`, which a batched
    engine cannot exploit)."""
    from lz4net_tpu import codec

    data = make_test_data(400_000, entropy=0.2)
    framed = compress_stream(data, block_size=64 * 1024)

    calls = []
    real = codec.decode_batch
    monkeypatch.setattr(codec, "decode_batch",
                        lambda blocks, lens: calls.append(len(blocks))
                        or real(blocks, lens))
    assert decompress_stream(framed) == data
    assert calls and max(calls) > 1, calls   # batched, not one-at-a-time


def test_stream_interactive_reads_stay_chunk_at_a_time(make_test_data):
    """InteractiveRead must not read ahead of the consumer (socket
    semantics, `LZ4Stream.cs:376-401`): after serving the first chunk,
    later chunks must still be unread from the inner stream."""
    import io as _io

    data = make_test_data(200_000, entropy=0.2)
    framed = compress_stream(data, block_size=16 * 1024)
    inner = _io.BytesIO(framed)
    s = LZ4Stream(inner, LZ4StreamMode.DECOMPRESS,
                  LZ4StreamFlags.INTERACTIVE_READ)
    first = s.read(1)
    assert first == data[:1]
    assert inner.tell() < len(framed) // 2   # did not slurp the stream
