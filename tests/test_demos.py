"""Documentation examples as tests (the reference's `Demos.cs` role:
`src/LZ4.Tests/Demos.cs` keeps every README snippet compiling/working).

Each test is the README quickstart, verbatim modulo file paths.
"""

import pytest

pytestmark = pytest.mark.quick

import io

import lz4net_tpu as lz4


def test_readme_wrap_roundtrip(make_test_data):
    data = make_test_data(100_000, entropy=0.3)
    packed = lz4.wrap(data)
    assert lz4.unwrap(packed) == data
    assert len(packed) < len(data)


def test_readme_block_hc(make_test_data):
    data = make_test_data(50_000, entropy=0.3)
    block = lz4.encode_hc(data, level=9)
    assert lz4.decode(block, output_length=len(data)) == data


def test_readme_dictionary(make_test_data):
    shared_dict = make_test_data(8_000, entropy=0.2)
    record = shared_dict[1000:1400] + b" trailing field"
    small = lz4.encode(record, dictionary=shared_dict)
    plain = lz4.encode(record)
    assert len(small) < len(plain)
    assert lz4.decode(small, output_length=len(record),
                      dictionary=shared_dict) == record


def test_readme_stream(make_test_data):
    from lz4net_tpu import LZ4Stream, LZ4StreamFlags, LZ4StreamMode
    data = make_test_data(300_000, entropy=0.4)
    sink = io.BytesIO()
    with LZ4Stream(sink, LZ4StreamMode.COMPRESS,
                   LZ4StreamFlags.ISOLATE_INNER_STREAM) as s:
        s.write(data)
    with LZ4Stream(io.BytesIO(sink.getvalue()),
                   LZ4StreamMode.DECOMPRESS) as s:
        assert s.read() == data


def test_readme_distributed_decode(make_test_data):
    from lz4net_tpu.parallel.pipeline import distributed_decode
    blocks_raw = [make_test_data(4_096, entropy=0.3) for _ in range(8)]
    blocks = [lz4.encode(b) for b in blocks_raw]
    out_lens = [len(b) for b in blocks_raw]
    decoded = distributed_decode(blocks, out_lens)
    assert decoded == blocks_raw
