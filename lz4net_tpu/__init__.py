"""lz4net_tpu — a TPU-native LZ4 codec framework.

A from-scratch rebuild of the capability set of MiloszKrajewski/lz4net
(LZ4 block codec, LZ4HC, Wrap envelope, LZ4Stream chunked framing, runtime
engine registry) designed TPU-first: batched Pallas/XLA kernels over
independent blocks, data-parallel sharding over `jax.sharding.Mesh`, and a
C++ CPU oracle for bit-exact differential testing.

Public surface mirrors the reference facade `LZ4.LZ4Codec`
(`/root/reference/src/LZ4/LZ4Codec.cs:296-599`):

    encode / encode_hc / decode      -- block codec
    maximum_output_length            -- worst-case bound
    wrap / wrap_hc / unwrap          -- 8-byte envelope
    LZ4Stream                        -- chunked stream framing
    codec_name                       -- active engine triple
"""

from .constants import maximum_output_length
from .codec import (
    codec_name,
    decode,
    encode,
    encode_hc,
    unwrap,
    wrap,
    wrap_hc,
)
from .stream import LZ4Stream, LZ4StreamFlags, LZ4StreamMode

__version__ = "0.1.0"

__all__ = [
    "encode",
    "encode_hc",
    "decode",
    "maximum_output_length",
    "wrap",
    "wrap_hc",
    "unwrap",
    "codec_name",
    "LZ4Stream",
    "LZ4StreamFlags",
    "LZ4StreamMode",
    "__version__",
]
