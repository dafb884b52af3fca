"""TCP loopback streaming: the reference's interactive-read scenario.

Mirrors `src/LZ4.Tests/StreamTests.cs:77-144`: a server writes an LZ4
stream over a real socket with deliberate stalls between chunks; the
client reads with INTERACTIVE_READ and must receive partial data as soon
as any chunk is available (a blocking full-count read would deadlock on
the stalled connection).
"""

import pytest

pytestmark = pytest.mark.quick

import socket
import threading
import time

from lz4net_tpu.stream import LZ4Stream, LZ4StreamFlags, LZ4StreamMode


def _serve(conn: socket.socket, payloads: list[bytes], stall: float) -> None:
    with conn, conn.makefile("wb") as sink:
        stream = LZ4Stream(sink, LZ4StreamMode.COMPRESS, block_size=1 << 16)
        for part in payloads:
            stream.write(part)
            stream.flush()          # one wire chunk per part
            sink.flush()
            time.sleep(stall)
        stream.close()


def test_tcp_interactive_read_returns_partial_data(make_test_data):
    payloads = [make_test_data(40_000, entropy=0.2) for _ in range(4)]
    server_sock, client_sock = socket.socketpair()
    t = threading.Thread(target=_serve, args=(server_sock, payloads, 0.15),
                         daemon=True)
    t.start()

    got = []
    arrival = []
    t0 = time.monotonic()
    with client_sock, client_sock.makefile("rb") as source:
        stream = LZ4Stream(source, LZ4StreamMode.DECOMPRESS,
                           LZ4StreamFlags.INTERACTIVE_READ)
        while True:
            # ask for far more than one chunk; interactive mode must
            # return with whatever is decoded instead of blocking
            chunk = stream.read(10 << 20)
            if not chunk:
                break
            got.append(chunk)
            arrival.append(time.monotonic() - t0)
    t.join(timeout=10)

    assert b"".join(got) == b"".join(payloads)
    # partial data arrived while the server was still stalling: the first
    # read completed before the server could have written everything
    assert len(got) >= 2
    assert arrival[0] < 3 * 0.15


def test_tcp_noninteractive_round_trip(make_test_data):
    payloads = [make_test_data(30_000, entropy=0.4) for _ in range(3)]
    server_sock, client_sock = socket.socketpair()
    t = threading.Thread(target=_serve, args=(server_sock, payloads, 0.0),
                         daemon=True)
    t.start()

    with client_sock, client_sock.makefile("rb") as source:
        stream = LZ4Stream(source, LZ4StreamMode.DECOMPRESS)
        data = stream.read()
    t.join(timeout=10)
    assert data == b"".join(payloads)
