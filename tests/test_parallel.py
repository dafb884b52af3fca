"""Data-parallel pipeline tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from lz4net_tpu.models import native as N
from lz4net_tpu.parallel.mesh import make_mesh, block_sharding
from lz4net_tpu.parallel.pipeline import (
    distributed_decode,
    make_distributed_decode,
    pack_blocks,
    unpack_blocks,
)
from lz4net_tpu.utils import corpus


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return make_mesh(8)


def test_mesh_shape(mesh):
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("blocks",)


def test_distributed_decode_round_trip(mesh):
    data = corpus.silesia_like(8 * 2048, seed=3)
    blocks = corpus.split_blocks(data, 2048)
    packed = [N.compress_block(b) for b in blocks]
    out = distributed_decode(packed, [len(b) for b in blocks], mesh)
    assert b"".join(out) == data


def test_distributed_decode_pads_ragged_batch(mesh):
    # 5 blocks over 8 devices: batch is padded with empty blocks
    data = corpus.silesia_like(5 * 1500, seed=4)
    blocks = corpus.split_blocks(data, 1500)
    packed = [N.compress_block(b) for b in blocks]
    out = distributed_decode(packed, [len(b) for b in blocks], mesh)
    assert b"".join(out) == data


def test_psum_total_matches(mesh):
    data = corpus.silesia_like(8 * 1024, seed=5)
    blocks = corpus.split_blocks(data, 1024)
    packed = [N.compress_block(b) for b in blocks]
    comp, lens, crows, drows, n_real = pack_blocks(
        packed, [len(b) for b in blocks], 8)
    step = make_distributed_decode(mesh, comp.shape[0], crows, drows)
    sharding = block_sharding(mesh)
    out, status, total = step(jax.device_put(comp, sharding),
                              jax.device_put(lens, sharding))
    assert int(total) == len(data)
    results = unpack_blocks(out, status, [len(b) for b in blocks], n_real)
    assert b"".join(results) == data


def test_distributed_decode_dict_broadcast(mesh):
    """Dictionary decode over the mesh: the dict window is replicated
    (ICI broadcast), blocks shard; every block must round-trip exactly
    (SURVEY.md §2.10 ICI-broadcast row)."""
    from lz4net_tpu.parallel.pipeline import distributed_decode_dict
    dictionary = corpus.silesia_like(6000, seed=11)
    rng_data = corpus.silesia_like(8 * 3000, seed=12)
    bodies = corpus.split_blocks(rng_data, 3000)
    packed = [N.compress_block_dict(dictionary, b, 2 * len(b) + 64)
              for b in bodies]
    out = distributed_decode_dict(packed, [len(b) for b in bodies],
                                  dictionary, mesh)
    for got, want in zip(out, bodies):
        assert got == want


def test_corpus_determinism_and_ratio():
    a = corpus.silesia_like(1 << 20, seed=42)
    b = corpus.silesia_like(1 << 20, seed=42)
    assert a == b
    packed = N.compress_block(a)
    ratio = len(packed) / len(a)
    # Silesia-like mix should land in the broad LZ4 regime
    assert 0.25 < ratio < 0.75, ratio


def test_graft_entry_single():
    import __graft_entry__ as g
    fn, args = g.entry()
    out, status = jax.jit(fn)(*args)
    st = np.asarray(status)
    assert (st[:, 1] == 4096).all()


def test_graft_entry_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
