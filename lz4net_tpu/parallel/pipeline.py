"""Data-parallel codec pipeline over a device mesh.

Blocks are sharded over the mesh's ``blocks`` axis (each device decodes its
shard with the Pallas kernel), preset dictionaries are replicated, and
summary statistics are reduced with ``psum`` over ICI.  Outputs keep the
block-major sharding, so gathering them to the host reconstructs frame
order with no extra permutation — the "ordered gather" of the stream
layer.

Multi-host runs initialise `jax.distributed` first (`distributed.py`) and
use exactly the same code: the mesh simply spans all processes' devices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops.decode_pallas import LANES, build_decode_call, _cdiv
from .mesh import BLOCK_AXIS, block_sharding, make_mesh


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def make_distributed_decode(mesh, n_blocks: int, crows: int, drows: int,
                            interpret: bool | None = None):
    """Build a jitted, mesh-sharded batched decode step.

    Returns fn(comp [B, crows, 128] i32, lens [B, 2] i32) ->
    (out [B, drows, 128] i32, status [B, 2] i32, total_bytes scalar).

    ``total_bytes`` is a psum over the mesh — the cross-device reduction
    every multi-chip step performs (and the dry-run exercises).
    """
    if interpret is None:
        interpret = _interpret_default()
    n_dev = mesh.devices.size
    if n_blocks % n_dev != 0:
        raise ValueError(f"n_blocks ({n_blocks}) must divide evenly over "
                         f"{n_dev} devices; pad the batch")
    local_blocks = n_blocks // n_dev
    kernel = build_decode_call(local_blocks, crows, drows, interpret)

    def shard_fn(comp, lens):
        out, status = kernel(comp, comp, lens)
        written = jnp.sum(status[:, 1])
        total = jax.lax.psum(written, BLOCK_AXIS)
        return out, status, total

    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def make_distributed_encode(mesh, n_blocks: int, srows: int, orows: int,
                            interpret: bool | None = None):
    """Mesh-sharded batched greedy encode (blocks <= 48 KB per the encode
    kernel's SMEM budget).  Returns fn(src [B, srows, 128], lens [B, 2]) ->
    (out [B, orows, 128], status [B, 2], total_compressed scalar)."""
    from ..ops.encode_pallas import build_encode_call

    if interpret is None:
        interpret = _interpret_default()
    n_dev = mesh.devices.size
    if n_blocks % n_dev != 0:
        raise ValueError(f"n_blocks ({n_blocks}) must divide evenly over "
                         f"{n_dev} devices; pad the batch")
    kernel = build_encode_call(n_blocks // n_dev, srows, orows, interpret)

    def shard_fn(src, lens):
        out, status = kernel(src, lens)
        written = jnp.sum(jnp.maximum(status[:, 0], 0))
        total = jax.lax.psum(written, BLOCK_AXIS)
        return out, status, total

    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS)),
        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def pack_blocks(blocks: list[bytes], out_lens: list[int],
                pad_to_multiple_of: int = 1):
    """Host-side packing: blocks -> ([B, crows, 128] i32, [B, 2] i32).

    Pads the batch with empty blocks to a device-count multiple; empty
    blocks decode to zero bytes and are dropped on unpack.
    """
    n = len(blocks)
    n_pad = (-n) % pad_to_multiple_of
    blocks = list(blocks) + [b"\x00"] * n_pad    # token 0x00: empty literal run
    out_lens = list(out_lens) + [0] * n_pad

    max_c = max(len(b) for b in blocks)
    max_d = max(max(out_lens), 1)
    crows = _cdiv(max_c, LANES) + 2
    drows = _cdiv(max_d, LANES) + 2
    comp = np.zeros((len(blocks), crows, LANES), np.int32)
    lens = np.zeros((len(blocks), 2), np.int32)
    for i, b in enumerate(blocks):
        comp[i].reshape(-1)[:len(b)] = np.frombuffer(b, np.uint8)
        lens[i] = (len(b), out_lens[i])
    return comp, lens, crows, drows, n


def unpack_blocks(out, status, out_lens, n_real: int) -> list[bytes]:
    """Validate statuses and slice decoded bytes back out (input order)."""
    from ..models.reference import CorruptedBlockError
    out = np.asarray(out).reshape(out.shape[0], -1)
    status = np.asarray(status)
    results = []
    for i in range(n_real):
        if int(status[i, 1]) != out_lens[i]:
            raise CorruptedBlockError(
                f"block {i}: wrote {int(status[i, 1])}/{out_lens[i]}")
        results.append(out[i, :out_lens[i]].astype(np.uint8).tobytes())
    return results


def distributed_decode(blocks: list[bytes], out_lens: list[int],
                       mesh=None) -> list[bytes]:
    """End-to-end helper: shard independent blocks over the mesh, decode,
    gather in order."""
    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    comp, lens, crows, drows, n_real = pack_blocks(blocks, out_lens, n_dev)
    step = make_distributed_decode(mesh, comp.shape[0], crows, drows)
    sharding = block_sharding(mesh)
    comp_d = jax.device_put(comp, sharding)
    lens_d = jax.device_put(lens, sharding)
    out, status, _total = step(comp_d, lens_d)
    padded_lens = list(out_lens) + [0] * ((-len(blocks)) % n_dev)
    return unpack_blocks(out, status, padded_lens, n_real)


def make_distributed_vector_decode_dict(mesh, n_blocks: int, C: int,
                                        D: int, S_cap: int, P_pre: int):
    """Mesh-sharded vector decode with a PRESET DICTIONARY broadcast.

    Blocks shard over the ``blocks`` axis; the dictionary window
    (``pre`` [P_pre] bytes, ``pre_len`` scalar) is REPLICATED — the
    in_spec `P()` makes XLA broadcast it once over ICI to every device
    (SURVEY.md §2.10's ICI-broadcast row).  Each shard decodes its local
    blocks against the shared window with the vectorised pipeline
    (`decode_vector.decode_batch_vectorized` pre/pre_len mode).

    Returns fn(comp [B, C] i32, comp_len [B], out_len [B],
    pre [P_pre] i32, pre_len scalar i32) ->
    (out [B, D] i32, ok [B] bool, total [B] i32, certified scalar).
    """
    from ..ops.decode_vector import decode_batch_vectorized

    n_dev = mesh.devices.size
    if n_blocks % n_dev != 0:
        raise ValueError(f"n_blocks ({n_blocks}) must divide evenly over "
                         f"{n_dev} devices; pad the batch")
    local = n_blocks // n_dev
    E_cap = 2 * S_cap

    def shard_fn(comp, cl, ol, pre, pre_len):
        pre_b = jnp.broadcast_to(pre[None, :], (local, P_pre))
        pl_b = jnp.broadcast_to(pre_len[None], (local,))
        out, total, ok, strict, _consumed, needed = \
            decode_batch_vectorized(
                comp, cl, ol, C, D, S_cap, E_cap, 8192,
                pre=pre_b, pre_len=pl_b)
        # full strict certification, same contract as
        # VectorDecoder._device_pass
        ok = ok & strict & (needed == total) & (total == ol)
        certified = jax.lax.psum(jnp.sum(ok.astype(jnp.int32)),
                                 BLOCK_AXIS)
        return out, ok, total, certified

    mapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS),
                  P(), P()),                       # dict replicated
        out_specs=(P(BLOCK_AXIS), P(BLOCK_AXIS), P(BLOCK_AXIS), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


def distributed_decode_dict(blocks: list[bytes], out_lens: list[int],
                            dictionary: bytes, mesh=None) -> list[bytes]:
    """Decode dictionary-compressed blocks sharded over the mesh, the
    dictionary broadcast once (replicated sharding -> ICI).  Blocks the
    device pipeline cannot certify fall back to the host oracle, same
    contract as `VectorDecoder.decode_batch`."""
    from ..ops.decode_vector import (CH, BCH, LANE,
                                     MAX_DISTANCE_WINDOW, VectorDecoder,
                                     _cdiv)

    if mesh is None:
        mesh = make_mesh()
    n_dev = mesh.devices.size
    n = len(blocks)
    n_pad = (-n) % n_dev
    all_blocks = list(blocks) + [b"\x00"] * n_pad
    all_lens = list(out_lens) + [1] * n_pad

    window = bytes(dictionary)[-MAX_DISTANCE_WINDOW:]
    P_pre = _cdiv(max(len(window), 1), CH) * CH
    prow = np.zeros(P_pre, np.int32)
    prow[P_pre - len(window):] = np.frombuffer(window, np.uint8)

    max_c = max(max(len(b) for b in all_blocks), 16)
    max_d = max(max(all_lens), 1)
    C = _cdiv(max_c + 1, BCH) * BCH
    D = _cdiv(max_d + 1, CH) * CH
    S_cap = _cdiv(C // 3 + 2, LANE) * LANE
    comp = np.zeros((len(all_blocks), C), np.int32)
    for i, b in enumerate(all_blocks):
        comp[i, :len(b)] = np.frombuffer(b, np.uint8)
    cl = np.array([len(b) for b in all_blocks], np.int32)
    ol = np.array(all_lens, np.int32)

    step = make_distributed_vector_decode_dict(
        mesh, len(all_blocks), C, D, S_cap, P_pre)
    sharding = block_sharding(mesh)
    out, ok, total, _cert = step(
        jax.device_put(comp, sharding), jax.device_put(cl, sharding),
        jax.device_put(ol, sharding),
        jax.device_put(jnp.asarray(prow),
                       jax.sharding.NamedSharding(mesh, P())),
        jax.device_put(jnp.asarray(np.int32(len(window))),
                       jax.sharding.NamedSharding(mesh, P())))
    out, ok, total = np.asarray(out), np.asarray(ok), np.asarray(total)
    results = []
    for i in range(n):
        if bool(ok[i]) and int(total[i]) == out_lens[i]:
            results.append(out[i, :out_lens[i]].astype(np.uint8).tobytes())
        else:
            results.append(VectorDecoder._host_decode(
                blocks[i], out_lens[i], dictionary))
    return results
