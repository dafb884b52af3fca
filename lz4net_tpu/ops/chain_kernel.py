"""Greedy-parse chain threading as one Pallas kernel (encode E3).

The encoder's greedy selection is a pointer chain: ``g[i]`` = the next
token position if a token at i is taken; the marked set is the orbit of
position 0 (`encode_vector` E3, mirroring the reference's sequential
loop `src/LZ4ps/LZ4Codec.Safe64.Dirty.cs:122-277`).  The XLA form
(`decode_vector._segment_exits/_thread_chain/_mark_tokens`) spends
~8 ms/MB across ~30 separate [B, nseg, SEG] ops; this kernel is the
decode parse megakernel's proven P2–P4 structure (segment-exit
doubling, lanes-broadcast carry threading, parallel in-segment
marking — `ops/parse_kernel.py`) applied to an explicit ``g``:

P2  segment exits      log2(128) pointer-doubling rounds; in-segment
                       lookups are native lane shuffles.
P3  chain threading    sequential scan over 128-position segments with
                       the carry as a lanes-broadcast vector.
P4  token marking      in-segment chain walk from each segment entry,
                       all segments in parallel (ceil(128/3)+1 rounds:
                       a chain step advances >= 3 positions).

Contract: g[i] > i (strictly forward), g[i] <= D; the orbit of 0
within each block is marked.  Junk-safe for any such g.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .records_kernel import _cdiv, _interpret, _take_lane

LANE = 128
BIG = 1 << 30


def _chain_kernel(D, g_ref, mark_ref, h_scr, e_scr):
    R = D // LANE
    g = g_ref[0]
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 0)
    l_iota = jax.lax.broadcasted_iota(jnp.int32, (R, LANE), 1)

    # ---- P2: segment exits by in-segment pointer doubling -----------
    seg_end = (r_iota + 1) * LANE
    H = jnp.minimum(g, jnp.int32(D))
    for _ in range(6):
        nxt = _take_lane(H, H)          # H[q] in q's row => lane shuffle
        H = jnp.where(H < seg_end, nxt, H)
    h_scr[:, :] = H

    # ---- P3: thread the chain across segments ----------------------
    # carry kept as a lanes-broadcast [8, LANE] vector (a [1, LANE]
    # lane shuffle hits a Mosaic gather shape check); entries[s] is a
    # full row (uniform across lanes), -1 where the chain skips seg s
    def seg_body(s, v):
        h8 = jnp.broadcast_to(h_scr[pl.ds(s, 1), :], (8, LANE))
        lo = s * LANE
        in_seg = (v >= lo) & (v < lo + LANE)
        nxt = _take_lane(h8, v)
        e_scr[pl.ds(s, 1), :] = jnp.where(in_seg, v, jnp.int32(-1))[:1]
        return jnp.where(in_seg, nxt, v)

    v0 = jnp.zeros((8, LANE), jnp.int32)
    jax.lax.fori_loop(0, R, seg_body, v0)

    # ---- P4: mark all chain positions, segments in parallel ---------
    seg_start = r_iota * LANE
    pos = e_scr[:, :]
    mark = jnp.zeros((R, LANE), jnp.int32)
    for _ in range(_cdiv(LANE, 3) + 1):
        valid = (pos >= seg_start) & (pos < seg_start + LANE)
        mark = mark | (valid & (l_iota == (pos & (LANE - 1)))
                       ).astype(jnp.int32)
        nxt = _take_lane(g, pos)
        pos = jnp.where(valid, nxt, jnp.int32(BIG))
    mark_ref[0] = mark


@functools.partial(jax.jit, static_argnames=("D",))
def mark_chain(g, D: int):
    """mark[b, i] = 1 iff i is in the orbit of 0 under g[b] (g[i] > i).
    g: [B, D] int32, D % 128 == 0.

    Round-count soundness: in the encoder's chain every hop jumps
    DIRECTLY to the next matched position (nm is "next match at or
    after", not +1 stepping), and marked tokens are >= MINMATCH = 4
    apart, so a 128-position segment holds <= 33 chain hops — P4's
    ceil(128/3)+1 = 44 rounds strictly cover it (the decode parse
    kernel uses the same bound at >= 3 bytes per sequence)."""
    B = g.shape[0]
    R = D // LANE
    kern = functools.partial(_chain_kernel, D)
    spec = pl.BlockSpec((1, R, LANE), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    mark = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, R, LANE), jnp.int32),
        grid=(B,),
        in_specs=[spec],
        out_specs=spec,
        scratch_shapes=[pltpu.VMEM((R, LANE), jnp.int32),
                        pltpu.VMEM((R, LANE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(g.reshape(B, R, LANE))
    return mark.reshape(B, D)
