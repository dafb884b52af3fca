"""Pallas TPU kernel: batched greedy LZ4 block encode.

Round-1 "sequencer" encoder: the reference's <64 KB specialised greedy
parse (`src/LZ4ps/LZ4Codec.Safe64.Dirty.cs:306-527` semantics — skip
acceleration, backwards catch-up, token=0 immediate re-match, exact
output-limit checks) runs in the TPU scalar unit over SMEM-resident
buffers, one grid program per block.  Compressed output is *bit-identical*
to the native/python engines, so all three engines satisfy the
cross-engine conformance contract (`ConformanceTests.cs:121-133`).

Block size is capped at 48 KB: src + dst + the 8 K-entry hash table must
fit the ~512 KB SMEM budget together.  Larger inputs are split by the
caller (the stream layer's chunking); a 48 KB window costs a fraction of
a percent of ratio versus 64 KB on Silesia-like data.

Like the decode kernel this is scalar-throughput-bound (~MB/s); it exists
for architectural completeness and correctness on hardware.  The
vectorised encode pipeline (hash/candidate scoring on the VPU, MXU-gather
chain walks) is the round-2 performance path — see ARCHITECTURE.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import (
    HASH64K_ADJUST,
    HASH64K_TABLESIZE,
    HASH_MULTIPLIER,
    LASTLITERALS,
    MFLIMIT,
    MINLENGTH,
    MINMATCH,
    ML_BITS,
    ML_MASK,
    RUN_MASK,
    SKIPSTRENGTH,
    maximum_output_length,
)

LANES = 128
MAX_ENCODE_BLOCK = 48 * 1024


def _encode_kernel(src_smem_blk, lens_smem, out_blk, status_ref, table):
    b = pl.program_id(0)
    src = src_smem_blk.at[0]
    out = out_blk.at[0]

    src_len = lens_smem[b, 0]
    dst_maxlen = lens_smem[b, 1]

    def rd(i):
        return src[i >> 7, i & (LANES - 1)]

    def peek4(i):
        return (rd(i) | (rd(i + 1) << 8) | (rd(i + 2) << 16)
                | (rd(i + 3) << 24))

    # the Knuth multiplier as a wrapped int32 (uint32 semantics via
    # two's-complement multiply; low 32 bits are identical)
    mult_i32 = jnp.int32(np.int32(np.uint32(HASH_MULTIPLIER)))

    def hash4(i):
        h = peek4(i) * mult_i32
        return (h >> HASH64K_ADJUST) & ((1 << (32 - HASH64K_ADJUST)) - 1)

    def eq4(a, c):
        return ((rd(a) == rd(c)) & (rd(a + 1) == rd(c + 1))
                & (rd(a + 2) == rd(c + 2)) & (rd(a + 3) == rd(c + 3)))

    def wr(i, v):
        out[i >> 7, i & (LANES - 1)] = v

    # zero the hash table (scratch persists across grid steps)
    def zi(i, _):
        table[i] = 0
        return 0
    jax.lax.fori_loop(0, HASH64K_TABLESIZE, zi, 0)

    src_end = src_len
    mflimit = src_end - MFLIMIT
    cap = src_end - LASTLITERALS
    dst_last1 = dst_maxlen - (1 + LASTLITERALS)
    dst_last3 = dst_maxlen - (2 + 1 + LASTLITERALS)

    def copy_bytes(dst_pos, src_pos, n):
        def body(k, _):
            wr(dst_pos + k, rd(src_pos + k))
            return 0
        jax.lax.fori_loop(0, n, body, 0)

    def emit_run_len(dp, token_pos, length, is_literal):
        """Write the token nibble + 255-extension bytes for a run length."""
        mask = RUN_MASK if is_literal else ML_MASK
        shift = ML_BITS if is_literal else 0

        def long_case(dp):
            out[token_pos >> 7, token_pos & (LANES - 1)] = (
                out[token_pos >> 7, token_pos & (LANES - 1)]
                + (mask << shift))
            rem = length - mask

            def cond(state):
                return state[1] > 254

            def body(state):
                dp, rem = state
                wr(dp, 255)
                return dp + 1, rem - 255

            dp, rem = jax.lax.while_loop(cond, body, (dp, rem))
            wr(dp, rem)
            return dp + 1

        def short_case(dp):
            out[token_pos >> 7, token_pos & (LANES - 1)] = (
                out[token_pos >> 7, token_pos & (LANES - 1)]
                + (length << shift))
            return dp

        return jax.lax.cond(length >= mask, long_case, short_case, dp)

    # main scan: state = (p, h_fwd, anchor, dp, phase)
    # phase 0 = scanning, 1 = done->last-literals, 2 = overflow
    def scan_cond(state):
        return state[4] == 0

    def scan_body(state):
        p, h_fwd, anchor, dp, phase = state

        # --- find-match probe loop (inserts every probed position,
        # skip-accelerated via the attempt counter) ------------------------
        def probe2_cond(st):
            found, stop = st[4], st[5]
            return (found == 0) & (stop == 0)

        def probe2_body(st):
            attempts, p_cur, p_fwd, h_fwd, found, stop, ref = st
            h = h_fwd
            step = attempts >> SKIPSTRENGTH
            attempts = attempts + 1
            p_cur = p_fwd
            p_fwd = p_cur + step
            overrun = p_fwd > mflimit

            def go(_):
                h_f = hash4(p_fwd)
                r = table[h]
                table[h] = p_cur
                return h_f, r, jnp.where(eq4(r, p_cur), 1, 0)

            def halt(_):
                return h_fwd, 0, 0

            h_fwd2, ref2, found2 = jax.lax.cond(overrun, halt, go, 0)
            return (attempts, p_cur, p_fwd, h_fwd2, found2,
                    jnp.where(overrun, 1, 0), jnp.where(found2 == 1, ref2, ref))

        init = ((1 << SKIPSTRENGTH) + 3, p, p, h_fwd, 0, 0, 0)
        attempts, p, p_fwd, h_fwd, found, stop, ref = jax.lax.while_loop(
            probe2_cond, probe2_body, init)

        def to_last_literals(_):
            return p, h_fwd, anchor, dp, 1

        def have_match(_):
            p_, ref_ = p, ref

            # catch up
            def cu_cond(st):
                p_c, r_c = st
                return (p_c > anchor) & (r_c > 0) & (rd(p_c - 1) == rd(r_c - 1))

            def cu_body(st):
                return st[0] - 1, st[1] - 1

            p_c, ref_c = jax.lax.while_loop(cu_cond, cu_body, (p_, ref_))

            # literal run
            lit_len = p_c - anchor
            token_pos = dp
            dp1 = dp + 1
            overflow_lit = dp1 + lit_len + (lit_len >> 8) > dst_last3

            def emit_all(_):
                wr(token_pos, 0)
                dp2 = emit_run_len(dp1, token_pos, lit_len, True)
                copy_bytes(dp2, anchor, lit_len)
                dp2 = dp2 + lit_len

                # inner match loop: state = (p, ref, anchor, dp, tok, mode)
                # mode 0 = continue inner, 1 = resume outer scan,
                # 2 = last literals, 3 = overflow
                def in_cond(st):
                    return st[5] == 0

                def in_body(st):
                    p_i, ref_i, anchor_i, dp_i, tok_i, _, hf_i = st
                    offset = p_i - ref_i
                    wr(dp_i, offset & 0xFF)
                    wr(dp_i + 1, (offset >> 8) & 0xFF)
                    dp_i = dp_i + 2

                    p_i = p_i + MINMATCH
                    ref_i = ref_i + MINMATCH
                    anchor_i = p_i

                    def ext_cond(st2):
                        p_e, r_e = st2
                        return (p_e < cap) & (rd(p_e) == rd(r_e))

                    def ext_body(st2):
                        return st2[0] + 1, st2[1] + 1

                    p_i, ref_i = jax.lax.while_loop(ext_cond, ext_body,
                                                    (p_i, ref_i))
                    mlen = p_i - anchor_i

                    def ovf(_):
                        return (p_i, ref_i, anchor_i, dp_i, tok_i, 3, hf_i)

                    def emit(_):
                        dp_m = emit_run_len(dp_i, tok_i, mlen, False)

                        def end_block(_):
                            return (p_i, ref_i, p_i, dp_m, tok_i, 2, hf_i)

                        def cont(_):
                            h2 = hash4(p_i - 2)
                            table[h2] = p_i - 2
                            h3 = hash4(p_i)
                            r3 = table[h3]
                            table[h3] = p_i

                            def rematch(_):
                                wr(dp_m, 0)
                                return (p_i, r3, anchor_i, dp_m + 1, dp_m,
                                        0, hf_i)

                            def advance(_):
                                return (p_i + 1, r3, p_i, dp_m, tok_i, 1,
                                        hash4(p_i + 1))

                            return jax.lax.cond(eq4(r3, p_i), rematch,
                                                advance, 0)

                        return jax.lax.cond(p_i > mflimit, end_block, cont, 0)

                    return jax.lax.cond(
                        dp_i + (mlen >> 8) > dst_last1, ovf, emit, 0)

                st = (p_c, ref_c, anchor, dp2, token_pos, 0, h_fwd)
                p_f, _, anchor_f, dp_f, _, mode, hf_f = jax.lax.while_loop(
                    in_cond, in_body, st)

                phase_f = jnp.where(mode == 1, 0,
                                    jnp.where(mode == 2, 1, 2))
                return p_f, hf_f, anchor_f, dp_f, phase_f

            def bail(_):
                return p_c, h_fwd, anchor, dp, 2

            return jax.lax.cond(overflow_lit, bail, emit_all, 0)

        return jax.lax.cond(stop == 1, to_last_literals, have_match, 0)

    p0 = 1
    init_state = (p0, jnp.int32(0), 0, 0, 0)

    def start(_):
        return (p0, hash4(p0), 0, 0, 0)

    def tiny(_):
        return (p0, jnp.int32(0), 0, 0, 1)

    state = jax.lax.cond(src_len >= MINLENGTH, start, tiny, 0)
    p, h_fwd, anchor, dp, phase = jax.lax.while_loop(scan_cond, scan_body,
                                                     state)

    # last literals
    def finish(dp):
        run = src_end - anchor
        overflow = dp + run + 1 + (run + 255 - RUN_MASK) // 255 > dst_maxlen

        def bail(_):
            return -1

        def emit(_):
            token_pos = dp
            wr(token_pos, 0)
            dp2 = emit_run_len(dp + 1, token_pos, run, True)
            copy_bytes(dp2, anchor, run)
            return dp2 + run

        return jax.lax.cond(overflow, bail, emit, 0)

    final_dp = jax.lax.cond(phase == 2, lambda _: -1, lambda _: finish(dp), 0)
    status_ref[b, 0] = final_dp
    status_ref[b, 1] = src_len


def _cdiv(a, b):
    return -(-a // b)


def build_encode_call(n_blocks: int, srows: int, orows: int, interpret: bool):
    grid = (n_blocks,)
    return pl.pallas_call(
        _encode_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, srows, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, orows, LANES), lambda b: (b, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, orows, LANES), jnp.int32),
            jax.ShapeDtypeStruct((n_blocks, 2), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.SMEM((HASH64K_TABLESIZE,), jnp.int32),
        ],
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("srows", "orows", "interpret"))
def _encode_batch_jit(src, lens, srows, orows, interpret):
    kernel = build_encode_call(src.shape[0], srows, orows, interpret)
    return kernel(src, lens)


class PallasEncoder:
    """Host wrapper for the batched TPU greedy encoder (blocks <= 48 KB)."""

    def __init__(self, interpret: bool | None = None):
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret

    def encode_batch(self, blocks: list[bytes],
                     dst_maxlens: list[int] | None = None) -> list[bytes]:
        n = len(blocks)
        if n == 0:
            return []
        if any(len(b) > MAX_ENCODE_BLOCK for b in blocks):
            raise ValueError(f"TPU encode blocks must be <= {MAX_ENCODE_BLOCK}")
        if dst_maxlens is None:
            dst_maxlens = [maximum_output_length(len(b)) for b in blocks]

        max_s = max(len(b) for b in blocks)
        max_o = max(dst_maxlens)
        srows = _cdiv(max_s, LANES) + 2
        orows = _cdiv(max_o, LANES) + 2
        src = np.zeros((n, srows, LANES), np.int32)
        lens = np.zeros((n, 2), np.int32)
        for i, b in enumerate(blocks):
            src[i].reshape(-1)[:len(b)] = np.frombuffer(b, np.uint8)
            lens[i] = (len(b), dst_maxlens[i])

        out, status = _encode_batch_jit(jnp.asarray(src), jnp.asarray(lens),
                                        srows, orows, self.interpret)
        out = np.asarray(out).reshape(n, -1)
        status = np.asarray(status)
        results = []
        for i in range(n):
            written = int(status[i, 0])
            if written <= 0:
                results.append(b"")    # did not fit dst_maxlen
            else:
                results.append(out[i, :written].astype(np.uint8).tobytes())
        return results


_default_encoder: PallasEncoder | None = None


def compress_block(src: bytes, dst_maxlen: int | None = None) -> bytes:
    global _default_encoder
    if _default_encoder is None:
        _default_encoder = PallasEncoder()
    src = bytes(src)
    if not src:
        return b""
    if dst_maxlen is None:
        dst_maxlen = maximum_output_length(len(src))
    return _default_encoder.encode_batch([src], [dst_maxlen])[0]
