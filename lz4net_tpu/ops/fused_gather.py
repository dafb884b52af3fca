"""Fused Pallas gather kernels: the round-2 decode cost model.

Round 1 routed every random access through HBM-staged one-hot matmuls
(`banded.py`), whose real cost is the *materialisation* of one-hot and
row tensors in HBM (measured ~1 ms per 1M gathered elements on v5e —
a few hundred MB of traffic per gather).  These kernels keep the whole
working set in VMEM and compose two hardware facts established by
`tools/probe_primitives.py` / `probe_lane_gather.py` on this chip:

* Mosaic lowers ``jnp.take_along_axis(src, idx, axis=-1)`` on 2-D
  ``[R, 128]`` int32 operands to a native lane shuffle (verified exact
  for any R; index semantics are mod-128).  This is the only shape it
  supports — tables wider than one lane tile, int8/16, or 3-D all fail
  to compile — so every kernel here reduces its access pattern to
  per-row 128-lane shuffles.
* One-hot matmuls cost ``rows`` MACs per gathered element on the MXU
  and are exact in bf16 per 8-bit plane — cheap when (and only when)
  the one-hot never leaves VMEM.

Access patterns (all tables ``[B, N]`` int32, flat index = row*128+lane):

* ``lane_lookup``   — idx and table share row structure (the decode
  pipeline's in-segment FSM lookups): pure lane shuffle.
* ``diag_gather``   — idx[q] lies in a static row window around q itself
  (parse-side: extension terminators, match-field peeks): shifted-table
  select loop, ``w_rows`` iterations.
* ``rowbase_gather``— idx is (near-)monotone (token fields, literal
  sources): per-idx-row windows based at ``idx[r*128]``, fetched with
  one small row-one-hot matmul, then a ``w_rows`` select loop.  Several
  tables can share one index stream and one window fetch.
* ``table_gather``  — arbitrary idx into a small-to-medium table (the
  wavefront resolver's in-chunk jumps): full row-one-hot matmul.

Every kernel returns exact int32 (wide values travel as 8-bit planes
through the MXU; lane shuffles carry int32 natively).  Off-TPU the
kernels run in interpret mode so the CPU suite exercises these paths.

Reference role: the reference's sequential C# decode touches one byte
at a time (`Safe64.Dirty.cs:533-659`); the TPU design needs ~1 gather
per output byte, so this module sets the throughput ceiling.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _interpret() -> bool:
    """Interpret off-TPU.  Checked via device_kind, not platform: some
    remote-TPU plugins register a platform name other than "tpu"."""
    d = jax.devices()[0]
    return not ("TPU" in d.device_kind.upper() or d.platform == "tpu")


def _take_lane(src, idx):
    """Native lane shuffle: src/idx [R, 128] int32; mod-128 semantics."""
    return jnp.take_along_axis(src, idx & (LANE - 1), axis=-1)


def _shift_rows(tbl, shift):
    """Rows shifted so row r holds tbl[r + shift] (zero fill; |shift|
    may exceed the row count)."""
    R = tbl.shape[0]
    if shift == 0:
        return tbl
    if abs(shift) >= R:
        return jnp.zeros((R, LANE), jnp.int32)
    if shift > 0:
        return jnp.concatenate(
            [tbl[shift:], jnp.zeros((shift, LANE), jnp.int32)], axis=0)
    return jnp.concatenate(
        [jnp.zeros((-shift, LANE), jnp.int32), tbl[:shift]], axis=0)


# ---------------------------------------------------------------------------
# lane_lookup — idx and table share rows
# ---------------------------------------------------------------------------

def _lane_lookup_kernel(t_ref, i_ref, o_ref):
    o_ref[:] = _take_lane(t_ref[:], i_ref[:])


@functools.partial(jax.jit, static_argnames=("rows_per_step",))
def lane_lookup(tables, idx, rows_per_step: int = 2048):
    """out[..., r, l] = tables[..., r, idx[..., r, l] % 128].

    tables/idx: int32 with identical shapes, last dim 128; leading dims
    flatten to rows.  The per-segment FSM lookup of the decode pipeline.
    """
    shape = tables.shape
    t2 = tables.reshape(-1, LANE)
    i2 = idx.reshape(-1, LANE)
    rows = t2.shape[0]
    step = min(rows_per_step, rows)
    pad = (-rows) % step
    if pad:
        t2 = jnp.concatenate([t2, jnp.zeros((pad, LANE), jnp.int32)], 0)
        i2 = jnp.concatenate([i2, jnp.zeros((pad, LANE), jnp.int32)], 0)
    out = pl.pallas_call(
        _lane_lookup_kernel,
        out_shape=jax.ShapeDtypeStruct(t2.shape, jnp.int32),
        grid=(t2.shape[0] // step,),
        in_specs=[pl.BlockSpec((step, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec((step, LANE), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(t2, i2)
    if pad:
        out = out[:rows]
    return out.reshape(shape)


# ---------------------------------------------------------------------------
# diag_gather — static row window around the element's own position
# ---------------------------------------------------------------------------

def _diag_kernel(back_rows, w_rows, t_ref, i_ref, o_ref, b_ref):
    tbl = t_ref[0]
    idx = i_ref[0]
    r = jax.lax.broadcasted_iota(jnp.int32, idx.shape, 0)
    delta = (idx >> 7) - r + back_rows
    acc = jnp.zeros_like(idx)
    for d in range(w_rows):
        cand = _take_lane(_shift_rows(tbl, d - back_rows), idx)
        acc = jnp.where(delta == d, cand, acc)
    o_ref[0] = acc
    b_ref[0] = ((delta >= 0) & (delta < w_rows)).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("back_rows", "w_rows"))
def diag_gather(table, idx, back_rows: int, w_rows: int):
    """Gather table[b, idx[b, q]] where idx[b, q] falls in table rows
    [q//128 - back_rows, q//128 - back_rows + w_rows).

    table/idx: [B, N] int32, N % 128 == 0 (idx domain == table domain).
    Returns (vals [B, N], in_band [B, N] bool); out-of-band lanes are
    garbage — mask with in_band.
    """
    B, N = table.shape
    nrows = N // LANE
    spec3 = pl.BlockSpec((1, nrows, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    vals, band = pl.pallas_call(
        functools.partial(_diag_kernel, back_rows, w_rows),
        out_shape=(jax.ShapeDtypeStruct((B, nrows, LANE), jnp.int32),) * 2,
        grid=(B,),
        in_specs=[spec3, spec3],
        out_specs=(spec3, spec3),
        interpret=_interpret(),
    )(table.reshape(B, nrows, LANE), idx.reshape(B, nrows, LANE))
    return vals.reshape(B, N), band.reshape(B, N).astype(bool)


# ---------------------------------------------------------------------------
# rowbase_gather — monotone idx, per-idx-row dynamic windows
# ---------------------------------------------------------------------------

def _rowbase_kernel(w_rows, nrows, nplanes_list, n_tables, kr_chunk,
                    *refs):
    t_refs = refs[:n_tables]
    i_ref = refs[n_tables]
    o_refs = refs[n_tables + 1:n_tables + 1 + n_tables]
    b_ref = refs[-1]

    idx_all = i_ref[0]                     # [KR, 128]
    KR = idx_all.shape[0]
    tbls = [t_refs[t][0] for t in range(n_tables)]

    # chunk over idx rows: the one-hot [cr*w_rows, nrows] and window
    # [cr, w_rows, 128] intermediates must stay well under VMEM
    for c in range(_cdiv(KR, kr_chunk)):
        lo = c * kr_chunk
        cr = min(kr_chunk, KR - lo)
        idx = idx_all[lo:lo + cr]
        base = idx[:, :1] >> 7             # [cr, 1]
        delta = (idx >> 7) - base
        b_ref[0, pl.ds(lo, cr), :] = (
            (delta >= 0) & (delta < w_rows)).astype(jnp.int32)

        wsel = jnp.clip(base + jax.lax.broadcasted_iota(
            jnp.int32, (cr, w_rows), 1), 0, nrows - 1)
        # one-hot via expand_dims + 3D iota, then a merge-leading-dims
        # reshape (Mosaic rejects reshapes appending a trailing 1)
        oh = (wsel[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, (cr, w_rows, nrows), 2)).astype(jnp.bfloat16)
        oh = oh.reshape(cr * w_rows, nrows)

        for t in range(n_tables):
            win = None
            for p in range(nplanes_list[t]):
                plane = ((tbls[t] >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
                wp = jax.lax.dot_general(
                    oh, plane, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                wp = wp.astype(jnp.int32).reshape(cr, w_rows, LANE)
                win = wp if p == 0 else win | (wp << (8 * p))
            acc = jnp.zeros_like(idx)
            for d in range(w_rows):
                cand = _take_lane(win[:, d, :], idx)
                acc = jnp.where(delta == d, cand, acc)
            o_refs[t][0, pl.ds(lo, cr), :] = acc


@functools.partial(jax.jit, static_argnames=("w_rows", "bits"))
def rowbase_gather(tables, idx, w_rows: int, bits):
    """Windowed gather for (near-)monotone index streams.

    tables: tuple of [B, N] int32 sharing one index stream.
    idx:    [B, K] int32 (K % 128 == 0); element q's window is the
            w_rows table rows from row(idx[b, 128*(q//128)]).
    bits:   per-table value widths.
    Returns ([vals [B, K] ...], in_band [B, K] bool).
    """
    B, N = tables[0].shape
    K = idx.shape[-1]
    nrows, KR = N // LANE, K // LANE
    nplanes = tuple(_cdiv(b, 8) for b in bits)
    # keep one-hot [cr*w_rows, nrows] bf16 + window [cr, w_rows, 128]
    # i32 chunks around ~2 MB each
    kr_chunk = max(1, min(KR, 2048 // w_rows))
    tspec = pl.BlockSpec((1, nrows, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, KR, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_rowbase_kernel, w_rows, nrows, nplanes,
                          len(tables), kr_chunk),
        out_shape=tuple(jax.ShapeDtypeStruct((B, KR, LANE), jnp.int32)
                        for _ in range(len(tables) + 1)),
        grid=(B,),
        in_specs=[tspec] * len(tables) + [kspec],
        out_specs=tuple(kspec for _ in range(len(tables) + 1)),
        interpret=_interpret(),
    )(*(t.reshape(B, nrows, LANE) for t in tables),
      idx.reshape(B, KR, LANE))
    vals = [o.reshape(B, K) for o in outs[:-1]]
    return vals, outs[-1].reshape(B, K).astype(bool)


# ---------------------------------------------------------------------------
# table_gather — arbitrary idx, full row-one-hot matmul
# ---------------------------------------------------------------------------

def _table_kernel(nrows, nplanes_list, n_tables, kchunk, *refs):
    t_refs = refs[:n_tables]
    i_ref = refs[n_tables]
    o_refs = refs[n_tables + 1:]

    idx_all = i_ref[0]                     # [KR, 128]
    KR = idx_all.shape[0]
    planes = []
    for t in range(n_tables):
        tbl = t_refs[t][0]
        planes.append([((tbl >> (8 * p)) & 0xFF).astype(jnp.bfloat16)
                       for p in range(nplanes_list[t])])

    crows = max(1, min(kchunk // LANE, KR))
    for c in range(_cdiv(KR, crows)):
        lo = c * crows
        cr = min(crows, KR - lo)
        idx = idx_all[lo:lo + cr]
        row = jnp.clip(idx >> 7, 0, nrows - 1)
        oh = (row[..., None] == jax.lax.broadcasted_iota(
            jnp.int32, (cr, LANE, nrows), 2)).astype(jnp.bfloat16)
        oh = oh.reshape(cr * LANE, nrows)
        lane = jnp.broadcast_to(
            (idx & (LANE - 1))[..., None],
            (cr, LANE, LANE)).reshape(cr * LANE, LANE)
        for t in range(n_tables):
            acc = None
            for p, plane in enumerate(planes[t]):
                rows = jax.lax.dot_general(
                    oh, plane, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                rows = rows.astype(jnp.int32)          # [cr*LANE, LANE]
                # row e holds element e's table row; its lane pick sits
                # on the diagonal, broadcast across lanes by `lane`
                v = _take_lane(rows, lane).reshape(cr, LANE, LANE)[:, :, 0]
                acc = v if p == 0 else acc | (v << (8 * p))
            o_refs[t][0, pl.ds(lo, cr), :] = acc


@functools.partial(jax.jit, static_argnames=("bits", "kchunk"))
def table_gather(tables, idx, bits, kchunk: int = 1024):
    """out[b, k] = tables[t][b, clamp(idx[b, k])], arbitrary indices.

    Full row-one-hot matmul — nrows*128 MACs per element; use for
    small/medium tables (wavefront chunk jumps) or sparse index sets.
    """
    B, N = tables[0].shape
    K = idx.shape[-1]
    nrows, KR = N // LANE, K // LANE
    nplanes = tuple(_cdiv(b, 8) for b in bits)
    tspec = pl.BlockSpec((1, nrows, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, KR, LANE), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_table_kernel, nrows, nplanes, len(tables),
                          kchunk),
        out_shape=tuple(jax.ShapeDtypeStruct((B, KR, LANE), jnp.int32)
                        for _ in tables),
        grid=(B,),
        in_specs=[tspec] * len(tables) + [kspec],
        out_specs=tuple(kspec for _ in tables),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(*(t.reshape(B, nrows, LANE) for t in tables),
      idx.reshape(B, KR, LANE))
    return [o.reshape(B, K) for o in outs]
