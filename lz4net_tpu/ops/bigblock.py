"""Host-side segmentation of arbitrarily large LZ4 blocks.

The device decode pipeline's bit budgets and VMEM working set cap a
single kernel block at 96 KB, but the reference's block API accepts up
to ~1.9 GB (`/root/reference/original/lz4.h:70`) and its stream default
is 1 MB chunks (`/root/reference/src/LZ4/LZ4Stream.cs:119`).  Large
blocks are decoded on device as a SEQUENCE of <=96 KB segments:

* a native C scan (`lz4tpu_segment_index`, headers only, ~GB/s) places
  boundaries at the first sequence starting at or past every
  ``OUT_TARGET`` output bytes;
* each segment's compressed slice is a self-contained block once a
  1-byte ``0x00`` token (empty final literal run) is appended — every
  in-segment sequence is complete, and the strict decoder contract
  (consume-all-input + final-literal rule) then holds for the fragment;
* matches reaching before the segment's output start resolve through
  the decoder's preset-dictionary prefix window (`decode_vector`
  pre/pre_len mode) loaded with the previous 64 KB of decoded output —
  sound because LZ4 offsets are 16-bit (`lz4_format_description.txt:66`);
* GIANT sequences (one sequence spanning more than a segment, e.g. a
  100 KB RLE match or literal run) are split into synthetic pieces:
  pure-literal fragments re-encode the literal slice verbatim, and
  pure-match fragments synthesize ``token|offset|extension`` bytes for
  a trimmed match — both format-identical to what a per-segment
  encoder would emit, so the standard decoder handles them.

Segments of one block decode in sequential waves (each needs the
previous output as its window), but waves batch across blocks.
"""

from __future__ import annotations

OUT_TARGET = 48 * 1024          # boundary spacing; segment < 2x this
MAX_SEG_OUT = 96 * 1024         # device kernel cap (decode_vector)
WINDOW = 65536


def _synth_literals(data: bytes) -> bytes:
    """A pure-literal sequence encoding ``data`` verbatim (a valid
    standalone block: it ends with literals)."""
    n = len(data)
    if n < 15:
        return bytes([n << 4]) + data
    e = n - 15
    ext = b"\xff" * (e // 255) + bytes([e % 255])
    return b"\xf0" + ext + data


def _synth_match(off: int, ml: int) -> bytes:
    """A zero-literal match sequence (token|offset|extension); the
    caller appends the 0x00 terminator to make a valid fragment."""
    m = ml - 4
    if m < 15:
        return bytes([m]) + off.to_bytes(2, "little")
    e = m - 15
    ext = b"\xff" * (e // 255) + bytes([e % 255])
    return bytes([15]) + off.to_bytes(2, "little") + ext


def split_fragments(block: bytes, out_len: int):
    """Split one compressed block into device-sized fragments.

    Returns a list of (fragment_bytes, out_start, out_span) where each
    fragment is a self-contained LZ4 block decoding ``out_span`` bytes
    at output offset ``out_start``, with matches reaching at most 64 KB
    before ``out_start``.  Returns None when the native scanner is
    unavailable or the stream is malformed (host path).
    """
    from ..models import native

    if not native.is_available():
        return None
    idx = native.segment_index(block, OUT_TARGET)
    if idx is None:
        return None
    comp_offs, out_offs = idx
    giants = native.giant_seqs(block, OUT_TARGET)
    if giants is None:
        return None

    nseg = len(comp_offs)
    bounds = [(int(comp_offs[k]), int(out_offs[k])) for k in range(nseg)]
    bounds.append((len(block), out_len))

    frags = []
    gi = 0
    for k in range(nseg):
        c0, o0 = bounds[k]
        c1, o1 = bounds[k + 1]
        # giants inside this segment?
        seg_giants = []
        while gi < len(giants) and giants[gi][0] < c1:
            if giants[gi][0] >= c0:
                seg_giants.append(giants[gi])
            gi += 1
        if not seg_giants:
            if o1 - o0 > MAX_SEG_OUT:
                return None              # scanner bound violated
            frag = block[c0:c1] + (b"\x00" if c1 < len(block) else b"")
            frags.append((frag, o0, o1 - o0))
            continue
        # split around each giant sequence
        cur_c, cur_o = c0, o0
        for (g_c, g_o, g_ll, g_lsrc, g_off, g_ml) in seg_giants:
            if g_c > cur_c:              # complete sequences before it
                frag = block[cur_c:g_c] + b"\x00"
                frags.append((frag, cur_o, g_o - cur_o))
            # literal part, in OUT_TARGET slices
            pos = 0
            while pos < g_ll:
                take = min(OUT_TARGET, g_ll - pos)
                data = block[g_lsrc + pos:g_lsrc + pos + take]
                frags.append((_synth_literals(data), g_o + pos, take))
                pos += take
            # match part, in OUT_TARGET slices of >= 4 bytes each
            mpos = 0
            while mpos < g_ml:
                take = min(OUT_TARGET, g_ml - mpos)
                if g_ml - (mpos + take) in (1, 2, 3):
                    take = g_ml - mpos - 4     # keep the tail >= 4
                frag = _synth_match(g_off, take) + b"\x00"
                frags.append((frag, g_o + g_ll + mpos, take))
                mpos += take
            # continue after the giant sequence
            g_end_c = _seq_end(block, g_c)
            cur_c, cur_o = g_end_c, g_o + g_ll + g_ml
        if c1 > cur_c:
            frag = block[cur_c:c1] + (b"\x00" if c1 < len(block) else b"")
            frags.append((frag, cur_o, o1 - cur_o))
        elif c1 == cur_c and o1 != cur_o:
            return None
    return frags


def _seq_end(block: bytes, p: int) -> int:
    """Compressed end offset of the sequence starting at ``p``."""
    token = block[p]
    p += 1
    ll = token >> 4
    if ll == 15:
        while block[p] == 255:
            ll += 255
            p += 1
        ll += block[p]
        p += 1
    p += ll
    if p >= len(block):
        return p
    p += 2
    if (token & 15) == 15:
        while block[p] == 255:
            p += 1
        p += 1
    return p
