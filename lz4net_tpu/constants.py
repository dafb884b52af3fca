"""LZ4 block-format constants shared by every engine.

These mirror the tuning constants of the reference implementation
(`/root/reference/src/LZ4ps/LZ4Codec.cs:48-134`, `original/lz4.c:43-260`,
r88/r93 vintage) because compressed output must be bit-identical to the
reference engines in strict mode.  The *format* itself is normatively
described by `original/lz4_format_description.txt`.
"""

# --- core format ------------------------------------------------------------
MINMATCH = 4                     # minimum match length encoded as token low nibble 0
COPYLENGTH = 8                   # decoder wild-copy granularity
LASTLITERALS = 5                 # last 5 bytes of a block are always literals
MFLIMIT = COPYLENGTH + MINMATCH  # last match must start >= 12 bytes before end
MINLENGTH = MFLIMIT + 1          # blocks < 13 bytes are stored as pure literals

ML_BITS = 4
ML_MASK = (1 << ML_BITS) - 1     # 15: match-length nibble saturation
RUN_BITS = 8 - ML_BITS
RUN_MASK = (1 << RUN_BITS) - 1   # 15: literal-run nibble saturation

MAXD_LOG = 16
MAXD = 1 << MAXD_LOG             # HC chain table size
MAXD_MASK = MAXD - 1
MAX_DISTANCE = (1 << MAXD_LOG) - 1   # 65535: maximum (and window) match offset

STEPSIZE = 8                     # 64-bit match-extension stride (parse-neutral)

# --- fast (greedy) compressor tuning ---------------------------------------
MEMORY_USAGE = 14                # 2^14 bytes of hash table budget
SKIPSTRENGTH = 6                 # incompressible-skip acceleration exponent

HASH_LOG = MEMORY_USAGE - 2      # 12 -> 4096-entry int32 table (general blocks)
HASH_TABLESIZE = 1 << HASH_LOG
HASH_ADJUST = (MINMATCH * 8) - HASH_LOG          # 20

HASH64K_LOG = HASH_LOG + 1       # 13 -> 8192-entry u16 table (<64KB blocks)
HASH64K_TABLESIZE = 1 << HASH64K_LOG
HASH64K_ADJUST = (MINMATCH * 8) - HASH64K_LOG    # 19

LZ4_64KLIMIT = (1 << 16) + (MFLIMIT - 1)  # 65547: inputs below use the 64K fast path

HASH_MULTIPLIER = 2654435761     # Knuth multiplicative hash constant

# --- high-compression (HC) tuning ------------------------------------------
HASHHC_LOG = MAXD_LOG - 1        # 15 -> 32768-entry head table
HASHHC_TABLESIZE = 1 << HASHHC_LOG
HASHHC_ADJUST = (MINMATCH * 8) - HASHHC_LOG      # 17

MAX_NB_ATTEMPTS = 256            # reference HC chain-walk budget (fixed effort)
OPTIMAL_ML = (ML_MASK - 1) + MINMATCH            # 18: lazy-parse trim target

# HC "levels 1..9" are an extension over the reference (which has a single
# fixed effort); level maps to a chain-walk attempt budget, with level 9
# equal to the reference's fixed MAX_NB_ATTEMPTS so ratio parity holds.
HC_LEVEL_DEFAULT = 9


def hc_level_attempts(level: int) -> int:
    """Map an HC compression level (1..9) to a chain-walk attempt budget.

    Level 9 reproduces the reference's fixed 256-attempt search
    (`original/lz4hc.c:184`); lower levels trade ratio for speed.
    """
    level = max(1, min(9, int(level)))
    return 1 << level  # 2,4,...,256


# --- envelope / framing ----------------------------------------------------
WRAP_HEADER_LENGTH = 8           # [u32le original_length][u32le payload_length]

# LZ4Stream chunk flags (lz4net proprietary framing, not the official LZ4 frame)
CHUNK_COMPRESSED = 0x01
CHUNK_HIGH_COMPRESSION = 0x02
CHUNK_PASSES_MASK = 0x04 | 0x08 | 0x10   # reserved, only 0 supported

DEFAULT_BLOCK_SIZE = 1024 * 1024
MIN_BLOCK_SIZE = 16
# Chunk size the TPU decode kernels are shaped for: streams written with
# 64 KB chunks decode fully on-device (the vector pipeline's field
# budgets cap blocks at 96 KB; the reference's 1 MB default chunk would
# force the host fallback on every chunk).  The stream format is
# identical either way — only the chunking granularity differs.
DEVICE_BLOCK_SIZE = 64 * 1024


def maximum_output_length(input_length: int) -> int:
    """Worst-case compressed size for a block of ``input_length`` bytes.

    Mirrors `LZ4Codec.MaximumOutputLength` (reference
    `src/LZ4/LZ4Codec.cs:313-316`).
    """
    return input_length + input_length // 255 + 16
