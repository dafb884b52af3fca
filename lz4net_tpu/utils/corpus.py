"""Benchmark/test corpus providers.

The reference's canonical workload is the 12-file Silesia corpus downloaded
at test time (`src/LZ4.Tests/Utilities.cs:40-93`).  This environment has no
network egress, so we provide:

* ``silesia_like()`` — a deterministic synthetic corpus whose components
  imitate the Silesia mix (English text, XML, source code, databases,
  binaries, noisy sensor data) with compression ratios in the same regime;
* ``local_files()`` — real bytes from the machine (library binaries,
  python sources) for non-synthetic validation;
* ``SILESIA_DIR`` env override — if a real Silesia directory is present,
  it is used directly.

All generators are seeded and cached so every round benchmarks identical
bytes.
"""

from __future__ import annotations

import glob
import hashlib
import os
import random

_CACHE: dict[tuple, bytes] = {}

_WORDS = (
    "the of and a to in is was he for it with as his on be at by i this had "
    "not are but from or have an they which one you were her all she there "
    "would their we him been has when who will more no if out so said what "
    "up its about into than them can only other new some could time these "
    "two may then do first any my now such like our over man me even most "
    "made after also did many before must through back years where much "
    "your way well down should because each just those people mr how too "
    "little state good very make world still own see men work long get "
    "here between both life being under never day same another know while "
    "last might us great old year off come since against go came right "
    "used take three").split()

_TAGS = ["item", "record", "entry", "field", "value", "name", "id", "data",
         "node", "attr", "meta", "ref"]


def _vocab(rng: random.Random, n: int = 4096) -> list:
    """Deterministic pseudo-English vocabulary.  A 186-word vocabulary
    (the first revision of this generator) produces pathological LZ4
    statistics — every word matches a few bytes back, yielding ~3.5
    compressed bytes per sequence where real Dickens/webster average
    ~7-9.  A few thousand distinct words restores realistic literal-run
    and match-length distributions."""
    syll = ("a an ar as at be ca co con da de di do en er es ex fa fi "
            "ga ge ha he hi in is it la le li lo ma me mi mo mu na ne "
            "ni no nu or ou pa pe pi po pre pro ra re ri ro ru sa se "
            "si so su ta te ti to tra tri tu un ur us va ve vi vo").split()
    words = list(_WORDS)
    seen = set(words)
    while len(words) < n:
        w = "".join(rng.choice(syll) for _ in range(rng.randint(2, 4)))
        if w not in seen:
            seen.add(w)
            words.append(w)
    return words


def _text(rng: random.Random, size: int) -> bytes:
    """Dickens/webster-like English text (ratio ~0.55-0.65 under fast
    LZ4).  Words are drawn Zipf-like from a few thousand candidates so
    match/literal statistics resemble real English, not a loop of 186
    stock words."""
    words = _vocab(rng)
    nw = len(words)
    out = []
    n = 0
    while n < size:
        sentence = []
        for _ in range(rng.randint(5, 18)):
            # Zipf-ish rank sampling: rank ~ floor(nw^u), u uniform
            r = int(nw ** rng.random()) - 1
            sentence.append(words[r])
        s = " ".join(sentence).capitalize() + ". "
        out.append(s)
        n += len(s)
        if rng.random() < 0.08:
            out.append("\n")
            n += 1
    return "".join(out).encode()[:size]


def _xml(rng: random.Random, size: int) -> bytes:
    """Highly-structured XML (ratio ~0.15-0.25)."""
    out = ["<?xml version=\"1.0\"?>\n<root>\n"]
    n = len(out[0])
    while n < size:
        tag = rng.choice(_TAGS)
        val = rng.choice(_WORDS) if rng.random() < 0.7 else str(
            rng.randint(0, 99999))
        s = f"  <{tag} id=\"{rng.randint(0, 9999)}\">{val}</{tag}>\n"
        out.append(s)
        n += len(s)
    out.append("</root>\n")
    return "".join(out).encode()[:size]


def _source(rng: random.Random, size: int) -> bytes:
    """Samba-like source code: this package's own sources, cycled."""
    here = os.path.dirname(os.path.dirname(__file__))
    srcs = sorted(glob.glob(os.path.join(here, "**", "*.py"), recursive=True))
    blob = b"\n".join(open(f, "rb").read() for f in srcs) or b"pass\n"
    reps = size // len(blob) + 1
    return (blob * reps)[:size]


def _database(rng: random.Random, size: int) -> bytes:
    """nci/osdb-like records: repetitive fixed-ish rows (ratio ~0.1)."""
    out = []
    n = 0
    row_id = 0
    while n < size:
        row = (f"{row_id:08d}|{rng.choice(_WORDS):<12s}|"
               f"{rng.randint(0, 999):03d}|{'ACTIVE' if row_id % 7 else 'VOID'}|"
               f"{rng.choice(_TAGS)}\n")
        out.append(row)
        n += len(row)
        row_id += 1
    return "".join(out).encode()[:size]


def _binary(rng: random.Random, size: int) -> bytes:
    """mozilla/ooffice-like binary: machine-code-ish with embedded strings
    and zero runs (ratio ~0.5)."""
    out = bytearray()
    while len(out) < size:
        r = rng.random()
        if r < 0.35:
            out += bytes(rng.getrandbits(8) for _ in range(rng.randint(8, 64)))
        elif r < 0.55:
            out += bytes([0]) * rng.randint(4, 96)
        elif r < 0.8:
            op = bytes([rng.getrandbits(8), rng.getrandbits(8)])
            out += op * rng.randint(2, 12)
        else:
            out += rng.choice(_WORDS).encode() + b"\x00"
    return bytes(out[:size])


def _noisy(rng: random.Random, size: int) -> bytes:
    """x-ray/sao-like noisy sensor data: nearly incompressible (ratio ~0.95+)."""
    h = hashlib.sha256(str(rng.random()).encode()).digest()
    out = bytearray()
    ctr = 0
    while len(out) < size:
        out += hashlib.sha256(h + ctr.to_bytes(8, "little")).digest()
        ctr += 1
    # add mild low-entropy structure: mask off high bits of every 4th byte
    b = bytearray(out[:size])
    b[::4] = bytes(v & 0x3F for v in b[::4])
    return bytes(b)


_PROFILES = {
    "text": (_text, 4),
    "xml": (_xml, 1),
    "source": (_source, 2),
    "database": (_database, 2),
    "binary": (_binary, 2),
    "noisy": (_noisy, 1),
}


def silesia_like(total_size: int = 16 << 20, seed: int = 0) -> bytes:
    """Deterministic synthetic Silesia-like corpus of ``total_size`` bytes.

    If the env var SILESIA_DIR points at a real Silesia corpus directory,
    its files are concatenated (and cycled) instead.
    """
    key = ("silesia", total_size, seed)
    if key in _CACHE:
        return _CACHE[key]

    # disk cache: corpus generation is pure-Python-slow and benchmark
    # subprocesses must not pay it repeatedly (v2: realistic text vocab)
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".corpus_cache")
    cache_file = os.path.join(cache_dir, f"silesia_v2_{total_size}_{seed}.bin")
    if os.path.exists(cache_file):
        data = open(cache_file, "rb").read()
        if len(data) == total_size:
            _CACHE[key] = data
            return data

    real = os.environ.get("SILESIA_DIR")
    if real and os.path.isdir(real):
        files = sorted(glob.glob(os.path.join(real, "*")))
        blob = b"".join(open(f, "rb").read() for f in files)
        if blob:
            reps = total_size // len(blob) + 1
            data = (blob * reps)[:total_size]
            _CACHE[key] = data
            return data

    rng = random.Random(seed)
    weights = sum(w for _, w in _PROFILES.values())
    parts = []
    for name, (gen, w) in sorted(_PROFILES.items()):
        parts.append(gen(rng, total_size * w // weights))
    data = b"".join(parts)[:total_size]
    if len(data) < total_size:
        data += _text(rng, total_size - len(data))
    _CACHE[key] = data
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = cache_file + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, cache_file)
    except OSError:
        pass
    return data


def local_files(total_size: int = 8 << 20) -> bytes:
    """Real local bytes (shared libraries + python stdlib sources)."""
    key = ("local", total_size)
    if key in _CACHE:
        return _CACHE[key]
    candidates = (glob.glob("/usr/lib/x86_64-linux-gnu/*.so*")[:20]
                  + glob.glob("/usr/lib/python3*/**/*.py", recursive=True)[:200])
    blob = bytearray()
    for f in sorted(candidates):
        try:
            with open(f, "rb") as fh:
                blob += fh.read(1 << 20)
        except OSError:
            continue
        if len(blob) >= total_size:
            break
    data = bytes(blob[:total_size]) if blob else silesia_like(total_size)
    _CACHE[key] = data
    return data


def split_blocks(data: bytes, block_size: int) -> list[bytes]:
    """Split a buffer into independent codec blocks (the stream layer's
    chunking)."""
    return [data[i:i + block_size] for i in range(0, len(data), block_size)]
