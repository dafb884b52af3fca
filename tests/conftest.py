"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the survey's test plan (SURVEY.md §4): multi-device behaviour is
exercised on a single host via `--xla_force_host_platform_device_count`,
the same pattern the driver uses for the multi-chip dry run.  Must run
before the first `import jax` anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may pre-register a real TPU backend at interpreter start
# (sitecustomize), in which case the env var above is too late — force the
# platform through the config API as well.  Tests must stay on the local
# virtual 8-device CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import random  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return random.Random(0xC0FFEE)


def log_uniform_sizes(rand: random.Random, count: int, max_size: int):
    """Log-uniform random block lengths, the reference corpus convention
    (`src/LZ4.Tests/Utilities.cs:35-38`)."""
    import math
    return [max(1, int(math.exp(rand.random() * math.log(max_size))))
            for _ in range(count)]


@pytest.fixture
def make_test_data(rng):
    """Synthetic compressible-ish data: mixed text repeats and random runs."""
    def _make(size: int, entropy: float = 0.5) -> bytes:
        words = [b"the quick brown fox ", b"jumps over the lazy dog ",
                 b"lorem ipsum dolor sit amet ", b"0123456789",
                 bytes(rng.getrandbits(8) for _ in range(24))]
        out = bytearray()
        while len(out) < size:
            if rng.random() < entropy:
                out += bytes(rng.getrandbits(8)
                             for _ in range(rng.randint(1, 64)))
            else:
                out += rng.choice(words) * rng.randint(1, 8)
        return bytes(out[:size])
    return _make
