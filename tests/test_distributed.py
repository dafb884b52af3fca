"""Two-process `jax.distributed` smoke test (SURVEY.md §2.10 multi-host).

The reference has no distributed layer; this exercises the framework's
net-new multi-host wiring (`parallel/distributed.py`): two OS processes
join one coordinator over loopback DCN, form a global 8-device CPU mesh
(4 virtual devices per process), and run the sharded decode pipeline —
the same code a real 2-host TPU pod runs.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
# The parent test session env must not leak a conflicting PYTHONPATH.
sys.path.insert(0, os.environ["LZ4_REPO"])

import jax
from lz4net_tpu.parallel import distributed

pid = int(sys.argv[1])
distributed.initialize(coordinator_address="127.0.0.1:" + sys.argv[2],
                       num_processes=2, process_id=pid)
assert distributed.is_multihost(), "process_count() != 2"
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

from lz4net_tpu.models import reference
from lz4net_tpu.parallel.mesh import make_mesh
from lz4net_tpu.parallel.pipeline import (make_distributed_decode,
                                          pack_blocks, block_sharding)
import numpy as np

# identical global data on every process (the SPMD contract)
rng = np.random.default_rng(11)
blocks, out_lens = [], []
for i in range(8):
    raw = bytes(rng.integers(0, 4, 700).astype(np.uint8)) * 2
    blocks.append(reference.compress_block(raw))
    out_lens.append(len(raw))

mesh = make_mesh()
comp, lens, crows, drows, n_real = pack_blocks(blocks, out_lens, 8)
step = make_distributed_decode(mesh, comp.shape[0], crows, drows,
                               interpret=True)
sharding = block_sharding(mesh)

# multi-host device_put: feed each process its local shard
import jax.numpy as jnp
comp_d = jax.make_array_from_callback(
    comp.shape, sharding, lambda idx: comp[idx])
lens_d = jax.make_array_from_callback(
    lens.shape, sharding, lambda idx: lens[idx])
out, status, total = step(comp_d, lens_d)
total = int(jax.device_get(total))
expect = sum(out_lens)
assert total == expect, (total, expect)

# every process checks its local output shard against the oracle
for shard in out.addressable_shards:
    base = shard.index[0].start or 0
    data = np.asarray(shard.data).reshape(shard.data.shape[0], -1)
    for j in range(data.shape[0]):
        b = base + j
        raw = reference.decompress_block(blocks[b], out_lens[b])
        got = data[j, :out_lens[b]].astype(np.uint8).tobytes()
        assert got == raw, f"block {b} mismatch on process {pid}"

print(f"proc {pid} OK total={total}")
"""


@pytest.mark.skipif(os.environ.get("LZ4NET_SKIP_MULTIPROC") == "1",
                    reason="multi-process smoke disabled")
def test_two_process_distributed_decode(tmp_path):
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # strip the host's TPU plugin environment (a pre-registered TPU
    # backend pre-initialises its own distributed client, which makes
    # jax.distributed.initialize a silent no-op in the worker)
    def tainted(k):
        return (k in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH")
                or "AXON" in k or "TPU" in k or "PALLAS" in k)
    env = {k: v for k, v in os.environ.items() if not tainted(k)}
    env["LZ4_REPO"] = repo
    env["JAX_COMPILATION_CACHE_DIR"] = str(tmp_path / "jaxcache")

    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"
        assert f"proc {pid} OK" in out
