"""Real multi-process ``jax.distributed`` execution (VERDICT r2 missing #3).

SURVEY.md §2c's DCN leg: two OS processes, a localhost coordinator,
``jax.distributed.initialize()`` actually executed (not monkeypatched),
``process_count()==2`` asserted, one cross-process psum, and disjoint
``host_shard_options()`` input shards — the multi-host contract of
BASELINE config 5, run on the CPU backend.
"""

import json
import os
import socket
import subprocess
import sys
import textwrap

import pytest

_CHILD = textwrap.dedent("""
    import json, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, "__REPO__")
    from tumblr_emotions_tpu.parallel import distributed

    pid, nproc, addr, out_path = (
        int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
    active = distributed.maybe_initialize(
        coordinator_address=addr, num_processes=nproc, process_id=pid)
    assert active, "distributed mode did not become active"
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.process_index() == pid

    # One psum that crosses the process boundary: each process contributes
    # (its index + 1) from its local device; all must see the global sum.
    mesh = Mesh(np.array(jax.devices()).reshape(-1), ("data",))
    sharding = NamedSharding(mesh, P("data"))
    n_local = jax.local_device_count()
    local = np.full((n_local,), float(pid + 1), np.float32)
    x = jax.make_array_from_process_local_data(sharding, local)
    f = jax.jit(jax.shard_map(lambda a: jax.lax.psum(a, "data"),
                              mesh=mesh, in_specs=P("data"),
                              out_specs=P()))
    got = float(np.asarray(f(x).addressable_data(0))[0])
    expect = float(sum((p + 1) * n_local for p in range(nproc)))
    assert got == expect, (got, expect)

    shard_index, shard_count = distributed.host_shard_options()
    with open(out_path, "w") as fh:
        json.dump({"pid": pid, "psum": got,
                   "shard_index": shard_index,
                   "shard_count": shard_count}, fh)
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_psum(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "child.py"
    script.write_text(_CHILD.replace("__REPO__", repo))
    addr = f"127.0.0.1:{_free_port()}"
    nproc = 2

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # One real local device per process (the parent pytest's 8-virtual-device
    # XLA_FLAGS must not leak into the children).
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_NUM_CPU_DEVICES", None)

    procs = []
    outs = []
    for pid in range(nproc):
        out_path = str(tmp_path / f"proc{pid}.json")
        outs.append(out_path)
        procs.append(subprocess.Popen(
            [sys.executable, str(script), str(pid), str(nproc), addr,
             out_path],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed child timed out (coordinator hang?)")
        logs.append(out.decode(errors="replace"))
    for p, log_text in zip(procs, logs):
        assert p.returncode == 0, log_text

    results = [json.load(open(o)) for o in outs]
    # Both processes saw the same cross-process sum: 1*n + 2*n.
    n_local = 1
    assert all(r["psum"] == 3.0 * n_local for r in results), results
    # Disjoint, complete host input shards.
    assert sorted(r["shard_index"] for r in results) == [0, 1]
    assert all(r["shard_count"] == 2 for r in results)
