"""Multi-host (DCN) helpers — REAL two-process test.

Spawns two coordinator-connected processes (2 virtual CPU devices
each), builds the 4-device global chunk mesh, shards a batch with
``local_batch_slice`` + ``jax.make_array_from_process_local_data``, and
runs (a) a cross-process reduction and (b) one data-parallel train step
whose gradient all-reduce crosses the process boundary — the DCN layout
``parallel/multihost.py`` promises (SURVEY.md §2c/§5).  Collectives run
over gloo on CPU; the same program rides ICI/DCN on TPU slices.
"""
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

CHILD = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    os.environ["COORDINATOR_ADDRESS"] = "127.0.0.1:" + port
    os.environ["NUM_PROCESSES"] = "2"
    os.environ["PROCESS_ID"] = str(pid)
    sys.path.insert(0, %r)
    from egregora_tpu.parallel.multihost import (initialize_distributed,
                                                 make_global_chunk_mesh,
                                                 local_batch_slice)
    initialize_distributed()
    import jax.numpy as jnp, numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_global_chunk_mesh()
    assert len(jax.devices()) == 4, jax.devices()
    assert jax.process_count() == 2

    # (a) sharded global array + cross-process reduction
    sl = local_batch_slice(8)
    x_local = (np.arange(8, dtype=np.float32)[sl].reshape(-1, 1)
               * np.ones((1, 4), np.float32))
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("chunk")), x_local, (8, 4))
    total = jax.jit(lambda a: a.sum(),
                    out_shardings=NamedSharding(mesh, P()))(arr)
    assert float(np.asarray(total)) == 112.0

    # (b) one data-parallel train step: params replicated, batch sharded,
    # grad all-reduce crosses the process boundary
    w0 = jnp.ones((4, 4), jnp.float32)
    w = jax.device_put(w0, NamedSharding(mesh, P()))

    def loss(w, x):
        return jnp.mean(jnp.square(x @ w))

    step = jax.jit(lambda w, x: w - 0.1 * jax.grad(loss)(w, x),
                   in_shardings=(NamedSharding(mesh, P()),
                                 NamedSharding(mesh, P("chunk"))),
                   out_shardings=NamedSharding(mesh, P()))
    w1 = step(w, arr)
    # every process sees the same globally-reduced update
    expect = w0 - 0.1 * jax.grad(loss)(w0, jnp.asarray(
        np.arange(8, dtype=np.float32).reshape(-1, 1) * np.ones((1, 4))))
    np.testing.assert_allclose(np.asarray(w1), np.asarray(expect),
                               rtol=1e-5)
    print("proc", pid, "OK", flush=True)
""" % str(REPO))


def test_two_process_dcn_mesh(tmp_path):
    child = tmp_path / "mh_child.py"
    child.write_text(CHILD)
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    procs = [subprocess.Popen([sys.executable, str(child), str(i), str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=280)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"proc {i} OK" in out
