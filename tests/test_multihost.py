"""Multi-host runtime (``parallel/multihost.py``).

A real multi-process cluster cannot run inside one pytest process, so
these tests pin the single-controller-visible contract: the no-op
single-process path, pod autodetection gating, global-mesh construction
over the virtual 8-device backend, cross-host-safe result gathering, and
the attack driver's ``multihost`` wiring (rank-0 artifact discipline is
exercised with ``jax.process_index() == 0``, the only value reachable
single-process; the >1 branch is the same code with ``is_main`` False).
"""

import os
from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ganleaks_tpu.parallel import multihost


def test_initialize_is_noop_single_process(monkeypatch):
    for var in ("GANLEAKS_COORDINATOR", "GANLEAKS_NUM_PROCESSES",
                "GANLEAKS_PROCESS_ID", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID"):
        monkeypatch.delenv(var, raising=False)
    pid, nproc = multihost.initialize()
    assert (pid, nproc) == (0, 1)
    # idempotent: a second call must not try to re-initialize
    assert multihost.initialize() == (0, 1)


def test_initialize_rejects_partial_explicit_config(monkeypatch):
    """num_processes>1 or process_id>0 without a coordinator (and without
    pod metadata) must raise — otherwise every rank runs as an independent
    'process 0' and N redundant runs race-write the same save_dir."""
    import pytest

    for var in ("GANLEAKS_COORDINATOR", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS", "CLOUD_TPU_TASK_ID"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setenv("GANLEAKS_NUM_PROCESSES", "4")
    monkeypatch.setenv("GANLEAKS_PROCESS_ID", "2")
    with pytest.raises(ValueError, match="no coordinator"):
        multihost.initialize()
    monkeypatch.delenv("GANLEAKS_NUM_PROCESSES")
    with pytest.raises(ValueError, match="no coordinator"):
        multihost.initialize()  # process_id alone is just as partial
    monkeypatch.delenv("GANLEAKS_PROCESS_ID")
    assert multihost.initialize() == (0, 1)  # clean env stays a no-op


def test_pod_autodetect_gates_on_env(monkeypatch):
    for var in ("TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
                "CLOUD_TPU_TASK_ID"):
        monkeypatch.delenv(var, raising=False)
    assert not multihost._pod_autodetect()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "w0,w1")
    assert multihost._pod_autodetect()


def test_initialize_passes_resolved_args(monkeypatch):
    """Explicit args / GANLEAKS_* env must reach jax.distributed.initialize
    (stubbed: actually contacting a coordinator would block the suite)."""
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: calls.append(kw))
    monkeypatch.setenv("GANLEAKS_COORDINATOR", "coord:1234")
    monkeypatch.setenv("GANLEAKS_NUM_PROCESSES", "2")
    monkeypatch.setenv("GANLEAKS_PROCESS_ID", "1")
    multihost.initialize()
    assert calls == [{"coordinator_address": "coord:1234",
                      "num_processes": 2, "process_id": 1}]


def test_initialize_tolerates_already_initialized(monkeypatch):
    def boom(**kw):
        raise RuntimeError("distributed runtime is already initialized")
    monkeypatch.setattr(jax.distributed, "initialize", boom)
    monkeypatch.setenv("GANLEAKS_COORDINATOR", "coord:1234")
    assert multihost.initialize() == (0, 1)

    def boom2(**kw):
        raise RuntimeError("connection refused")
    monkeypatch.setattr(jax.distributed, "initialize", boom2)
    with pytest.raises(RuntimeError, match="connection refused"):
        multihost.initialize()


def test_initialize_autodetect_degrades_when_backend_live(monkeypatch):
    """Single-host TPU images export pod-shaped env vars
    (TPU_WORKER_HOSTNAMES=localhost); with the backend already live the
    autodetect path must degrade to single-process, not raise (the REAL
    jax.distributed.initialize raises 'must be called before any JAX
    calls' here — this suite's backend initialized at conftest import)."""
    monkeypatch.delenv("GANLEAKS_COORDINATOR", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert multihost.initialize() == (0, 1)


def test_global_mesh_shapes():
    n = len(jax.devices())
    assert n >= 8  # conftest virtual mesh
    m = multihost.global_mesh()
    assert m.shape["syn"] == n
    assert multihost.global_mesh(3, axis="data").shape["data"] == 3
    assert multihost.global_mesh(1) is None
    with pytest.raises(ValueError):
        multihost.global_mesh(n + 1)


def test_gather_to_host_replicated_and_sharded():
    mesh = Mesh(np.asarray(jax.devices()[:4]), ("x",))
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    rep = jax.device_put(x, NamedSharding(mesh, P()))
    sh = jax.device_put(x, NamedSharding(mesh, P("x")))
    np.testing.assert_array_equal(multihost.gather_to_host(rep), x)
    np.testing.assert_array_equal(multihost.gather_to_host(sh), x)


def test_run_attack_multihost_flag_end_to_end(tmp_path):
    """cfg.multihost wires initialize() (no-op here) and produces the same
    artifacts as the plain path on the virtual mesh."""
    from ganleaks_tpu.attack.fbb import run_attack
    from ganleaks_tpu.config import AttackConfig
    from ganleaks_tpu.io.images import save_png

    rng = np.random.default_rng(0)
    dirs = {}
    for name, cnt in [("syn", 16), ("pos", 3), ("neg", 3)]:
        d = tmp_path / name
        d.mkdir()
        for i in range(cnt):
            img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
            save_png(img.astype(np.float64) / 255.0, str(d / f"{i}.png"))
        dirs[name] = str(d)

    base = AttackConfig(
        exp_name="mh", syn_data_path=dirs["syn"],
        pos_data_dir=dirs["pos"], neg_data_dir=dirs["neg"],
        data_num=3, resolution=8, distance="l2", engine="gemm",
        query_block=2, syn_block=4, save_plots=False,
        save_root=str(tmp_path / "out"))
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        plain = run_attack(replace(base, exp_name="plain"))[0]
        mh = run_attack(replace(base, exp_name="mh", multihost=True,
                                n_chips=4))[0]
    finally:
        os.chdir(cwd)
    np.testing.assert_array_equal(plain["pos_nn_idx"], mh["pos_nn_idx"])
    np.testing.assert_allclose(plain["pos_loss"], mh["pos_loss"],
                               rtol=0, atol=0)
    assert os.path.exists(os.path.join(mh["save_dir"], "pos_loss.npy"))
