"""Data-parallel training correctness: the pjit-sharded DCGAN step on the
8-device mesh must match the single-device step bitwise-closely, and the
graft entry points must run."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ganleaks_tpu.config import DCGANConfig
from ganleaks_tpu.train import dcgan as dcgan_train
from ganleaks_tpu.train.gan import dcgan_train_step


def test_dp_step_matches_single_device(rng):
    cfg = DCGANConfig(ngf=8, ndf=8, nz=16, batch_size=16)
    real = jnp.asarray(rng.uniform(-1, 1, (16, 64, 64, 3))
                       .astype(np.float32))
    key = jax.random.key(1)

    state1 = dcgan_train.build_state(cfg, jax.random.key(0))
    out1, m1 = dcgan_train_step(state1, real, key)
    p1 = jax.device_get(out1.gen.params)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    state2 = dcgan_train.build_state(cfg, jax.random.key(0))
    state2 = jax.device_put(state2, NamedSharding(mesh, P()))
    real_sh = jax.device_put(real,
                             NamedSharding(mesh, P("data", None, None,
                                                   None)))
    out2, m2 = dcgan_train_step(state2, real_sh, key)
    p2 = jax.device_get(out2.gen.params)

    np.testing.assert_allclose(float(m1["loss_disc"]),
                               float(m2["loss_disc"]), rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_graft_entry_single_and_multichip():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    d, i = out
    assert d.shape == i.shape
    g.dryrun_multichip(8)


def test_acquire_devices_health_probe():
    """MULTICHIP_r02 regression: a backend whose devices ENUMERATE but
    cannot COMPUTE (libtpu client/terminal skew) must be skipped, and the
    next candidate platform probed."""
    import __graft_entry__ as g

    # broken everywhere -> no devices, caller falls back to subprocess
    assert g._acquire_devices(8, probe=lambda d: False) is None
    # platform that raises on enumeration is skipped (r01 regression)
    assert g._acquire_devices(8, platforms=("nonexistent-platform",)) is None
    # first platform broken-at-compute, second healthy -> second wins
    calls = []

    def probe(dev):
        calls.append(dev.platform)
        return len(calls) > 1

    devs = g._acquire_devices(8, probe=probe, platforms=(None, "cpu"))
    assert devs is not None and len(devs) == 8
    assert len(calls) == 2
    # the real probe runs an actual computation and passes on this host
    assert g._probe_device(jax.devices()[0])


def test_acquire_devices_hanging_enumeration_bails_out():
    """Dead-relay regression (2026-08-17): backend INITIALIZATION hangs —
    ``jax.devices()`` never returns, never raises. Enumeration must be
    deadline-bounded, and a timeout must abort the whole in-process
    search (the hung init thread holds jax's backend lock, so probing
    the next platform would block on it too) so the caller drops to the
    CPU-mesh subprocess."""
    import time

    import __graft_entry__ as g

    # a poisoned enumeration aborts the platform loop without probing
    probed = []
    enum_calls = []

    def fake_enumerate(platform, timeout_s=0.2):
        enum_calls.append(platform)
        return None, True  # what _enumerate_devices returns on timeout

    t0 = time.monotonic()
    out = g._acquire_devices(8, probe=lambda d: probed.append(d) or True,
                             platforms=(None, "cpu"),
                             enumerate=fake_enumerate)
    assert out is None
    assert enum_calls == [None], "poisoned process must not try more platforms"
    assert not probed, "nothing must be probed after an enumeration hang"
    assert time.monotonic() - t0 < 5.0

    # the real helper enforces its deadline on a genuinely stuck callable
    import threading
    release = threading.Event()
    orig_devices = jax.devices

    def stuck_devices(platform=None):
        release.wait(30.0)  # far past the test deadline
        return orig_devices(platform)

    try:
        jax.devices = stuck_devices
        t0 = time.monotonic()
        devs, poisoned = g._enumerate_devices("cpu", timeout_s=0.5)
        assert poisoned and devs is None
        assert time.monotonic() - t0 < 5.0
    finally:
        jax.devices = orig_devices
        release.set()  # unblock the daemon thread promptly

    # healthy path still works through the deadline wrapper
    devs, poisoned = g._enumerate_devices("cpu", timeout_s=60.0)
    assert not poisoned and devs is not None and len(devs) >= 8


def test_dryrun_pins_default_device(monkeypatch):
    """MULTICHIP_r02 regression: eager ops inside the dryrun body must be
    committed to the ACQUIRED mesh's platform, not whatever the process
    default backend happens to be. Simulated by setting the global default
    device to a different device than the acquired mesh's first and
    checking the body observes the pinned one."""
    import __graft_entry__ as g

    devices = jax.devices()[:8]
    seen = {}

    def fake_body(devs, n):
        # an uncommitted eager op — lands on the effective default device
        seen["dev"] = next(iter(jnp.zeros(()).devices()))

    monkeypatch.setattr(g, "_dryrun_on_devices", fake_body)
    monkeypatch.setattr(g, "_acquire_devices",
                        lambda n, **kw: devices)
    with jax.default_device(devices[3]):  # hostile ambient default
        g.dryrun_multichip(8)
    assert seen["dev"] == devices[0]


def test_dryrun_body_deadline_on_remote_platform(monkeypatch):
    """Wedged-tunnel regression: the health probe proves one answer, not
    liveness — on a non-CPU platform the body runs under a deadline and a
    hang must surface as TimeoutError (-> subprocess fallback), while CPU
    devices run undeadlined (cold compiles may exceed any sane timeout)."""
    import threading
    import types

    import __graft_entry__ as g

    release = threading.Event()
    ran = {}

    def wedged_body(devs, n):
        ran["started"] = True
        release.wait(30.0)

    monkeypatch.setattr(g, "_dryrun_on_devices", wedged_body)
    fake_tpu = types.SimpleNamespace(platform="tpu")
    try:
        import pytest

        with pytest.raises(TimeoutError, match="wedged"):
            g._run_body_with_deadline([fake_tpu], 8, timeout_s=0.3)
        assert ran.get("started")
    finally:
        release.set()

    # CPU platform: direct call, no thread, exceptions propagate untouched
    def boom(devs, n):
        raise ValueError("direct")

    monkeypatch.setattr(g, "_dryrun_on_devices", boom)
    fake_cpu = types.SimpleNamespace(platform="cpu")
    try:
        g._run_body_with_deadline([fake_cpu], 8)
    except ValueError as e:
        assert "direct" in str(e)
    else:
        raise AssertionError("CPU-path exception must propagate")


def test_dryrun_falls_back_to_subprocess_on_body_failure(monkeypatch):
    """If the in-process dryrun dies for ANY reason, the last resort is the
    CPU-mesh subprocess — unless we already are that subprocess, in which
    case the failure must propagate (no recursion)."""
    import __graft_entry__ as g

    def boom(devs, n):
        raise RuntimeError("synthetic backend failure")

    called = {}
    monkeypatch.setattr(g, "_dryrun_on_devices", boom)
    monkeypatch.setattr(g, "_reexec_on_cpu_mesh",
                        lambda n: called.setdefault("n", n))
    monkeypatch.delenv(g._SUBPROC_ENV, raising=False)
    g.dryrun_multichip(8)
    assert called["n"] == 8

    monkeypatch.setenv(g._SUBPROC_ENV, "1")
    try:
        g.dryrun_multichip(8)
    except RuntimeError as e:
        assert "synthetic backend failure" in str(e)
    else:
        raise AssertionError("subprocess-mode failure must propagate")


def _dp_state_and_batch(state, batch, mesh):
    state = jax.device_put(state, NamedSharding(mesh, P()))
    batch = jax.device_put(
        batch, NamedSharding(mesh, P("data", *([None] * (batch.ndim - 1)))))
    return state, batch


def test_wgangp_dp_step_matches_single_device(rng):
    """mesh_shape is honored by EVERY victim trainer (round 3); the
    WGAN-GP step (grad-of-grad GP) must be DP-equal like DCGAN's."""
    from ganleaks_tpu.config import WGANGPConfig
    from ganleaks_tpu.train import wgangp as wtrain

    cfg = WGANGPConfig(ngf=8, ndf=8, nz=16, batch_size=16)
    real = jnp.asarray(rng.uniform(-1, 1, (16, 64, 64, 3))
                       .astype(np.float32))
    key = jax.random.key(1)
    s1 = wtrain.build_state(cfg, jax.random.key(0))
    o1, m1 = wtrain.wgangp_train_step(s1, real, key, critic_iter=2,
                                      lambda_gp=10.0)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    s2 = wtrain.build_state(cfg, jax.random.key(0))
    s2, real_sh = _dp_state_and_batch(s2, real, mesh)
    o2, m2 = wtrain.wgangp_train_step(s2, real_sh, key, critic_iter=2,
                                      lambda_gp=10.0)
    np.testing.assert_allclose(float(m1["loss_critic"]),
                               float(m2["loss_critic"]),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(o1.gen.params)),
                    jax.tree_util.tree_leaves(jax.device_get(o2.gen.params))):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-4)


def test_medgan_dp_step_matches_single_device(rng):
    from ganleaks_tpu.config import MedGANConfig
    from ganleaks_tpu.train import medgan as mtrain

    cfg = MedGANConfig(batch_size=16)
    rows = jnp.asarray((rng.uniform(size=(16, 32)) < 0.3)
                       .astype(np.float32))
    key = jax.random.key(1)
    s1 = mtrain.build_state(cfg, 32, jax.random.key(0))
    o1, m1 = mtrain.medgan_train_step(s1, rows, key)
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("data",))
    s2 = mtrain.build_state(cfg, 32, jax.random.key(0))
    s2, rows_sh = _dp_state_and_batch(s2, rows, mesh)
    o2, m2 = mtrain.medgan_train_step(s2, rows_sh, key)
    np.testing.assert_allclose(float(m1["d_loss"]), float(m2["d_loss"]),
                               rtol=1e-4, atol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(o1.gen.params)),
                    jax.tree_util.tree_leaves(jax.device_get(o2.gen.params))):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)


def test_trainers_honor_mesh_shape(rng, tmp_path, monkeypatch):
    """train() loops build the DP mesh from cfg.mesh_shape and shard
    batches — smoke on the 8-device CPU mesh for the trainers newly wired
    in round 3 (DCGAN already had it)."""
    monkeypatch.chdir(tmp_path)
    from ganleaks_tpu.config import WGANGPConfig
    from ganleaks_tpu.train import wgangp as wtrain

    imgs = rng.uniform(-1, 1, (16, 64, 64, 3)).astype(np.float32)
    cfg = WGANGPConfig(ngf=8, ndf=8, nz=16, batch_size=16, num_epochs=1,
                       mesh_shape=(8,), critic_iter=1, save_model=False,
                       generate=False)
    state = wtrain.train(cfg, images=imgs)
    assert np.isfinite(float(jax.tree_util.tree_leaves(
        state.gen.params)[0].sum()))
