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
