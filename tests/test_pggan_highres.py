"""PGGAN past 64x64: the reference's factor schedule
(``gan_models/pggan/model_torch.py:6``) reaches 1024x1024, but its shipped
config only ever trains to 64 (``pggan_config.yaml:5-9``). These tests
validate the progressive machinery at every step up to 8 (1024px) with
tiny widths — shapes, the channel-factor schedule, a real optimizer step
at 128/256px, and a full multi-resolution ``train()`` past 64."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ganleaks_tpu.config import PGGANConfig
from ganleaks_tpu.models import pggan as pggan_m
from ganleaks_tpu.train import pggan as pggan_t


def test_pggan_shapes_to_1024():
    """G/D forward at every step 0..8 (4px..1024px) with in_channels=32
    — the full reference schedule (``model_torch.py:6,63-69``), which no
    shipped config exercises past step 4."""
    in_ch = 32
    gen = pggan_m.Generator(nz=16, in_channels=in_ch, nc=3)
    disc = pggan_m.Discriminator(in_channels=in_ch, nc=3)
    gv = pggan_m.init_progressive(gen, jax.random.key(0),
                                  jnp.zeros((1, 16)), 8)
    dv = pggan_m.init_progressive(disc, jax.random.key(1),
                                  jnp.zeros((1, 4, 4, 3)), 8)
    z = jax.random.normal(jax.random.key(2), (2, 16))
    for steps in range(9):
        res = 4 * 2 ** steps
        img = gen.apply(gv, z, steps, 0.5)
        assert img.shape == (2, res, res, 3), steps
        if steps > 0:
            assert float(jnp.abs(img).max()) <= 1.0
        score = disc.apply(dv, img, steps, 0.5)
        assert score.shape == (2, 1), steps
        assert np.all(np.isfinite(np.asarray(score)))

    # channel-factor schedule: prog block k outputs in_ch*FACTORS[k+1]
    # feature maps (model_torch.py:63-66)
    for k in range(8):
        want = int(in_ch * pggan_m.FACTORS[k + 1])
        kernel = gv["params"][f"prog{k}"]["conv1"]["conv"]["kernel"]
        assert kernel.shape[-1] == want, (k, kernel.shape)
    assert int(in_ch * pggan_m.FACTORS[8]) == 1  # 1024px block is 1-wide


@pytest.mark.parametrize("steps,res", [(5, 128), (6, 256)])
def test_pggan_train_step_highres(rng, steps, res):
    """One real optimizer step (WGAN-GP + drift, grad-of-grad) at 128px
    and 256px — resolutions the trainer was never run at before."""
    cfg = PGGANConfig(nz=16, in_channels=32, image_size=res,
                      batch_sizes=(2,) * (steps + 1))
    state = pggan_t.build_state(cfg, jax.random.key(0), steps)
    real = jnp.asarray(
        rng.uniform(-1, 1, (2, res, res, 3)).astype(np.float32))
    before = jax.tree_util.tree_map(np.asarray, state)
    state2, metrics = pggan_t.pggan_train_step(
        state, real, jnp.float32(0.5), jax.random.key(1), steps,
        10.0, 0.001, compute_dtype="float32")
    assert np.isfinite(float(metrics["loss_critic"]))
    assert np.isfinite(float(metrics["loss_gen"]))
    changed = any(
        not np.allclose(x, y) for x, y in
        zip(jax.tree_util.tree_leaves(before.gen.params),
            jax.tree_util.tree_leaves(state2.gen.params)))
    assert changed


def test_pggan_progressive_train_past_64(tmp_path, rng):
    """Full progressive ``train()`` through SIX resolutions (4..128):
    validates the per-resolution recompile + alpha ramp + NEAREST
    re-resize schedule beyond the reference's 64px ceiling
    (``train.py:169-199``), then samples at the final resolution."""
    cfg = PGGANConfig(nz=16, in_channels=16, image_size=128,
                      start_img_size=4, num_epochs=1,
                      batch_sizes=(4,) * 6, num_generated=4,
                      compute_dtype="float32",
                      PATH=str(tmp_path / "m"),
                      PATH_syn_data=str(tmp_path / "s"))
    images = rng.uniform(-1, 1, (8, 128, 128, 3)).astype(np.float32)
    state = pggan_t.train(cfg, images=images)
    dirs = pggan_t.generate(cfg, state, run_dir="t")
    import os
    z = np.load(os.path.join(dirs["npz_images"],
                             "pggan_synthetic_data.npz"))
    assert z["fake"].shape == (4, 3, 128, 128)
    assert np.all(np.isfinite(z["fake"]))
