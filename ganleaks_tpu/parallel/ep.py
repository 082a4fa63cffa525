"""Expert-parallel privGAN: one (generator, discriminator) split per device.

The vmapped split stacks (``train/priv.py``) are a leading parameter axis;
this lays that axis out over a mesh with ``shard_map`` — the closest thing
GAN-Leaks has to expert parallelism (SURVEY §2.4: "N generators trained on
N disjoint shards ... on TPU the N splits can also be laid out across
devices"). Per-split computations stay device-local; only the shared
private classifier crosses devices, via a gradient psum.

Numerical contract: with ``dp_on=False`` (and the same inputs/keys) this
produces bitwise-close results to ``train/priv.privdcgan_train_step``
(tested on the virtual 8-device mesh). With ``dp_on=True`` the psum'd
LOSS mean equals the reference's global mean (equal split sizes =>
mean-of-means == global mean), but the private classifier's BatchNorm
normalizes each device's B fakes with LOCAL batch statistics, where the
vmapped/reference step batches all S*B fakes through one BN batch — a
KNOWN schedule divergence (same class as the EP update-interleaving
divergence measured at −2e-4 AUROC by ``tools/ep_schedule_experiment.py``;
a sync-BN over the split axis would close it at the cost of two extra
psums per step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ganleaks_tpu.train.gan import bce_with_logits
from ganleaks_tpu.train.priv import (
    PrivGANState,
    softmax_cross_entropy_on_probs,
)

Array = jax.Array


def split_axis_specs(tree, n_splits: int, axis: str):
    """Spec tree for a STACKED split tree: every array leaf leads with the
    split axis by construction (``train/priv.stack_init``); only 0-dim
    leaves (optimizer step counters) are replicated. Shape-based detection
    would misfire when a parameter dim happens to equal n_splits."""
    def spec(x):
        if getattr(x, "ndim", 0) >= 1:
            assert x.shape[0] == n_splits, (
                f"stacked leaf must lead with the split axis, got {x.shape}")
            return P(axis, *([None] * (x.ndim - 1)))
        return P()
    return jax.tree_util.tree_map(spec, tree)


def shard_split_state(state: PrivGANState, mesh: Mesh,
                      axis: str = "split") -> PrivGANState:
    """Lay the stacked genS/discS over the mesh; priv + step replicated."""
    n = mesh.shape[axis]

    def put(tree):
        specs = split_axis_specs(tree, n, axis)
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            tree, specs)

    rep = NamedSharding(mesh, P())
    return state.replace(genS=put(state.genS), discS=put(state.discS),
                         priv=jax.device_put(state.priv, rep),
                         step=jax.device_put(state.step, rep))


def make_ep_privdcgan_step(mesh: Mesh, n_splits: int,
                           privacy_ratio: float, dp_on: bool,
                           axis: str = "split"):
    """Build the shard_map'd step. ``n_splits`` must equal the mesh size
    along ``axis`` (one split per device)."""
    assert mesh.shape[axis] == n_splits

    def step(state: PrivGANState, real: Array, rng: Array):
        genS, discS, priv = state.genS, state.discS, state.priv

        gen_specs = split_axis_specs(
            {"params": genS.params, "batch_stats": genS.batch_stats,
             "opt_state": genS.opt_state}, n_splits, axis)
        disc_specs = split_axis_specs(
            {"params": discS.params, "batch_stats": discS.batch_stats,
             "opt_state": discS.opt_state}, n_splits, axis)
        priv_tree = {"params": priv.params,
                     "batch_stats": priv.batch_stats,
                     "opt_state": priv.opt_state}
        priv_specs = jax.tree_util.tree_map(lambda _: P(), priv_tree)

        def local(gen_tree, disc_tree, priv_tree, real_s, rng):
            # local shard: leading axis length 1 -> squeeze
            me = jax.lax.axis_index(axis)
            unstack = lambda t: jax.tree_util.tree_map(
                lambda x: x[0] if x.ndim >= 1 else x, t)
            gp = unstack(gen_tree)
            dp_ = unstack(disc_tree)
            real_l = real_s[0]
            batch = real_l.shape[0]
            nz = gp["params"]["block0_conv"]["kernel"].shape[2]

            rng, k_noise, k_lab = jax.random.split(rng, 3)
            # draw global-shaped randomness and slice our split, so the
            # EP step matches the vmapped single-device step exactly
            noise_all = jax.random.normal(k_noise, (n_splits, batch, nz),
                                          real_l.dtype)
            noise = noise_all[me]
            r_all = jax.random.randint(k_lab, (n_splits, batch), 0,
                                       n_splits - 1)
            gen_y = r_all[me] + (r_all[me] >= me)

            fake, gmut = genS.apply_fn(
                {"params": gp["params"],
                 "batch_stats": gp["batch_stats"]}, noise, train=True,
                mutable=["batch_stats"])
            fake_sg = jax.lax.stop_gradient(fake)

            # --- local D step ---
            def d_loss_fn(params):
                v = {"params": params, "batch_stats": dp_["batch_stats"]}
                out_r, m1 = discS.apply_fn(v, real_l, train=True,
                                           mutable=["batch_stats"])
                v = {"params": params, "batch_stats": m1["batch_stats"]}
                out_f, m2 = discS.apply_fn(v, fake_sg, train=True,
                                           mutable=["batch_stats"])
                loss = (bce_with_logits(out_r, 1.0)
                        + bce_with_logits(out_f, 0.0)) / 2.0
                return loss, m2["batch_stats"]

            (loss_d, d_stats), d_grads = jax.value_and_grad(
                d_loss_fn, has_aux=True)(dp_["params"])
            d_updates, d_opt = discS.tx.update(d_grads, dp_["opt_state"],
                                               dp_["params"])
            d_params = optax.apply_updates(dp_["params"], d_updates)

            # --- shared private classifier: psum-averaged gradients ---
            priv_params = priv_tree["params"]
            priv_stats = priv_tree["batch_stats"]
            priv_opt = priv_tree["opt_state"]
            loss_dp = jnp.zeros(())
            labels = jnp.full((batch,), me, jnp.int32)
            if dp_on:
                def p_loss_fn(p):
                    v = {"params": p, "batch_stats": priv_stats}
                    logits, m = priv.apply_fn(v, fake_sg, train=True,
                                              mutable=["batch_stats"])
                    return softmax_cross_entropy_on_probs(logits, labels), \
                        m["batch_stats"]

                (loss_dp, p_stats), p_grads = jax.value_and_grad(
                    p_loss_fn, has_aux=True)(priv_params)
                p_grads = jax.lax.pmean(p_grads, axis)
                loss_dp = jax.lax.pmean(loss_dp, axis)
                p_stats = jax.lax.pmean(p_stats, axis)
                p_updates, priv_opt = priv.tx.update(p_grads, priv_opt,
                                                     priv_params)
                priv_params = optax.apply_updates(priv_params, p_updates)
                priv_stats = p_stats

            # --- local G step against updated local D + shared priv ---
            def g_loss_fn(params):
                gv = {"params": params, "batch_stats": gmut["batch_stats"]}
                fake2, gm = genS.apply_fn(gv, noise, train=True,
                                          mutable=["batch_stats"])
                dv = {"params": d_params, "batch_stats": d_stats}
                out, dm = discS.apply_fn(dv, fake2, train=True,
                                         mutable=["batch_stats"])
                # shared priv's G-step stats: consciously dropped, same
                # as the vmapped step (train/priv.py g_loss_fn comment)
                pv = {"params": priv_params, "batch_stats": priv_stats}
                plogits, _ = priv.apply_fn(pv, fake2, train=True,
                                           mutable=["batch_stats"])
                loss = (bce_with_logits(out, 1.0) + privacy_ratio
                        * softmax_cross_entropy_on_probs(plogits, gen_y))
                return loss, (gm["batch_stats"], dm["batch_stats"])

            (loss_g, (g_stats2, d_stats2)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(gp["params"])
            g_updates, g_opt = genS.tx.update(g_grads, gp["opt_state"],
                                              gp["params"])
            g_params = optax.apply_updates(gp["params"], g_updates)

            expand = lambda t: jax.tree_util.tree_map(
                lambda x: x[None] if getattr(x, "ndim", 0) >= 1
                or not hasattr(x, "ndim") else x,
                jax.tree_util.tree_map(jnp.asarray, t))
            # g_stats2/d_stats2: the G-step forwards advance BN running
            # stats too (torch train-mode discipline, matching the
            # vmapped step's g_stats/d_stats2 threading)
            gen_out = expand({"params": g_params,
                              "batch_stats": g_stats2,
                              "opt_state": g_opt})
            disc_out = expand({"params": d_params,
                               "batch_stats": d_stats2,
                               "opt_state": d_opt})
            priv_out = {"params": priv_params, "batch_stats": priv_stats,
                        "opt_state": priv_opt}
            metrics = {"loss_d": jax.lax.pmean(loss_d, axis),
                       "loss_dp": loss_dp,
                       "loss_g": jax.lax.pmean(loss_g, axis)}
            return gen_out, disc_out, priv_out, metrics

        mapped = jax.shard_map(
            local, mesh=mesh,
            in_specs=(gen_specs, disc_specs, priv_specs,
                      P(axis, *([None] * 4)), P()),
            out_specs=(gen_specs, disc_specs, priv_specs,
                       jax.tree_util.tree_map(lambda _: P(),
                                              {"loss_d": 0, "loss_dp": 0,
                                               "loss_g": 0})),
            check_vma=False)

        gen_tree = {"params": genS.params, "batch_stats": genS.batch_stats,
                    "opt_state": genS.opt_state}
        disc_tree = {"params": discS.params,
                     "batch_stats": discS.batch_stats,
                     "opt_state": discS.opt_state}
        gen_out, disc_out, priv_out, metrics = mapped(
            gen_tree, disc_tree, priv_tree, real, rng)
        new = state.replace(
            step=state.step + 1,
            genS=genS.replace(**gen_out),
            discS=discS.replace(**disc_out),
            priv=priv.replace(**priv_out))
        return new, metrics

    return jax.jit(step, donate_argnums=0)


def make_ep_privpggan_step(mesh: Mesh, n_splits: int,
                           privacy_ratio: float, dp_on: bool, steps: int,
                           lambda_gp: float = 10.0, drift: float = 0.001,
                           axis: str = "split"):
    """Expert-parallel privPGGAN: one (generator, critic) split per device
    (same layout as :func:`make_ep_privdcgan_step`); the shared private
    critic updates with psum-averaged gradients, mathematically identical
    to the vmapped all-splits step (equal split sizes, sum-of-per-split
    losses => per-split grads are local). PGGAN modules are BN-free, so
    only params/opt_state travel. ``alpha`` is a traced call argument
    (per-batch fade-in, ``privPGGAN.py:170-176``)."""
    from ganleaks_tpu.train.pggan import gradient_penalty_fn

    assert mesh.shape[axis] == n_splits

    def step_fn(state: PrivGANState, real: Array, alpha, rng: Array):
        genS, criticS, priv = state.genS, state.discS, state.priv

        gen_specs = split_axis_specs(
            {"params": genS.params, "opt_state": genS.opt_state},
            n_splits, axis)
        disc_specs = split_axis_specs(
            {"params": criticS.params, "opt_state": criticS.opt_state},
            n_splits, axis)
        priv_tree = {"params": priv.params, "opt_state": priv.opt_state}
        priv_specs = jax.tree_util.tree_map(lambda _: P(), priv_tree)

        def local(gen_tree, disc_tree, priv_tree, real_s, alpha, rng):
            me = jax.lax.axis_index(axis)
            unstack = lambda t: jax.tree_util.tree_map(
                lambda x: x[0] if getattr(x, "ndim", 0) >= 1 else x, t)
            gp_t = unstack(gen_tree)
            cp_t = unstack(disc_tree)
            real_l = real_s[0]
            batch = real_l.shape[0]
            # HWIO kernel (ops/nn.ConvTranspose2dTorch): axis 2 is the
            # INPUT channel count == nz (axis 3 is output channels —
            # using it only worked when nz happened to equal in_channels)
            nz = gp_t["params"]["initial_convt"]["kernel"].shape[2]

            rng, k_noise, k_eps, k_lab = jax.random.split(rng, 4)
            # global-shaped randomness sliced per split: bitwise-matches
            # the vmapped single-device step (train/priv.py:294-297)
            noise = jax.random.normal(
                k_noise, (n_splits, batch, nz), real_l.dtype)[me]
            eps = jax.random.uniform(
                k_eps, (n_splits, batch, 1, 1, 1), real_l.dtype)[me]
            r_all = jax.random.randint(k_lab, (n_splits, batch), 0,
                                       n_splits - 1)
            gen_y = r_all[me] + (r_all[me] >= me)

            fake = genS.apply_fn({"params": gp_t["params"]}, noise, steps,
                                 alpha)
            fake_sg = jax.lax.stop_gradient(fake)

            # --- local critic step (privPGGAN.py:161-183) ---
            def c_loss_fn(cp):
                c_real = criticS.apply_fn({"params": cp}, real_l, steps,
                                          alpha)
                c_fake = criticS.apply_fn({"params": cp}, fake_sg, steps,
                                          alpha)
                gpen = gradient_penalty_fn(criticS.apply_fn, cp, real_l,
                                           fake_sg, eps, steps, alpha)
                return (-(jnp.mean(c_real) - jnp.mean(c_fake))
                        + lambda_gp * gpen
                        + drift * jnp.mean(jnp.square(c_real)))

            loss_c, c_grads = jax.value_and_grad(c_loss_fn)(cp_t["params"])
            c_updates, c_opt = criticS.tx.update(c_grads, cp_t["opt_state"],
                                                 cp_t["params"])
            c_params = optax.apply_updates(cp_t["params"], c_updates)

            # --- shared private critic: psum-averaged grads
            #     (resolution gate applied by the caller via dp_on) ---
            priv_params = priv_tree["params"]
            priv_opt = priv_tree["opt_state"]
            loss_dp = jnp.zeros(())
            labels = jnp.full((batch,), me, jnp.int32)
            if dp_on:
                def p_loss_fn(p):
                    logits = priv.apply_fn({"params": p}, fake_sg, steps,
                                           alpha)
                    return softmax_cross_entropy_on_probs(logits, labels)

                loss_dp, p_grads = jax.value_and_grad(p_loss_fn)(
                    priv_params)
                p_grads = jax.lax.pmean(p_grads, axis)
                loss_dp = jax.lax.pmean(loss_dp, axis)
                p_updates, priv_opt = priv.tx.update(p_grads, priv_opt,
                                                     priv_params)
                priv_params = optax.apply_updates(priv_params, p_updates)

            # --- local G step against updated critic + shared priv ---
            def g_loss_fn(gp):
                fake2 = genS.apply_fn({"params": gp}, noise, steps, alpha)
                out1 = criticS.apply_fn({"params": c_params}, fake2,
                                        steps, alpha)
                out2 = priv.apply_fn({"params": priv_params}, fake2,
                                     steps, alpha)
                return (-jnp.mean(out1) + privacy_ratio
                        * softmax_cross_entropy_on_probs(out2, gen_y))

            loss_g, g_grads = jax.value_and_grad(g_loss_fn)(gp_t["params"])
            g_updates, g_opt = genS.tx.update(g_grads, gp_t["opt_state"],
                                              gp_t["params"])
            g_params = optax.apply_updates(gp_t["params"], g_updates)

            expand = lambda t: jax.tree_util.tree_map(
                lambda x: x[None] if getattr(x, "ndim", 0) >= 1
                or not hasattr(x, "ndim") else x,
                jax.tree_util.tree_map(jnp.asarray, t))
            gen_out = expand({"params": g_params, "opt_state": g_opt})
            disc_out = expand({"params": c_params, "opt_state": c_opt})
            priv_out = {"params": priv_params, "opt_state": priv_opt}
            metrics = {"loss_critic": jax.lax.pmean(loss_c, axis),
                       "loss_dp": loss_dp,
                       "loss_gen": jax.lax.pmean(loss_g, axis)}
            return gen_out, disc_out, priv_out, metrics

        mapped = jax.shard_map(
            local, mesh=mesh,
            in_specs=(gen_specs, disc_specs, priv_specs,
                      P(axis, *([None] * 4)), P(), P()),
            out_specs=(gen_specs, disc_specs, priv_specs,
                       jax.tree_util.tree_map(
                           lambda _: P(), {"loss_critic": 0, "loss_dp": 0,
                                           "loss_gen": 0})),
            check_vma=False)

        gen_tree = {"params": genS.params, "opt_state": genS.opt_state}
        disc_tree = {"params": criticS.params,
                     "opt_state": criticS.opt_state}
        gen_out, disc_out, priv_out, metrics = mapped(
            gen_tree, disc_tree, priv_tree, real, alpha, rng)
        new = state.replace(
            step=state.step + 1,
            genS=genS.replace(**gen_out),
            discS=criticS.replace(**disc_out),
            priv=priv.replace(**priv_out))
        return new, metrics

    return jax.jit(step_fn, donate_argnums=0)
