"""Round-4 on-chip measurement harness: one measured row per BASELINE
config (BASELINE.json `configs`), driven through the real trainers,
CLIs-equivalent attack drivers, and on-disk artifacts.

The reference has no benchmark harness at all (SURVEY.md §6); each row
here mirrors one of its documented workload scales:

  dcgan         full victim lifecycle at reference scale (config #1 +
                VERDICT r3 task #5): train 100 epochs / batch 32
                (``gan_models/dcgan/dcgan_config.yaml:1-5``) on 10,020
                fixture images (members x3 augmentations, z_split.py
                semantics), sample 2,040, fbb attack (pixel-L2 AND
                l2-lpips), eval AUROC. Per-stage wall-clock.
  wgangp        config #2: train at the reference's default 5 epochs
                (``gan_models/wgangp/train.py:34``), sample 2,040,
                fbb with LPIPS AlexNet features, eval.
  vaegan        config #3: short train, sample 20,000
                (``gan_models/vaegan/sample.py:17``), encoder-seeded
                reconstruction attack + fbb on the same query set, eval.
  medgan        config #4: train at reference scale (1,000 epochs,
                batch 2,000, ``gan_models/medgan/train.py:28-31``) on a
                synthetic binary EHR matrix, dump ``synthetic.npy``,
                tabular fbb, eval.
  pggan_highres VERDICT r3 task #3b: sample a 256x256 PGGAN synthetic
                set, fbb-attack it with engine='auto' and ASSERT the
                int8->taps degrade fires (the s32 dot bound makes
                taps-int8 statically infeasible at this resolution).
  privdcgan     VERDICT r3 task #6: privDCGAN 2-point privacy_ratio
                grid (``gan_models/dcgan/grid_search.yaml:1``), sweep
                attack over the grid subdirs (fbb.py:113-123 semantics),
                eval raw + reference-model-calibrated AUROC.
  npz_e2e       VERDICT r3 task #4: the 100k x 20k north-star attack
                end-to-end from NPZ array dumps on disk (io/npz ingest
                — skips the host PNG decode that bounds the real-data
                wall clock).

Membership fixtures: queries and training data come from one low-rank
image manifold (members = training images, non-members = held-out draws
from the same manifold), so AUROC is a real membership signal, not a
distribution-shift artifact. Where no training happens (pggan_highres)
members are planted as perturbed copies of synthetic samples, like
tests/test_pipeline_e2e.py's fixture.

    python tools/round4_measure.py --only dcgan,wgangp
    python tools/round4_measure.py            # all rows
Rows append to round4_results.jsonl (repo root); artifacts under
--workdir (default /tmp/round4).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.environ.get("R4_RESULTS",
                         os.path.join(REPO, "round4_results.jsonl"))
SMOKE = False  # --smoke: tiny scales for a CPU plumbing check


def _assert_finite(obj, path="row") -> None:
    """Refuse to record non-finite metrics — a NaN'd AUROC emitted as a
    number once masqueraded as a result (ADVICE r4 #2)."""
    if isinstance(obj, dict):
        for k, v in obj.items():
            _assert_finite(v, f"{path}.{k}")
    elif isinstance(obj, (list, tuple)):
        for i, v in enumerate(obj):
            _assert_finite(v, f"{path}[{i}]")
    elif isinstance(obj, float) and not np.isfinite(obj):
        raise ValueError(f"non-finite metric at {path}: {obj!r} — refusing "
                         f"to emit a degenerate row")


def emit(row: dict) -> None:
    _assert_finite(row)
    # smoke rows are labeled AND kept out of the canonical results file
    # (ADVICE r4 #3: a smoke run must not contaminate round4_results.jsonl)
    row = dict(row, smoke=SMOKE, ts=time.strftime("%Y-%m-%d %H:%M:%S"))
    with open(RESULTS, "a") as f:
        f.write(json.dumps(row) + "\n")
    print("ROW " + json.dumps(row), flush=True)


class Stages:
    def __init__(self):
        self.t: dict[str, float] = {}

    def run(self, name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        import jax
        jax.block_until_ready(out) if out is not None else None
        self.t[name] = round(time.perf_counter() - t0, 2)
        print(f"  [{name}] {self.t[name]:.2f}s", flush=True)
        return out


def make_manifold(n: int, res: int, seed: int, rank: int = 32) -> np.ndarray:
    """Images in [-1, 1] from one shared low-rank manifold."""
    rng = np.random.default_rng(seed)
    basis = rng.normal(0, 1, (rank, res * res * 3)).astype(np.float32)
    out = np.empty((n, res, res, 3), np.float32)
    step = 4096
    for i in range(0, n, step):  # bound peak host memory on the 1-core box
        c = rng.normal(0, 1, (min(step, n - i), rank)).astype(np.float32)
        out[i:i + len(c)] = np.tanh(c @ basis / np.sqrt(rank)).reshape(
            -1, res, res, 3)
    return out


def augment3(members: np.ndarray, seed: int) -> np.ndarray:
    """members + shifted-crop + hflip = the z_split.py:83-90 triplet."""
    rng = np.random.default_rng(seed)
    shifts = rng.integers(-4, 5, size=(len(members), 2))
    a1 = np.stack([np.roll(m, tuple(s), axis=(0, 1))
                   for m, s in zip(members, shifts)])
    a2 = members[:, :, ::-1]
    return np.concatenate([members, a1, a2])


def write_query_npz(path: str, imgs_pm1: np.ndarray) -> str:
    np.savez(path, images=((imgs_pm1 + 1.0) / 2.0).astype(np.float32))
    return path


def write_query_pngs(d: str, imgs_pm1: np.ndarray) -> str:
    """PNG-dir variant for readers without NPZ ingest (reconstruction)."""
    from ganleaks_tpu.io.images import save_png
    os.makedirs(d, exist_ok=True)
    for i, img in enumerate((imgs_pm1 + 1.0) / 2.0):
        save_png(img, os.path.join(d, f"q_{i:05d}.png"))
    return d


def attack_and_eval(workdir: str, tag: str, syn_path: str, pos: str,
                    neg: str, stages: Stages, *, distance: str = "l2-lpips",
                    lpips_net: str = "vgg", resolution: int = 64,
                    data_num: int = 20000, engine: str = "auto",
                    save_plots: bool = False, stage_prefix: str = "",
                    hyperparameter_search: bool = False):
    from ganleaks_tpu.attack.eval_roc import evaluate
    from ganleaks_tpu.attack.fbb import run_attack
    from ganleaks_tpu.config import AttackConfig, EvalConfig

    acfg = AttackConfig(exp_name=tag, syn_data_path=syn_path,
                        pos_data_dir=pos, neg_data_dir=neg,
                        resolution=resolution, distance=distance,
                        lpips_net=lpips_net, engine=engine,
                        data_num=data_num, save_plots=save_plots,
                        hyperparameter_search=hyperparameter_search,
                        save_root=os.path.join(workdir, "fbb_attack"))
    results = stages.run(stage_prefix + "attack", lambda: run_attack(acfg))
    evals = []
    for r in results:
        out = evaluate(EvalConfig(result_load_dir=r["save_dir"]))
        evals.append({"save_dir": r["save_dir"], "auc": float(out["auc"]),
                      "ap": float(out["ap"])})
    return evals


# ---------------------------------------------------------------------------

def run_dcgan(workdir: str) -> None:
    from ganleaks_tpu.config import DCGANConfig
    from ganleaks_tpu.train import dcgan

    st = Stages()
    res, n_m = 64, (24 if SMOKE else 3340)
    members = make_manifold(n_m, res, seed=10)
    nonmembers = make_manifold(n_m, res, seed=11)
    train_imgs = augment3(members, seed=12)          # 10,020 images
    pos = write_query_npz(os.path.join(workdir, "pos.npz"), members)
    neg = write_query_npz(os.path.join(workdir, "neg.npz"), nonmembers)

    cfg = DCGANConfig(batch_size=8 if SMOKE else 32,
                      num_epochs=1 if SMOKE else 100,
                      num_generated=32 if SMOKE else 2040,
                      image_size=res, PATH=os.path.join(workdir, "model"),
                      PATH_syn_data=os.path.join(workdir, "syn"),
                      sample_grid_dir=None, seed=0)
    state = st.run(f"train_{cfg.num_epochs}ep",
                   lambda: dcgan.train(cfg, images=train_imgs))
    dirs = st.run(f"sample_{cfg.num_generated}",
                  lambda: dcgan.generate(cfg, state, "r4"))

    ev_l2 = attack_and_eval(workdir, "dcgan_l2", dirs["npz_images"], pos,
                            neg, st, distance="l2", resolution=res,
                            data_num=n_m, stage_prefix="l2_")
    ev_lp = attack_and_eval(workdir, "dcgan_lpips", dirs["npz_images"], pos,
                            neg, st, distance="l2-lpips", resolution=res,
                            data_num=n_m, save_plots=True,
                            stage_prefix="lpips_")
    emit({"config": "dcgan_lifecycle", "scale":
          {"train": len(train_imgs), "epochs": cfg.num_epochs,
           "batch": cfg.batch_size, "generated": cfg.num_generated,
           "queries": 2 * n_m},
          "stages_s": st.t, "auroc_l2": ev_l2[0]["auc"],
          "auroc_lpips": ev_lp[0]["auc"]})


def run_wgangp(workdir: str) -> None:
    from ganleaks_tpu.config import WGANGPConfig
    from ganleaks_tpu.train import wgangp

    st = Stages()
    res, n_m = 64, (24 if SMOKE else 3340)
    members = make_manifold(n_m, res, seed=20)
    nonmembers = make_manifold(n_m, res, seed=21)
    train_imgs = augment3(members, seed=22)
    pos = write_query_npz(os.path.join(workdir, "pos.npz"), members)
    neg = write_query_npz(os.path.join(workdir, "neg.npz"), nonmembers)

    cfg = WGANGPConfig(batch_size=8 if SMOKE else 32,
                       num_epochs=1 if SMOKE else 5,
                       num_generated=32 if SMOKE else 2040,
                       image_size=res, PATH=os.path.join(workdir, "model"),
                       PATH_syn_data=os.path.join(workdir, "syn"),
                       sample_grid_dir=None, seed=0)
    state = st.run(f"train_{cfg.num_epochs}ep",
                   lambda: wgangp.train(cfg, images=train_imgs))
    dirs = st.run(f"sample_{cfg.num_generated}",
                  lambda: wgangp.generate(cfg, state, "r4"))
    ev = attack_and_eval(workdir, "wgangp_alex", dirs["npz_images"], pos,
                         neg, st, distance="l2-lpips", lpips_net="alex",
                         resolution=res, data_num=n_m)
    emit({"config": "wgangp_lpips_alex", "scale":
          {"train": len(train_imgs), "epochs": cfg.num_epochs,
           "batch": cfg.batch_size, "generated": cfg.num_generated,
           "queries": 2 * n_m},
          "stages_s": st.t, "auroc": ev[0]["auc"]})


def run_vaegan(workdir: str) -> None:
    from ganleaks_tpu.attack.eval_roc import evaluate
    from ganleaks_tpu.attack.reconstruction import run_reconstruction_attack
    from ganleaks_tpu.config import (EvalConfig, ReconstructionConfig,
                                     VAEGANConfig)
    from ganleaks_tpu.train import vaegan

    st = Stages()
    # default 10: the fixture manifold sends the hinge D NaN around
    # epoch 15 (VAE-GAN instability, faithful to the reference's loss);
    # stop before it for a sane encoder
    nepoch = 1 if SMOKE else int(os.environ.get("R4_VAEGAN_EPOCHS", "10"))
    res, n_m = 64, (24 if SMOKE else 2000)
    members = make_manifold(n_m, res, seed=30)
    nonmembers = make_manifold(n_m, res, seed=31)
    # the reconstruction reader consumes PNG dirs (vaegan center-crop
    # semantics, attack/reconstruction.py:93-95); fbb shares them
    pos = write_query_pngs(os.path.join(workdir, "pos_png"), members)
    neg = write_query_pngs(os.path.join(workdir, "neg_png"), nonmembers)

    cwd = os.getcwd()
    os.chdir(workdir)  # vaegan.train writes results/<exp_name>
    try:
        cfg = VAEGANConfig(exp_name="r4", nepoch=nepoch,
                           num_samples=64 if SMOKE else 20000,
                           steps_per_epoch=2 if SMOKE else 78,
                           batch_size=8 if SMOKE else 64,
                           image_size=res, seed=0, checkpoint_every=1)
        state = st.run(f"train_{nepoch}ep",
                       lambda: vaegan.train(cfg, images=members,
                                            resume=False))
        out_dir = os.path.join(workdir, "vaegan_samples")
        st.run(f"sample_{cfg.num_samples}",
               lambda: vaegan.sample(cfg, state, out_dir))
        save_dir = os.path.join(workdir, "results", "r4")

        rcfg = ReconstructionConfig(
            exp_name="vaegan_recon", pos_data_dir=pos, neg_data_dir=neg,
            data_num=n_m, resolution=res,
            reader="resize",  # fixture PNGs are already 64x64

            netE=os.path.join(save_dir, "netE.msgpack"),
            netG=os.path.join(save_dir, "netG.msgpack"),
            save_root=os.path.join(workdir, "recon_attack"),
            save_plots=False)
        rout = st.run("recon_attack",
                      lambda: run_reconstruction_attack(rcfg))
        recon_auc = float(evaluate(EvalConfig(
            result_load_dir=rout["save_dir"]))["auc"])

        # point the attack at the NPZ dump EXPLICITLY: out_dir also holds
        # the 10x10 samples.png grid, and the format resolver probes
        # images first by design (io/npz.resolve_input_format) — passing
        # the dir attacked ONE grid image (n_syn=1) while labeling the
        # row 20,000 samples (rounds 4 and the first round-5 rerun)
        ev = attack_and_eval(workdir, "vaegan_fbb",
                             os.path.join(out_dir, "generated.npz"),
                             pos, neg, st, distance="l2-lpips",
                             resolution=res, data_num=n_m)
    finally:
        os.chdir(cwd)
    emit({"config": "vaegan_recon_plus_fbb", "scale":
          {"train": n_m, "epochs": nepoch, "samples": cfg.num_samples,
           "queries": 2 * n_m},
          "stages_s": st.t, "auroc_recon": recon_auc,
          "auroc_fbb": ev[0]["auc"]})


def run_medgan(workdir: str) -> None:
    from ganleaks_tpu.attack.eval_roc import evaluate
    from ganleaks_tpu.attack.tabular import run_tabular_attack
    from ganleaks_tpu.config import (EvalConfig, MedGANConfig,
                                     TabularAttackConfig)
    from ganleaks_tpu.train import medgan

    st = Stages()
    n, d = (100, 37) if SMOKE else (10000, 1071)  # MIMIC-III-shaped binary matrix
    rng = np.random.default_rng(40)
    w = rng.normal(0, 1, (16, d)).astype(np.float32)
    z = rng.normal(0, 1, (n, 16)).astype(np.float32)
    probs = 1.0 / (1.0 + np.exp(-(z @ w) - 2.0))   # sparse-ish features
    x = (rng.uniform(size=(n, d)) < probs).astype(np.float32)
    cut = int(0.9 * n)
    train_rows, test_rows = x[:cut], x[cut:]        # the 90/10 split

    cfg = MedGANConfig(n_epochs=2 if SMOKE else 1000,
                       n_epochs_pretrain=1 if SMOKE else 100,
                       batch_size=20 if SMOKE else 2000,
                       generate_N=64 if SMOKE else 10000,
                       PATH=os.path.join(workdir, "model"), seed=0)
    state = st.run(f"train_{cfg.n_epochs}ep",
                   lambda: medgan.train(cfg, data=train_rows,
                                        test_data=test_rows))
    syn_dir = os.path.join(workdir, "syn")
    st.run(f"generate_{cfg.generate_N}",
           lambda: medgan.generate(cfg, state, out_dir=syn_dir))

    pos_p = os.path.join(workdir, "pos.npy")
    neg_p = os.path.join(workdir, "neg.npy")
    nq = min(1000, len(test_rows))
    np.save(pos_p, train_rows[:nq])
    np.save(neg_p, test_rows[:nq])
    tcfg = TabularAttackConfig(
        exp_name="medgan_r4",
        syn_data_path=os.path.join(syn_dir, "synthetic.npy"),
        pos_data_path=pos_p, neg_data_path=neg_p, data_num=nq,
        save_root=os.path.join(workdir, "fbb_attack"))
    tout = st.run("tabular_attack", lambda: run_tabular_attack(tcfg))
    auc = float(evaluate(EvalConfig(
        result_load_dir=tout["save_dir"]))["auc"])
    emit({"config": "medgan_tabular", "scale":
          {"rows": n, "features": d, "epochs": cfg.n_epochs,
           "batch": cfg.batch_size, "generated": cfg.generate_N,
           "queries": 2 * nq},
          "stages_s": st.t,
          "query_pairs_per_sec": tout.get("query_pairs_per_sec"),
          "auroc": auc})


def run_pggan_highres(workdir: str) -> None:
    import jax

    from ganleaks_tpu.attack.fbb import resolve_auto_engine
    from ganleaks_tpu.config import AttackConfig, PGGANConfig
    from ganleaks_tpu.train import pggan
    from ganleaks_tpu.train.sample import sample_to_host

    st = Stages()
    res, n_syn, n_q = 256, (48 if SMOKE else 4096), (8 if SMOKE else 512)
    cfg = PGGANConfig(image_size=res, batch_sizes=(16,) * 7,
                      num_generated=n_syn,
                      PATH=os.path.join(workdir, "model"),
                      PATH_syn_data=os.path.join(workdir, "syn"), seed=0)
    state = pggan.build_state(cfg, jax.random.key(0), max_steps=6)

    def sample_syn():
        variables = {"params": state.gen.params}
        fn = pggan._sample_fn(cfg.nz, cfg.in_channels, cfg.nc, 6)
        _, img01 = sample_to_host(fn, variables, n_syn, cfg.nz, 64,
                                  jax.random.key(1))
        return img01

    img01 = st.run(f"sample_{n_syn}@{res}", sample_syn)
    syn_p = os.path.join(workdir, "pggan_syn.npz")
    np.savez(syn_p, images=img01.astype(np.float32))

    # planted members: perturbed copies of synthetic samples (the
    # fixture-oracle pattern of tests/test_pipeline_e2e.py)
    rng = np.random.default_rng(50)
    base = img01[:n_q] * 2.0 - 1.0
    pos_imgs = np.clip(base + rng.normal(0, 0.08, base.shape)
                       .astype(np.float32), -1, 1)
    neg_imgs = make_manifold(n_q, res, seed=51)
    pos = write_query_npz(os.path.join(workdir, "pos.npz"), pos_imgs)
    neg = write_query_npz(os.path.join(workdir, "neg.npz"), neg_imgs)

    probe = AttackConfig(engine="auto", resolution=res)
    resolved = resolve_auto_engine(probe).engine
    if jax.default_backend() == "tpu":
        # the int8->taps degrade is a TPU s32-dot-bound decision; off-TPU
        # the resolver returns 'gemm' and this config is just a plumbing
        # check (ADVICE r4 #4)
        assert resolved == "taps", (
            f"auto at {res}px resolved to {resolved!r}; expected the "
            f"int8->taps degrade (s32 dot bound, ops/knn._part_bounds_for)")
    else:
        print(f"  [pggan_highres] off-TPU: auto resolved to {resolved!r}; "
              f"taps assert skipped", flush=True)

    ev = attack_and_eval(workdir, "pggan256", syn_p, pos, neg, st,
                         distance="l2-lpips", resolution=res,
                         data_num=n_q)
    emit({"config": "pggan_highres_256", "scale":
          {"generated": n_syn, "queries": 2 * n_q, "resolution": res},
          "stages_s": st.t, "resolved_engine": resolved,
          "auroc": ev[0]["auc"]})


def run_privdcgan(workdir: str) -> None:
    from ganleaks_tpu.attack.eval_roc import evaluate
    from ganleaks_tpu.config import DCGANConfig, EvalConfig, PrivGANConfig
    from ganleaks_tpu.train import dcgan, priv

    st = Stages()
    res, n_m, epochs = 64, (32 if SMOKE else 2048), (1 if SMOKE else 20)
    members = make_manifold(n_m, res, seed=60)
    nonmembers = make_manifold(n_m, res, seed=61)
    nq = min(512, n_m // 2)
    pos = write_query_npz(os.path.join(workdir, "pos.npz"), members[:nq])
    neg = write_query_npz(os.path.join(workdir, "neg.npz"),
                          nonmembers[:nq])

    grid = [0.1, 5.0]  # privacy_ratio axis of grid_search.yaml:1
    base = DCGANConfig(batch_size=8 if SMOKE else 32, num_epochs=epochs,
                       num_generated=32 if SMOKE else 1024, image_size=res,
                       PATH=os.path.join(workdir, "model"),
                       PATH_syn_data=os.path.join(workdir, "syn"),
                       sample_grid_dir=None, seed=0)
    for pr in grid:
        pcfg = PrivGANConfig(N_splits=2, privacy_ratio=pr, dp_delay=5)
        tag = f"pr{pr}_ns2"
        state = st.run(f"train_pr{pr}",
                       lambda: priv.train_privdcgan(base, pcfg,
                                                    images=members))
        st.run(f"sample_pr{pr}",
               lambda: priv.generate_privdcgan(base, pcfg, state,
                                               run_dir=tag))

    # reference model for calibration: a vanilla DCGAN trained on PUBLIC
    # (non-member) data, attacked with the same queries (eval_roc.py:86-103)
    ref_cfg = DCGANConfig(batch_size=8 if SMOKE else 32,
                          num_epochs=epochs,
                          num_generated=32 if SMOKE else 1024,
                          image_size=res,
                          PATH=os.path.join(workdir, "ref_model"),
                          PATH_syn_data=os.path.join(workdir, "ref_syn"),
                          sample_grid_dir=None, seed=1)
    ref_state = st.run("train_ref",
                       lambda: dcgan.train(ref_cfg, images=nonmembers))
    ref_dirs = st.run("sample_ref",
                      lambda: dcgan.generate(ref_cfg, ref_state, "ref"))
    ref_ev = attack_and_eval(workdir, "priv_ref", ref_dirs["npz_images"],
                             pos, neg, st, distance="l2-lpips",
                             resolution=res, data_num=nq,
                             stage_prefix="ref_")
    ref_dir = ref_ev[0]["save_dir"]

    # directory sweep over the grid subdirs (fbb.py:113-123)
    sweep_root = os.path.join(workdir, "syn", "privDCGAN", "npz_images")
    evs = attack_and_eval(workdir, "priv_sweep", sweep_root, pos, neg, st,
                          distance="l2-lpips", resolution=res,
                          data_num=nq, hyperparameter_search=True,
                          stage_prefix="sweep_")
    rows = []
    for tag, ev in zip(sorted(f"pr{p}_ns2" for p in grid),
                       sorted(evs, key=lambda e: e["save_dir"])):
        cal = evaluate(EvalConfig(result_load_dir=ev["save_dir"],
                                  reference_load_dir=ref_dir))
        rows.append({"grid": tag, "auroc_raw": ev["auc"],
                     "auroc_calibrated": float(cal["auc_calibrated"])})
    emit({"config": "privdcgan_grid", "scale":
          {"train": n_m, "epochs": epochs, "splits": 2,
           "generated_per_point": base.num_generated, "queries": 2 * nq},
          "stages_s": st.t, "grid_points": rows,
          "reference_auroc": ref_ev[0]["auc"]})


def run_npz_e2e(workdir: str) -> None:
    st = Stages()
    res, n_syn, n_q = 64, (200 if SMOKE else 100000), (20 if SMOKE else 10000)
    rng = np.random.default_rng(70)

    def build():
        syn = rng.integers(0, 256, (n_syn, res, res, 3), dtype=np.uint8)
        np.savez(os.path.join(workdir, "syn.npz"), images=syn)
        pos = rng.integers(0, 256, (n_q, res, res, 3), dtype=np.uint8)
        neg = rng.integers(0, 256, (n_q, res, res, 3), dtype=np.uint8)
        np.savez(os.path.join(workdir, "pos.npz"), images=pos)
        np.savez(os.path.join(workdir, "neg.npz"), images=neg)

    st.run("write_npz_1.5GB", build)
    ev = attack_and_eval(workdir, "npz_e2e",
                         os.path.join(workdir, "syn.npz"),
                         os.path.join(workdir, "pos.npz"),
                         os.path.join(workdir, "neg.npz"), st,
                         distance="l2-lpips", resolution=res,
                         data_num=n_q)
    pairs = 2 * n_q * n_syn
    emit({"config": "npz_e2e_northstar", "scale":
          {"generated": n_syn, "queries": 2 * n_q},
          "stages_s": st.t,
          "pairs_per_sec_e2e": round(pairs / st.t["attack"], 1),
          "auroc_unplanted": ev[0]["auc"]})


CONFIGS = {
    "dcgan": run_dcgan, "wgangp": run_wgangp, "vaegan": run_vaegan,
    "medgan": run_medgan, "pggan_highres": run_pggan_highres,
    "privdcgan": run_privdcgan, "npz_e2e": run_npz_e2e,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None,
                    help="comma list of " + ",".join(CONFIGS))
    ap.add_argument("--workdir", default="/tmp/round4")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny scales for a CPU plumbing check")
    args = ap.parse_args()
    global SMOKE, RESULTS
    SMOKE = args.smoke
    if SMOKE and "R4_RESULTS" not in os.environ:
        # keep tiny-run timings out of the canonical results file
        RESULTS = os.path.join(args.workdir, "round4_results.smoke.jsonl")
        os.makedirs(args.workdir, exist_ok=True)
    names = list(CONFIGS) if args.only is None else args.only.split(",")
    for name in names:
        wd = os.path.join(args.workdir, name)
        os.makedirs(wd, exist_ok=True)
        print(f"=== {name} ===", flush=True)
        t0 = time.perf_counter()
        try:
            CONFIGS[name](wd)
        except Exception as e:  # keep later configs alive; row is honest
            import traceback
            traceback.print_exc()
            emit({"config": name, "error": f"{type(e).__name__}: {e}"})
        print(f"=== {name} done in {time.perf_counter() - t0:.1f}s ===",
              flush=True)


if __name__ == "__main__":
    main()
