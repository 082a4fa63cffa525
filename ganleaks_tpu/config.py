"""Typed configuration tree.

The reference duplicates an identical argparse + ``--local_config`` YAML
override + setattr loop in all nine entry scripts (e.g. ``attack_models/
fbb.py:182-202``, ``gan_models/dcgan/train_torch.py:178-197``), with
``type=bool`` flags that are truthy for any string and grid sweeps expanded by
``itertools.product`` (``gan_models/dcgan/privDCGAN.py:73-92``). Here the
whole surface is one typed dataclass tree with a single YAML loader and a
sweep expander, shared by every CLI.
"""

from __future__ import annotations

import dataclasses
import itertools
from dataclasses import dataclass, field
from typing import Any, Iterator, Sequence, Type, TypeVar

import yaml

T = TypeVar("T")


# ---------------------------------------------------------------------------
# loading / overriding
# ---------------------------------------------------------------------------

def _coerce(value: Any, typ: Any) -> Any:
    """Best-effort coercion of YAML values onto dataclass field types."""
    if value is None:
        return None
    origin = getattr(typ, "__origin__", None)
    if origin in (list, tuple, Sequence):
        inner = typ.__args__[0] if getattr(typ, "__args__", None) else None
        if isinstance(value, str):
            # raw CLI strings (key=value parsers that skip yaml): parse
            # as YAML so "16" / "[4, 2]" land as values — iterating the
            # string would silently yield its CHARACTERS ("16" -> (1, 6))
            import yaml
            value = yaml.safe_load(value)
        if not isinstance(value, (list, tuple)):
            value = [value]  # scalar for a sequence field: one element
        seq = [(_coerce(v, inner) if inner else v) for v in value]
        return tuple(seq) if origin is tuple else seq
    if typ is bool:
        if isinstance(value, str):
            return value.strip().lower() in ("1", "true", "yes", "on")
        return bool(value)
    if typ in (int, float, str):
        return typ(value)
    return value


def apply_overrides(cfg: T, overrides: dict[str, Any]) -> T:
    """Return a copy of ``cfg`` with ``overrides`` applied (unknown keys error).

    Unlike the reference's ``update_args`` (``fbb.py:182-184``), which silently
    setattr's arbitrary keys, unknown keys raise so typos fail loudly.
    """
    fields = {f.name: f for f in dataclasses.fields(cfg)}
    clean: dict[str, Any] = {}
    for key, val in overrides.items():
        if key not in fields:
            raise KeyError(
                f"unknown config key {key!r} for {type(cfg).__name__}; "
                f"valid keys: {sorted(fields)}"
            )
        clean[key] = _coerce(val, _resolve_type(type(cfg), key))
    return dataclasses.replace(cfg, **clean)


def _resolve_type(cls: type, name: str) -> Any:
    import typing

    hints = typing.get_type_hints(cls)
    return hints.get(name, Any)


def load_config(cls: Type[T], yaml_path: str | None = None,
                overrides: dict[str, Any] | None = None) -> T:
    """Build a config: dataclass defaults <- YAML file <- explicit overrides."""
    cfg = cls()
    if yaml_path is not None:
        with open(yaml_path) as f:
            data = yaml.safe_load(f) or {}
        cfg = apply_overrides(cfg, data)
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    return cfg


def expand_grid(grid: dict[str, Any]) -> Iterator[dict[str, Any]]:
    """Expand a {key: list-of-values} YAML into per-experiment override dicts.

    Mirrors the ``itertools.product`` sweep of ``privDCGAN.py:73-92`` /
    ``privPGGAN.py:248-266`` as a library function. Scalar values are treated
    as single-element axes.
    """
    keys = list(grid)
    axes = [v if isinstance(v, (list, tuple)) else [v] for v in grid.values()]
    for combo in itertools.product(*axes):
        yield dict(zip(keys, combo))


def sweep_tag(overrides: dict[str, Any]) -> tuple[str, str]:
    """(keys, values) path components for a sweep run, matching the
    reference's ``'-'.join(keys)`` / ``'-'.join(values)`` layout
    (``privDCGAN.py:80,92``)."""
    return "-".join(overrides), "-".join(str(v) for v in overrides.values())


# ---------------------------------------------------------------------------
# attack / eval configs (reference: attack_models/fbb.py:18-38, eval_roc.py:43-55)
# ---------------------------------------------------------------------------

@dataclass
class AttackConfig:
    """fbb attack configuration (reference ``attack_models/fbb.py:18-38`` and
    ``config_attack_fbb.yaml``)."""

    exp_name: str = "debug"
    syn_data_path: str | None = None
    pos_data_dir: str = "data/miniCelebA/train"
    neg_data_dir: str = "data/miniCelebA/test"
    data_num: int = 20000          # number of query images considered
    input_format: str = "auto"     # 'png' | 'npz' | 'auto' per image-set
                                   # path: the reference dumps every
                                   # synthetic set BOTH as a PNG dir and
                                   # as an NPZ array (npz_images/,
                                   # train_torch.py:160-165) but only
                                   # ever attacks the PNGs; ingesting
                                   # the NPZ skips the host decode that
                                   # dominates real-data wall clock
                                   # (io/npz.py — bit-identical scores
                                   # by floor-quantizing exactly as
                                   # ToPILImage did when writing the
                                   # PNGs). 'auto' picks npz only for
                                   # .npz paths / PNG-free dirs
    resolution: int = 64
    K: int = 1                     # reference config K=1; its --K is unused (always 1-NN)
    BATCH_SIZE: int = 64           # reference kNN batch (only used in strict-parity mode)
    distance: str = "l2-lpips"     # 'l2' | 'l2-lpips'  (attack_models/utils.py:161-169)
    lpips_net: str = "vgg"         # 'vgg' | 'alex'
    lpips_weights: str | None = None  # npz produced by ops/lpips/convert.py
    hyperparameter_search: bool = False
    params: str | None = None
    save_root: str = "fbb_attack"
    engine: str = "gemm"           # 'auto' (fastest for the backend:
                                   # taps-int8 + bf16 tower on TPU,
                                   # gemm f32 elsewhere — resolved in
                                   # attack.fbb.resolve_auto_engine)
                                   # | 'gemm' (MXU fold) | 'pallas' (fused
                                   # VMEM-argmin kernel) | 'taps'
                                   # (tap-structured embeddings, no flat
                                   # relayout — fastest; docs/PERF.md) |
                                   # 'taps-int8' (int8-quantized parts:
                                   # 2.36x MXU rate, half the cache
                                   # bytes; quantized scores — pair with
                                   # two_pass for certified exactness) |
                                   # 'exact' (reference math, elementwise)
    dtype: str = "float32"         # embedding dtype for the gemm engine
    lpips_compute_dtype: str | None = None  # 'bfloat16' runs the VGG tower
                                            # at MXU bf16 rate (throughput
                                            # mode; parity runs keep f32)
    two_pass: bool = False         # bf16 candidate pass + exact f32
                                   # re-rank (indices/distances == the
                                   # full f32 search; docs/PERF.md)
    two_pass_k: int = 4            # candidates per query for pass 1
    query_block: int = 2048        # query tile streamed on device
    syn_block: int = 8192          # generated-set tile streamed on device
    query_cache_gb: float = 8.0    # HBM budget for the query-embedding
                                   # cache; sets how many synthetic
                                   # featurize sweeps the streamed
                                   # engines pay (ops/knn._stream_search;
                                   # over-asking degrades to more chunks
                                   # via the alloc-OOM resume)
    uint8_storage: bool = True     # hold the device-resident image sets
                                   # as uint8 (PNG pixels are 8-bit;
                                   # dequant is bit-exact on CPU, <=1
                                   # ULP/pixel on TPU — see
                                   # ops/distance.images_unit_range):
                                   # 1/4 the f32 image HBM and
                                   # host->device bytes at equal
                                   # featurize speed — what lets the
                                   # 100k x 20k attack coexist with the
                                   # full query cache on a 16 GB chip
    host_stream: bool | str = "auto"  # keep the image sets HOST-side and
                                   # decode/ship them block by block
                                   # inside the streamed search
                                   # (io/stream.HostImageSet): PNG decode
                                   # + host->device transfer overlap the
                                   # device featurize/fold instead of
                                   # preceding it, decoded rows cache in
                                   # host RAM, and the sets never occupy
                                   # HBM (measured 136-159 s vs
                                   # 168-440 s e2e at 20k x 100k —
                                   # docs/PERF.md). 'auto' (default):
                                   # on for single-chip uint8-storage
                                   # runs, where it strictly dominates;
                                   # off on a mesh (the shard layouts
                                   # place their own device arrays) and
                                   # for f32 storage (4x the per-chunk
                                   # re-ship bytes). true/false pins it.
    decode_cache: bool | str = "auto"  # persist decoded PNG pixels as a
                                   # memmapped .npy next to the data
                                   # (io/diskcache): the first run pays
                                   # the decode, every later run of ANY
                                   # attack config over the same files
                                   # memmaps it read-only — repeat
                                   # attacks skip the host decode that
                                   # bounds the e2e wall clock. 'auto'
                                   # (default): on, at
                                   # <data_dir>/.ganleaks_decoded or
                                   # ~/.cache/ganleaks_tpu; a path pins
                                   # the cache dir; false disables.
                                   # GANLEAKS_DECODE_CACHE env overrides.
    drop_remainder: bool = False   # replicate fbb.py:77 dropping len(syn) % BATCH_SIZE
    n_chips: int = 1               # >1: shard the generated set over a mesh
    shard_layout: str = "sharded"  # 'sharded' (queries replicated) | 'ring'
                                   # (both sets sharded, ppermute rotation)
    multihost: bool = False        # wire up jax.distributed first and mesh
                                   # over the GLOBAL device list (all
                                   # hosts); artifacts written by process
                                   # 0 only (parallel/multihost.py)
    save_plots: bool = True        # the 20 closest-pair PNGs (fbb.py:91-106)
    wandb: str | None = None
    seed: int = 0


@dataclass
class ReconstructionConfig:
    """Encoder-seeded reconstruction attack (BASELINE config #3: VAE-GAN).

    No reference script exists for this path — the artifact layout mirrors
    the fbb attack's (``fbb.py:42-67,162-171``) so ``eval_roc`` consumes
    the run unchanged."""

    exp_name: str = "recon_debug"
    pos_data_dir: str = "data/miniCelebA/train"
    neg_data_dir: str = "data/miniCelebA/test"
    data_num: int = 20000
    resolution: int = 64
    reader: str = "center_crop"    # VAE-GAN trains on the center-crop reader
                                   # (vaegan/utils.py:44-71); 'resize' = fbb's
    netE: str = ""                 # encoder weights: .msgpack (trainer) / .npz (converter)
    netG: str = ""                 # generator weights
    z_dim: int = 100               # must match the checkpoint (train.py:30)
    d: int = 64
    distance: str = "l2"           # 'l2' | 'l2-lpips' (same metric family as fbb)
    lpips_net: str = "vgg"
    lpips_weights: str | None = None
    batch: int = 256
    save_root: str = "recon_attack"
    save_plots: bool = True
    wandb: str | None = None
    seed: int = 0


@dataclass
class TabularAttackConfig:
    """fbb attack on (N, D) tabular records (medGAN's ``synthetic.npy``,
    reference ``gan_models/medgan/train.py:247-318``). The reference ships
    no tabular attack script; the fbb artifact layout is reused so
    ``eval_roc`` consumes the run unchanged (BASELINE config #4)."""

    exp_name: str = "fbb_tabular_debug"
    syn_data_path: str | None = None     # synthetic.npy / .npz / .csv
    pos_data_path: str | None = None     # member rows (.npy/.npz/.csv)
    neg_data_path: str | None = None     # non-member rows
    dataset_csv: str | None = None       # alternative: the medGAN CSV; the
                                         # reference 90/10 split defines
                                         # members/non-members
    data_num: int = 20000
    engine: str = "gemm"                 # 'gemm' | 'pallas' | 'exact'
    syn_block: int = 8192
    save_root: str = "fbb_attack"
    wandb: str | None = None
    seed: int = 0


@dataclass
class EvalConfig:
    """ROC evaluation (reference ``attack_models/eval_roc.py:43-55``)."""

    result_load_dir: str | None = None
    attack_type: str = "fbb"                 # 'fbb' | 'pbb' | 'wb'
    reference_load_dir: str | None = None    # optional calibration scores
    save_dir: bool = True
    precision_threshold: float = -0.14       # hardcoded in eval_roc.py:21-23
    wandb: str | None = None
    # non-finite losses (a diverged victim, a NaN'd attack) would flow
    # through argsort/cumsum and emerge as a confident-looking AUROC.
    # Default: refuse to score them. True: score anyway but return
    # degenerate=True + counts so callers must acknowledge the garbage.
    allow_nonfinite: bool = False


# ---------------------------------------------------------------------------
# victim model configs (reference: gan_models/*)
# ---------------------------------------------------------------------------

@dataclass
class TrainCommon:
    """Fields shared by every victim trainer (mirrors the repeated argparse
    block, e.g. ``gan_models/dcgan/train_torch.py:23-50``)."""

    data_path: str = "data/train"
    image_size: int = 64
    nc: int = 3
    batch_size: int = 128
    num_epochs: int = 5
    seed: int = 0
    save_model: bool = True
    saved_model_name: str | None = None
    training: bool = True
    generate: bool = True
    PATH: str = "model_save"
    PATH_syn_data: str = "syn_data"
    wandb: str | None = None
    # per-epoch generated-sample grids (reference: wandb image logging,
    # train_torch.py:125-127); "auto" -> <PATH>/sample_grids, None disables
    sample_grid_dir: str | None = "auto"
    # TPU additions
    mesh_shape: tuple[int, ...] = (1,)   # data-parallel mesh over the batch axis


@dataclass
class DCGANConfig(TrainCommon):
    """``gan_models/dcgan/train_torch.py:23-50`` + ``dcgan_config.yaml``."""

    lr: float = 2e-4
    nz: int = 100
    ngf: int = 64
    ndf: int = 64
    beta1: float = 0.5
    beta2: float = 0.999
    num_generated: int = 2040


@dataclass
class WGANGPConfig(TrainCommon):
    """``gan_models/wgangp/train.py:24-53``."""

    lr: float = 4e-4
    nz: int = 100
    ngf: int = 64
    ndf: int = 64
    beta1: float = 0.0
    beta2: float = 0.9
    critic_iter: int = 5
    lambda_gp: float = 10.0
    num_generated: int = 2040


@dataclass
class PGGANConfig(TrainCommon):
    """``gan_models/pggan/train.py:24-48`` + ``pggan_config.yaml``."""

    lr: float = 1e-3
    nz: int = 512
    in_channels: int = 512
    start_img_size: int = 4
    batch_sizes: tuple[int, ...] = (32, 32, 32, 32, 32)  # per resolution
    num_epochs: int = 30          # per resolution (PROGRESSIVE_EPOCHS, train.py:78)
    lambda_gp: float = 10.0
    drift: float = 0.001          # 0.001 * E[critic(real)^2] (train.py:116)
    num_generated: int = 10000
    compute_dtype: str = "bfloat16"  # reference uses fp16 autocast (train.py:107)
    hflip: bool = True             # RandomHorizontalFlip(p=0.5), train.py:83


@dataclass
class VAEGANConfig(TrainCommon):
    """``gan_models/vaegan/train.py:27-38``."""

    exp_name: str = "vaegan_default"
    batch_size: int = 64
    z_dim: int = 100
    d: int = 64
    nepoch: int = 1000
    steps_per_epoch: int = 78     # 5000 // batch_size (train.py:297)
    num_samples: int = 20000      # sample.py:17
    checkpoint_every: int = 10    # train.py:401


@dataclass
class MedGANConfig(TrainCommon):
    """``gan_models/medgan/train.py:23-61``."""

    DATASETPATH: str = "data/mini_MIMIC_III/mini_MIMIC_III.csv"
    n_epochs: int = 1000
    n_epochs_pretrain: int = 100
    batch_size: int = 2000
    lr: float = 1e-3
    weight_decay: float = 1e-4
    b1: float = 0.9
    b2: float = 0.999
    latent_dim: int = 128
    hidden_gen: int = 128
    hidden_disc1: int = 128
    hidden_disc2: int = 256
    binary: bool = True
    minibatch_averaging: bool = True
    generate_N: int = 100


@dataclass
class PrivGANConfig:
    """privGAN extras shared by privDCGAN/privPGGAN
    (``privDCGAN.py:52-53``, ``privPGGAN.py`` grid)."""

    N_splits: int = 2
    privacy_ratio: float = 0.5
    dp_delay: int = 100            # epoch gate for DCGAN; resolution gate for PGGAN
    disc_epochs: int = 2           # private-discriminator pretrain epochs


# ---------------------------------------------------------------------------
# data-prep / FID configs (reference: z_split.py:10-28, z_fid.py:320-331)
# ---------------------------------------------------------------------------

@dataclass
class SplitConfig:
    num_images: int = 10020
    identity_annotations: str = "data/identities_ann.txt"
    input_dir: str = "data/img_align_celeba"
    output_dir0: str = "data/train"
    output_dir1: str = "data/celebAhuge_positive"
    output_dir2: str = "data/celebAhuge_negative"
    img_size: int = 64
    num_same_id: int = 30
    seed: int = 0


@dataclass
class FIDConfig:
    batch_size: int = 50           # z_fid.py:68
    weights: str | None = None     # converted InceptionV3 weights npz
    sqrtm: str = "newton-schulz"   # 'newton-schulz' | 'eigh' | 'scipy'


@dataclass
class ScoresConfig:
    """Perceptual-metric evaluation against human judgments — the
    DistModel scoring surface (``dist_model.py:253-330``) the reference
    exposes only as library calls. Dataset is the original LPIPS layout:
    ``data_dir/{ref,p0,p1}/*.png + judge/*.npy`` for 2AFC,
    ``data_dir/{p0,p1}/*.png + same/*.npy`` for JND; or a single .npz
    with those arrays (keys ref/p0/p1/judge or p0/p1/same)."""

    data_dir: str = ""             # directory layout or a .npz path
    mode: str = "2afc"             # '2afc' | 'jnd'
    model: str = "net-lin"         # 'net-lin' | 'net' | 'l2' | 'ssim'
    net: str = "vgg"               # backbone for net-lin/net
    colorspace: str = "Lab"        # for l2/ssim (dist_model.py:39)
    weights: str | None = None     # lpips params npz (surrogate otherwise)
    resolution: int = 64
    batch_size: int = 256
    limit: int | None = None       # cap on triplets/pairs (smoke runs)
    out_json: str | None = None
