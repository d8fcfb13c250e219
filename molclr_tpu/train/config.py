"""Typed configuration, YAML-compatible with the reference config keys.

The reference drives both entry points from untyped YAML (config.yaml,
config_finetune.yaml) parsed with yaml.load and eval() for weight_decay
(quirk Q11, molclr.py:86). Here configs are dataclasses with explicit types;
`from_yaml` accepts the reference files' key layout.
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field


@dataclass
class ModelConfig:
    gnn_type: str = "gin"           # 'gin' | 'gcn' (config.yaml model_type)
    num_layers: int = 5
    emb_dim: int = 300
    feat_dim: int = 512
    drop_ratio: float = 0.0
    pool: str = "mean"
    pred_n_layer: int = 2
    pred_act: str = "softplus"
    normalize_gcn: bool = False     # True fixes quirk Q2
    bf16: bool = False              # bfloat16 activations (params stay fp32)
    tile: int = 256                 # > 0: tile-dense aggregation (MXU
                                    # block-diagonal adjacency matmuls,
                                    # ops/tile_dense.py) with tile-aligned
                                    # packing; 0 = ELL gather path.
                                    # 256 measured fastest on v5e (26.0M
                                    # vs 15.7M edges/s for the gather path)
    fused: bool | None = None       # run each GIN conv layer as ONE Pallas
                                    # kernel per tile (aggregation + edge
                                    # counts + update MLP in VMEM,
                                    # ops/fused_layer.py; 2.77 -> 2.20 ms
                                    # step on v5e). None = auto: on for
                                    # gin+tile on a real TPU, off elsewhere
                                    # (interpreter mode is for parity tests,
                                    # not speed). Requires gnn_type='gin'
                                    # and tile > 0 when forced True.


@dataclass
class PretrainConfig:
    data_path: str = "data/pubchem_synthetic.txt"
    batch_size: int = 512           # config.yaml:1
    epochs: int = 100               # config.yaml:2
    warm_up: int = 10               # config.yaml:3
    init_lr: float = 5e-4           # config.yaml:11
    weight_decay: float = 1e-5      # config.yaml:12
    temperature: float = 0.1        # config.yaml:30
    use_cosine_similarity: bool = True
    ntxent_impl: str = "auto"       # 'auto' | 'xla' | 'pallas'. auto =
                                    # the fused blockwise Pallas kernel
                                    # (ops/pallas_ntxent.py) on TPU when
                                    # the GLOBAL 2B is kernel-legal and
                                    # past the measured crossover
                                    # (2B >= 4096: 1.29x whole-step at
                                    # 2B=8192), else the XLA closed form
    adam_impl: str = "chain"        # 'chain' (optax per-leaf chain) |
                                    # 'fused' (single-buffer raveled Adam,
                                    # train/optim.py adam_torch_fused —
                                    # identical numerics, one wide fused
                                    # elementwise pass). Checkpoints store
                                    # the opt-state structure, so resume
                                    # must use the same impl.
    aug: str = "node"               # 'node' | 'subgraph' | 'mix'
    max_waves: int = 0              # BFS horizon for subgraph/mix. The
                                    # reference BFS is unbounded (grows to
                                    # 25% of atoms, dataset_subgraph.py:
                                    # 70-88); 0 = AUTO: derive
                                    # (max atoms per molecule - 1) from
                                    # the corpus at setup_data — an upper
                                    # bound on any graph eccentricity, so
                                    # no molecule can under-remove. Small-
                                    # molecule corpora derive a horizon
                                    # BELOW the old fixed 32 (fewer BFS
                                    # waves = faster); long acyclic chains
                                    # derive more. Explicit values pin the
                                    # horizon (e.g. benchmarking).
    valid_size: float = 0.05        # config.yaml:26
    model: ModelConfig = field(default_factory=ModelConfig)
    max_degree: int = 6
    pad_sizing: str = "total"       # 'total' (statistical batch totals,
                                    # ~2x less padding) | 'max' (worst
                                    # case; pad_quantile/pad_slack apply)
    pad_quantile: float = 1.0       # only used with pad_sizing='max'
    pad_slack: float = 1.1          # capped at 1.05 under pad_sizing='total'
    eval_every_epochs: int = 1
    save_every_epochs: int = 5      # molclr.py:142-143
    stop_after_epochs: int = 0      # > 0: break the epoch loop after this
                                    # many epochs WITHOUT changing the
                                    # baked cfg.epochs schedule (a
                                    # full-state checkpoint is forced at
                                    # the stop) — planned mid-campaign
                                    # interruption; resume with
                                    # --resume latest continues the SAME
                                    # cosine schedule to cfg.epochs
    log_every_steps: int = 50       # molclr.py:116
    ckpt_dir: str = "runs/pretrain"
    resume_from: str = ""           # config.yaml load_model
    seed: int = 0
    featurize_processes: int = 2
    data_axis: str = ""             # mesh axis name for DP ('' = single chip)
    steps_per_dispatch: int = 0     # train steps folded into one jitted
                                    # scan; 0 = AUTO: 8 while streaming
                                    # from the host (prefetch overlap
                                    # granularity), the WHOLE EPOCH once
                                    # the batch cache is device-resident
                                    # (each extra dispatch costs ~26 ms of
                                    # relay latency; one-dispatch epochs
                                    # measured 0.26 vs 0.56 s on the 50k
                                    # demo)
                                    # (amortizes dispatch overhead; 1 = off)
    aug_precompute: bool = True     # scan-folded dispatches compute ALL
                                    # steps' paired augmentations in one
                                    # batched op up front (augmentation is
                                    # state-independent and overhead-bound
                                    # in-step: ~0.29 ms of the 1.88 ms
                                    # B=512 step on v5e); the scan body
                                    # indexes ~95 KB deltas per view.
                                    # Bit-identical numerics to inline.
    replan_units_every: int = 0     # > 0: every N epochs, re-plan the
                                    # resident tile-units from a fresh
                                    # molecule shuffle (repack + upload)
                                    # so within-unit co-batching also
                                    # dissolves — full reference
                                    # molecule-granularity reshuffle
                                    # semantics. Off by default: units
                                    # already redraw all cross-unit
                                    # pairings per epoch, and the r4
                                    # ablation showed no measurable
                                    # convergence gap. Resume reproduces
                                    # the replanned stream exactly.
    fresh_compositions: bool = True # resident-cache epochs re-draw batch
                                    # MEMBERSHIP every epoch (reference
                                    # DataLoader reshuffle semantics,
                                    # dataset/dataset.py:179-183) via the
                                    # device-resident tile-unit regroup
                                    # (data/regroup.py): the corpus is
                                    # packed once into fixed-shape tile
                                    # units and every step concatenates a
                                    # fresh random selection ON-DEVICE.
                                    # False = frozen compositions (only
                                    # batch order reshuffles), the r1-r3
                                    # behavior. Needs tile > 0 and a
                                    # single-chip resident cache; other
                                    # paths keep their existing semantics.
    pack_cache_max_mols: int = 500_000  # cache packed batches across epochs
                                    # (batch order reshuffles; composition
                                    # fixes after epoch 0 — augmentation is
                                    # on-device so per-step stochasticity is
                                    # unaffected) for corpora up to this
                                    # size; 0 disables (repack every epoch,
                                    # ~2 MB host RAM per 512-mol batch)
    prefetch: int = 2               # host batches packed ahead in a
                                    # background thread (0 = off)
    device_cache_mb: int = 2048     # if the packed-batch cache fits in this
                                    # many MB, upload it to HBM once and
                                    # scan dispatches over index vectors —
                                    # no per-step host->device transfers
                                    # (0 disables; single-chip path only)
    narrow_cache: str = "auto"      # store the resident tile-unit stack
                                    # in NARROW wire dtypes (int8/int16
                                    # indices, uint8 masks — ~2.4x fewer
                                    # bytes; concat_units widens on-device
                                    # after the per-step row take).
                                    # 'auto'/'on': narrow whenever the
                                    # unit spec fits the wire dtypes —
                                    # narrow measured FASTER on TPU
                                    # (fewer HBM bytes per row take,
                                    # runs/r5_experiments.json) on top of
                                    # making a PubChem-10M stack fit one
                                    # v5e's HBM, so it is unconditional;
                                    # 'off' forces full width.
                                    # Loss streams are identical
                                    # either way (narrowing is exact:
                                    # per-unit values are bounded by the
                                    # unit spec).
    profile_dir: str = ""           # write a jax.profiler trace of the first
                                    # few dispatches of epoch 0 here
    tensorboard: bool = False       # also write TB scalars into ckpt_dir
    concat_views: bool = False      # True: both views in ONE forward
                                    # (SimCLR-style, joint BN stats). On
                                    # v5e the doubled working set loses
                                    # cache residency and is ~25% slower,
                                    # so sequential is the default.


@dataclass
class FineTuneConfig:
    task_name: str = "BBBP"
    data_root: str = "data"
    batch_size: int = 32            # config_finetune.yaml:1
    epochs: int = 100
    init_lr: float = 5e-4           # head LR, config_finetune.yaml:7
    init_base_lr: float = 1e-4      # encoder LR, config_finetune.yaml:8
    weight_decay: float = 1e-6
    model: ModelConfig = field(
        default_factory=lambda: ModelConfig(drop_ratio=0.3))
    pretrained: str = ""            # torch .pth or orbax dir to warm-start
    use_motifs: bool = False        # the fork's motif-MP head
    max_motifs_per_mol: int = 12
    valid_size: float = 0.1
    test_size: float = 0.1
    splitting: str = "scaffold"     # config_finetune.yaml:27
    score_mode: str = "softmax"     # 'softmax' | 'logit1' (quirk Q7)
    max_degree: int = 6
    seed: int = 0
    ckpt_dir: str = "runs/finetune"
    synthetic_n: int = 2000         # rows when auto-generating missing CSVs
    synthetic_fallback: bool = False  # opt-in: fabricate a synthetic CSV
                                    # when the task CSV is absent. Off by
                                    # default so a typo'd data_root fails
                                    # loudly instead of training (and
                                    # reporting!) on fabricated data; when
                                    # on, rows in the experiments CSV are
                                    # stamped synthetic=true.
    repack_each_epoch: bool = True  # re-shuffle batch COMPOSITIONS per epoch
                                    # (reference DataLoader semantics;
                                    # fine-tuning has no on-device
                                    # augmentation to restore stochasticity,
                                    # unlike pretraining). False freezes
                                    # compositions after epoch 0 and skips
                                    # the per-epoch repack + upload.
    log_every_steps: int = 50
    tensorboard: bool = False       # also write TB scalars into ckpt_dir
    n_seeds: int = 1                # >1: train a seed ENSEMBLE in one
                                    # vmapped step (stacked params/opt
                                    # state, shared batch stream). The
                                    # reference paper protocol reports
                                    # mean +- std over 3 independent runs;
                                    # here they cost ~one run's wall-clock
                                    # (batched matmuls over the model axis
                                    # feed the MXU better than one tiny
                                    # fine-tune step).
    batch_targets: bool = True      # multi-target tasks: when every target
                                    # column keeps the SAME molecule rows
                                    # (so splits/batches coincide), train
                                    # all T columns in ONE vmapped program
                                    # — the member axis is targets x seeds,
                                    # only the label vector differs per
                                    # member. Falls back to the reference's
                                    # sequential per-target loop when row
                                    # sets differ (missing labels). Motif
                                    # runs take the vmapped path too:
                                    # coinciding rows imply an identical
                                    # motif vocab across targets.


def _merge(dc, d: dict):
    for k, v in d.items():
        if hasattr(dc, k):
            cur = getattr(dc, k)
            if isinstance(cur, (ModelConfig,)) and isinstance(v, dict):
                _merge(cur, v)
            else:
                setattr(dc, k, type(cur)(v) if cur is not None else v)
    return dc


_REF_MODEL_KEYS = {"num_layer": "num_layers", "drop_ratio": "drop_ratio",
                   "emb_dim": "emb_dim", "feat_dim": "feat_dim",
                   "pool": "pool", "pred_n_layer": "pred_n_layer",
                   "pred_act": "pred_act"}

# TPU-native extension keys accepted verbatim under the YAML `model:` block
_EXT_MODEL_KEYS = ("tile", "fused", "bf16", "normalize_gcn", "gnn_type")


def _apply_model_keys(model_cfg, raw: dict):
    for src, dst in _REF_MODEL_KEYS.items():
        if src in raw.get("model", {}):
            setattr(model_cfg, dst, raw["model"][src])
    for k in _EXT_MODEL_KEYS:
        if k in raw.get("model", {}):
            setattr(model_cfg, k, raw["model"][k])


def pretrain_from_yaml(path: str) -> PretrainConfig:
    import yaml

    raw = yaml.safe_load(open(path))
    cfg = PretrainConfig()
    for k in ("batch_size", "epochs", "warm_up", "aug", "seed"):
        if k in raw:
            setattr(cfg, k, raw[k])
    if "init_lr" in raw:
        cfg.init_lr = float(raw["init_lr"])
    if "weight_decay" in raw:
        cfg.weight_decay = float(raw["weight_decay"])  # no eval() (Q11)
    # reference cadence keys (config.yaml:6-8) -> the typed names
    if "eval_every_n_epochs" in raw:
        cfg.eval_every_epochs = int(raw["eval_every_n_epochs"])
    if "save_every_n_epochs" in raw:
        cfg.save_every_epochs = int(raw["save_every_n_epochs"])
    if "log_every_n_steps" in raw:
        cfg.log_every_steps = int(raw["log_every_n_steps"])
    if raw.get("fp16_precision"):
        # apex amp O2 (molclr.py:97-100) -> bf16 activations on TPU
        cfg.model.bf16 = True
    if "model_type" in raw:
        cfg.model.gnn_type = raw["model_type"]
    if "load_model" in raw and raw["load_model"] not in (None, "None"):
        cfg.resume_from = str(raw["load_model"])
    _apply_model_keys(cfg.model, raw)
    loss = raw.get("loss", {})
    if "temperature" in loss:
        cfg.temperature = float(loss["temperature"])
    if "use_cosine_similarity" in loss:
        cfg.use_cosine_similarity = bool(loss["use_cosine_similarity"])
    ds = raw.get("dataset", {})
    for k in ("valid_size", "data_path"):
        if k in ds:
            setattr(cfg, k, ds[k])
    if "num_workers" in ds:
        cfg.featurize_processes = max(1, int(ds["num_workers"]))
    for k in ("data_path", "ckpt_dir", "data_axis"):
        if k in raw:
            setattr(cfg, k, raw[k])
    return cfg


def finetune_from_yaml(path: str) -> FineTuneConfig:
    import yaml

    raw = yaml.safe_load(open(path))
    cfg = FineTuneConfig()
    for k in ("task_name", "batch_size", "epochs", "seed", "data_root",
              "use_motifs", "splitting", "score_mode", "ckpt_dir"):
        if k in raw:
            setattr(cfg, k, raw[k])
    for k in ("init_lr", "init_base_lr", "weight_decay"):
        if k in raw:
            setattr(cfg, k, float(raw[k]))
    if "log_every_n_steps" in raw:
        cfg.log_every_steps = int(raw["log_every_n_steps"])
    if raw.get("fp16_precision"):
        cfg.model.bf16 = True
    if "model_type" in raw:
        cfg.model.gnn_type = raw["model_type"]
    if "fine_tune_from" in raw and raw["fine_tune_from"] \
            not in (None, "None", ""):
        # reference semantics: a bare name is a subdirectory of ./ckpt
        # (finetune.py: os.path.join('./ckpt', fine_tune_from,
        # 'checkpoints', 'model.pth')); resolved lazily against the
        # filesystem by checkpoints.resolve_pretrained at load time.
        cfg.pretrained = str(raw["fine_tune_from"])
    if "pretrained" in raw:
        cfg.pretrained = str(raw["pretrained"])
    _apply_model_keys(cfg.model, raw)
    ds = raw.get("dataset", {})
    for k in ("valid_size", "test_size", "splitting"):
        if k in ds:
            setattr(cfg, k, ds[k])
    return cfg


def to_dict(cfg) -> dict:
    return asdict(cfg)
