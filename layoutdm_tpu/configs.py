"""Config system: plain dataclasses + experiment overlays + ``key=value`` CLI.

Replaces the reference's hydra tree (`src/trainer/trainer/config/**`,
`hydra_configs.py:12-83`) with dependency-free dataclasses.  The same nine
groups exist (backbone / dataset / data / model / optimizer / sampling /
scheduler / training / experiment) and experiments are overlay functions that
mutate a fully-built `TrainConfig`, mirroring the `# @package _global_`
overlays such as `config/experiment/layoutdm.yaml:1-16`.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

from layoutdm_tpu.registry import DATASET_LABELS

# ---------------------------------------------------------------------------
# groups
# ---------------------------------------------------------------------------


@dataclass
class BackboneConfig:
    """Transformer encoder backbone (reference `config/backbone/medium.yaml`)."""

    d_model: int = 512
    nhead: int = 8
    dim_feedforward: int = 2048
    num_layers: int = 4
    dropout: float = 0.1
    activation: str = "relu"
    # timestep conditioning of the pre-norm ("adalayernorm" | "adainnorm" |
    # suffix "_abs"/"_mlp" for the timestep encoding; None = plain LayerNorm)
    timestep_type: Optional[str] = None
    diffusion_step: int = 100

    def shrunk(self, mult: float) -> "BackboneConfig":
        """Linear rescale, parity with `models/common/util.py:36-44` (shrink)."""
        return dataclasses.replace(
            self,
            d_model=int(mult * self.d_model),
            dim_feedforward=int(mult * self.dim_feedforward),
        )


@dataclass
class DatasetConfig:
    name: str = "rico25"  # rico5 | rico13 | rico25 | publaynet | synthetic
    dir: str = "download/datasets"
    max_seq_length: int = 25
    # dotted module path or .py file whose import registers a CUSTOM
    # dataset (registry.register_dataset; docs/custom_dataset.md) — makes
    # the registration reachable from persisted configs and `key=value`
    # CLIs (e.g. `dataset.register_module=my_pkg.my_dataset`)
    register_module: str = ""

    def ensure_registered(self) -> None:
        """Import the custom-dataset registration module, if any.  Called
        lazily by `num_categories` and by the CLI entry points before the
        first registry lookup."""
        if self.register_module:
            from layoutdm_tpu.registry import import_registrations

            import_registrations(self.register_module)

    @property
    def num_categories(self) -> int:
        if self.name == "synthetic":
            return 5
        self.ensure_registered()
        return len(DATASET_LABELS[self.name])


@dataclass
class DataConfig:
    """Tokenization & loading knobs (reference `hydra_configs.py:64-83`)."""

    batch_size: int = 64
    bbox_quantization: str = "linear"  # linear | kmeans | percentile
    num_bin_bboxes: int = 32
    pad_until_max: bool = False
    shared_bbox_vocab: str = "xywh"  # xywh | x-y-w-h
    special_tokens: Tuple[str, ...] = ("pad", "mask")
    transforms: Tuple[str, ...] = ("RandomOrder",)
    var_order: str = "c-x-y-w-h"  # c-x-y-w-h | c-w-h-x-y

    def __post_init__(self) -> None:
        assert self.shared_bbox_vocab in ("xywh", "x-y-w-h")
        assert self.bbox_quantization in ("linear", "kmeans", "percentile")
        assert self.var_order in ("c-x-y-w-h", "c-w-h-x-y")
        for tok in self.special_tokens:
            assert tok in ("pad", "bos", "eos", "mask")


@dataclass
class ModelConfig:
    name: str = "layoutdm"  # layoutdm|maskgit|blt|bart|autoreg|ruite|diffusionlm|bitdiffusion
    # --- layoutdm ---
    q_type: str = "constrained"  # vanilla | constrained
    seq_type: str = "poset"  # set | poset
    num_timesteps: int = 100
    auxiliary_loss_weight: float = 1e-1
    pos_emb: str = "elem_attr"  # default | elem_attr
    transformer_type: str = "flattened"
    train_sampling: str = "gumbel"  # random | gumbel
    dtype: str = "float32"  # activation dtype: float32 | bfloat16
    learnable_token_emb: bool = False  # DiffusionLM codebook learnability
    att_1: float = 0.99999
    att_T: float = 0.000009
    ctt_1: float = 0.000009
    ctt_T: float = 0.99999


@dataclass
class OptimizerConfig:
    name: str = "adamw"
    lr: float = 1e-4  # reference `config/optimizer/adamw.yaml`
    betas: Tuple[float, float] = (0.9, 0.98)
    weight_decay: float = 1e-1  # applied via optim groups, see train/step.py


@dataclass
class SamplingConfig:
    """Token sampler over logits (reference `helpers/sampling.py:13-59`)."""

    name: str = "random"  # deterministic | random | gumbel | top_k | top_p | top_k_top_p
    temperature: float = 1.0
    top_k: int = 5
    top_p: float = 0.9
    # diffusion-only knobs merged at test time
    # (`models/base_model.py:124-150`, `models/layoutdm.py:90-97`)
    num_timesteps: Optional[int] = None
    time_difference: float = 0.0
    refine_lambda: float = 3.0
    refine_mode: str = "uniform"  # uniform | gaussian | negative
    refine_offset_ratio: float = 0.1
    # default = the reference's CLG-LO step size (`test.py`/hydra default).
    # Measured sweep at toy scale (synthetic-max25 cosine model, 256
    # relation-conditioned samples; docs/STATUS.md round-3 table):
    # violation falls monotonically with lambda (3e5: 0.246 -> 3e6: 0.158
    # -> 3e7: 0.120) while FID worsens 24.5 -> 66.2 up to 3e6 then
    # RECOVERS slightly (3e7: 62.1) — `relation_lambda=1e7..3e7` strictly
    # dominates the 3e6 default on BOTH axes there.  Kept at 3e6 for
    # reference parity; raise it when constraint satisfaction matters.
    relation_lambda: float = 3e6
    relation_mode: str = "average"
    relation_tau: float = 1.0
    relation_num_update: int = 3


@dataclass
class SchedulerConfig:
    # Default matches the reference (`config/scheduler/
    # reduce_lr_on_plateau.yaml`) for parity.  RECOMMENDATION for short
    # runs: `scheduler.name=cosine scheduler.warmup_epochs=5` — at toy
    # scale (synthetic-max25, 80 epochs) plateau's early LR collapse gives
    # FID 45-113 across seeds while cosine+warmup reaches FID 17.2 +- 0.3
    # over 3 seeds (docs/STATUS.md, "Scheduler quality study").
    name: str = "reduce_lr_on_plateau"  # void | d3pm | reduce_lr_on_plateau | cosine
    warmup_epochs: int = 0
    # warmup target LR (`reduce_lr_on_plateau_with_warmup.yaml`: 5e-4 from an
    # optimizer base of 1e-4); None ramps to the optimizer LR itself
    warmup_lr: Optional[float] = None
    factor: float = 0.5
    patience: int = 2
    # reference `config/scheduler/reduce_lr_on_plateau.yaml`: threshold 1e-2
    threshold: float = 1e-2


@dataclass
class TrainingConfig:
    epochs: int = 50
    grad_norm_clip: float = 1.0
    weight_decay: float = 1e-1
    loss_plot_iter_interval: int = 50
    sample_plot_epoch_interval: int = 1
    fid_plot_num_samples: int = 1000
    fid_plot_batch_size: int = 512
    seed: int = 0
    # data-parallel mesh size; 0 = use all local devices
    num_devices: int = 0
    # PRNG implementation for the training stream (timestep draws, q_sample
    # gumbels, dropout masks).  "rbg" rides the TPU's hardware
    # RngBitGenerator — measured 94.62 -> 92.00 ms/step at B=1024 on the
    # flagship (+2.8%, docs/DESIGN.md §6) because threefry's u32 math for
    # the (B, S, d) dropout mask is rematerialised in the backward.  Draws
    # stay deterministic per (seed, program) but are NOT stable across JAX
    # versions/backends the way threefry is — set "threefry2x32" for
    # cross-version reproducible streams.  Sampling/eval keys are
    # unaffected (callers pass their own).
    rng_impl: str = "rbg"


@dataclass
class TrainConfig:
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    data: DataConfig = field(default_factory=DataConfig)
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    sampling: SamplingConfig = field(default_factory=SamplingConfig)
    scheduler: SchedulerConfig = field(default_factory=SchedulerConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    job_dir: str = "tmp/jobs/default"
    fid_weight_dir: str = "download/fid_weights/FIDNetV3"
    seed: int = 0
    debug: bool = False
    # opt-in NaN sanitizer (jax_debug_nans); separate from debug because it
    # forces per-op synchronous dispatch — pathological over the TPU tunnel
    debug_nans: bool = False


@dataclass
class TestConfig:
    """Inference-time args (reference `hydra_configs.py:12-52`)."""

    job_dir: str = ""
    result_dir: str = "tmp/results"
    dataset_dir: Optional[str] = None  # set if different for train/test
    cond: str = "unconditional"
    max_batch_size: int = 512
    num_run: int = 1
    num_timesteps: int = 100
    num_uncond_samples: int = 1000
    is_validation: bool = False
    debug: bool = False
    debug_num_samples: int = -1
    sampling: str = "random"
    temperature: float = 1.0
    top_p: float = 0.9
    top_k: int = 5
    time_difference: float = 0.0
    refine_lambda: float = 3.0
    refine_mode: str = "uniform"
    refine_offset_ratio: float = 0.1
    relation_lambda: float = 3e6
    relation_mode: str = "average"
    relation_tau: float = 1.0
    relation_num_update: int = 3
    use_ddim: bool = False
    trace_dir: Optional[str] = None  # jax.profiler trace output (tracing aux)
    warmup: bool = True  # untimed first-batch run so ms/sample excludes compile


def build_sampling_config(
    test_cfg: TestConfig, train_cfg: Optional[TrainConfig] = None
) -> SamplingConfig:
    """Merge inference-time sampling args over the train job's saved
    sampling defaults (the reference merges sampling_cfg with per-model
    defaults the same way, `base_model.py:124-150`): a knob the user left at
    its `TestConfig` default inherits the value recorded in the train
    config — so experiment overlays that ship a sampling operating point
    (e.g. `layoutdm_relation_strong`'s relation_lambda=1e7) take effect at
    sample time without re-typing them — while an explicit CLI override
    always wins.  ``num_timesteps`` is always taken from the test args (its
    default, 100, is the reference's eval setting)."""
    base = (
        dataclasses.replace(train_cfg.sampling)
        if train_cfg is not None
        else SamplingConfig()
    )
    defaults = TestConfig()
    # (TestConfig field, SamplingConfig field)
    knobs = [
        ("sampling", "name"),
        ("temperature", "temperature"),
        ("top_p", "top_p"),
        ("top_k", "top_k"),
        ("time_difference", "time_difference"),
        ("refine_lambda", "refine_lambda"),
        ("refine_mode", "refine_mode"),
        ("refine_offset_ratio", "refine_offset_ratio"),
        ("relation_lambda", "relation_lambda"),
        ("relation_mode", "relation_mode"),
        ("relation_tau", "relation_tau"),
        ("relation_num_update", "relation_num_update"),
    ]
    for t_name, s_name in knobs:
        tv = getattr(test_cfg, t_name)
        if train_cfg is None or tv != getattr(defaults, t_name):
            setattr(base, s_name, tv)
    base.top_k = int(base.top_k)
    base.num_timesteps = test_cfg.num_timesteps
    return base


# ---------------------------------------------------------------------------
# experiment overlays (reference config/experiment/*.yaml)
# ---------------------------------------------------------------------------


def _overlay_layoutdm(cfg: TrainConfig) -> None:
    # parity: config/experiment/layoutdm.yaml:1-16
    cfg.model.name = "layoutdm"
    cfg.model.q_type = "constrained"
    cfg.data.pad_until_max = True
    cfg.data.shared_bbox_vocab = "x-y-w-h"
    cfg.data.bbox_quantization = "kmeans"
    cfg.optimizer.lr = 5.0e-4
    cfg.backbone.timestep_type = "adalayernorm"
    cfg.backbone.diffusion_step = 100
    cfg.backbone.dropout = 0.0
    cfg.scheduler.name = "reduce_lr_on_plateau"


def _overlay_maskgit(cfg: TrainConfig) -> None:
    # reference `config/experiment/maskgit_cvpr2022.yaml` adds nothing over
    # the model swap; pad_until_max is a TPU static-shape requirement here
    cfg.model.name = "maskgit"
    cfg.data.pad_until_max = True


def _overlay_blt(cfg: TrainConfig) -> None:
    # `config/experiment/blt_eccv2022.yaml`
    cfg.model.name = "blt"
    cfg.data.pad_until_max = True


def _overlay_bart(cfg: TrainConfig) -> None:
    # `config/experiment/bart.yaml`
    cfg.model.name = "bart"
    cfg.data.pad_until_max = True
    cfg.data.special_tokens = ("pad", "bos", "eos", "mask")
    cfg.data.var_order = "c-w-h-x-y"


def _overlay_autoreg(cfg: TrainConfig) -> None:
    # `config/experiment/layout_transformer_iccv2021.yaml`
    cfg.model.name = "autoreg"
    cfg.data.special_tokens = ("pad", "bos", "eos")
    cfg.data.var_order = "c-w-h-x-y"
    cfg.data.pad_until_max = True  # TPU static shapes


def _overlay_ruite(cfg: TrainConfig) -> None:
    # `config/experiment/ruite.yaml`
    cfg.model.name = "ruite"
    cfg.data.special_tokens = ("pad",)
    cfg.data.transforms = ("RandomOrder", "AddNoiseToBBox(std=0.1)")
    cfg.data.pad_until_max = True  # TPU static shapes


def _overlay_vqdiffusion(cfg: TrainConfig) -> None:
    # `config/experiment/vqdiffusion.yaml`: single shared transition matrix,
    # LINEAR quantization, learned default positional embedding
    cfg.model.name = "layoutdm"
    cfg.model.q_type = "vanilla"
    cfg.model.pos_emb = "default"
    cfg.data.pad_until_max = True
    cfg.data.shared_bbox_vocab = "x-y-w-h"
    cfg.data.bbox_quantization = "linear"
    cfg.optimizer.lr = 5.0e-4
    cfg.backbone.timestep_type = "adalayernorm"
    cfg.backbone.diffusion_step = 100
    cfg.backbone.dropout = 0.0
    cfg.scheduler.name = "reduce_lr_on_plateau"


def _overlay_diffusionlm(cfg: TrainConfig) -> None:
    # `config/experiment/diffusionlm_neurips2022.yaml`
    cfg.model.name = "diffusionlm"
    cfg.model.learnable_token_emb = True
    cfg.data.pad_until_max = True
    cfg.data.shared_bbox_vocab = "x-y-w-h"
    cfg.optimizer.lr = 5.0e-4
    cfg.backbone.timestep_type = "adalayernorm_mlp"
    cfg.backbone.diffusion_step = 100
    cfg.backbone.dropout = 0.0
    cfg.scheduler.name = "reduce_lr_on_plateau"


def _overlay_bitdiffusion(cfg: TrainConfig) -> None:
    cfg.model.name = "bitdiffusion"
    cfg.data.pad_until_max = True
    cfg.data.shared_bbox_vocab = "x-y-w-h"
    cfg.optimizer.lr = 5.0e-4
    cfg.backbone.timestep_type = "adalayernorm_mlp"
    cfg.backbone.dropout = 0.0


def _overlay_layoutdm_relation_strong(cfg: TrainConfig) -> None:
    """`layoutdm` with the MEASURED better relation-guidance operating
    point.  No reference counterpart: the sweep in docs/STATUS.md (round 3)
    showed relation_lambda=1e7..3e7 strictly dominates the reference's 3e6
    default on BOTH violation and FID at toy scale; the `layoutdm` overlay
    keeps 3e6 for parity, this preset ships the stronger point (round-3
    VERDICT weak #4)."""
    _overlay_layoutdm(cfg)
    cfg.sampling.relation_lambda = 1e7


def _ordered(overlay):
    """_ordered experiment variants (`*_ordered.yaml`): deterministic
    SortByLabel + LexicographicOrder data ordering."""

    def f(cfg: TrainConfig) -> None:
        overlay(cfg)
        cfg.data.transforms = ("SortByLabel", "LexicographicOrder")

    return f


EXPERIMENTS = {
    "layoutdm": _overlay_layoutdm,
    "layoutdm_relation_strong": _overlay_layoutdm_relation_strong,
    "vqdiffusion": _overlay_vqdiffusion,
    "diffusionlm": _overlay_diffusionlm,
    "diffusionlm_neurips2022": _overlay_diffusionlm,
    "bitdiffusion": _overlay_bitdiffusion,
    "maskgit": _overlay_maskgit,
    "maskgit_cvpr2022": _overlay_maskgit,
    "maskgit_cvpr2022_ordered": _ordered(_overlay_maskgit),
    "blt": _overlay_blt,
    "blt_eccv2022": _overlay_blt,
    "blt_eccv2022_ordered": _ordered(_overlay_blt),
    "bart": _overlay_bart,
    "autoreg": _overlay_autoreg,
    "elem_wise_autoreg": _overlay_autoreg,
    "layout_transformer_iccv2021": _overlay_autoreg,
    "layout_transformer_iccv2021_ordered": _ordered(_overlay_autoreg),
    "ruite": _overlay_ruite,
}


# ---------------------------------------------------------------------------
# key=value CLI overrides (the reference CLI surface, README.md:64)
# ---------------------------------------------------------------------------


def _coerce(value: str) -> Any:
    lowered = value.lower()
    if lowered in ("true", "false"):
        return lowered == "true"
    if lowered in ("null", "none"):
        return None
    try:
        return int(value)
    except ValueError:
        pass
    try:
        return float(value)
    except ValueError:
        pass
    if value.startswith("[") or value.startswith("("):
        return tuple(json.loads(value.replace("(", "[").replace(")", "]")))
    return value


def apply_overrides(cfg: Any, overrides: List[str]) -> Any:
    """Apply ``a.b.c=value`` overrides in place; returns cfg."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"override must be key=value, got: {ov}")
        key, _, raw = ov.partition("=")
        obj = cfg
        parts = key.split(".")
        for p in parts[:-1]:
            obj = getattr(obj, p)
        if not hasattr(obj, parts[-1]):
            raise AttributeError(f"unknown config key: {key}")
        setattr(obj, parts[-1], _coerce(raw))
    return cfg


def build_train_config(
    experiment: Optional[str] = None,
    dataset: Optional[str] = None,
    overrides: Optional[List[str]] = None,
) -> TrainConfig:
    cfg = TrainConfig()
    if dataset is not None:
        cfg.dataset.name = dataset
    if experiment is not None:
        EXPERIMENTS[experiment](cfg)
    if overrides:
        apply_overrides(cfg, overrides)
    return cfg


# ---------------------------------------------------------------------------
# (de)serialization — checkpoint = (config.json, weights), mirroring the
# reference's persisted `config.yaml` next to weights (`main.py:74-75`).
# ---------------------------------------------------------------------------


def to_dict(cfg: Any) -> Dict[str, Any]:
    return dataclasses.asdict(cfg)


def train_config_from_dict(d: Dict[str, Any]) -> TrainConfig:
    def _mk(cls, sub):
        fields = {f.name for f in dataclasses.fields(cls)}
        kw = {}
        for k, v in sub.items():
            if k not in fields:
                continue
            kw[k] = tuple(v) if isinstance(v, list) else v
        return cls(**kw)

    cfg = TrainConfig(
        dataset=_mk(DatasetConfig, d.get("dataset", {})),
        data=_mk(DataConfig, d.get("data", {})),
        backbone=_mk(BackboneConfig, d.get("backbone", {})),
        model=_mk(ModelConfig, d.get("model", {})),
        optimizer=_mk(OptimizerConfig, d.get("optimizer", {})),
        sampling=_mk(SamplingConfig, d.get("sampling", {})),
        scheduler=_mk(SchedulerConfig, d.get("scheduler", {})),
        training=_mk(TrainingConfig, d.get("training", {})),
    )
    for k in ("job_dir", "fid_weight_dir", "seed", "debug", "debug_nans"):
        if k in d:
            setattr(cfg, k, d[k])
    return cfg
