"""Typed, YAML-loadable, CLI-overridable configuration.

The reference keeps per-attack constants scattered across argparse defaults
(e.g. badnets.py:17-36), hardcoded literals (batch size 256 at
badnets.py:105-108, target label 2 at badnets.py:56,75) and *unread* YAML
files (config/*.yaml; the ``import yaml`` lines are commented out, fp.py:12).
Here a single dataclass tree owns all of it: YAML is actually parsed, CLI
flags override YAML, and the per-attack DSP/model-shape table (reference
attack_config.txt:1-23) lives in ``ATTACK_PRESETS``.
"""

from __future__ import annotations

import argparse
import dataclasses
from dataclasses import dataclass, field
from typing import Any

import yaml

# Label sets per dataset (reference prepare_dataset.py:88-97).
DATASET_LABELS: dict[str, list[str]] = {
    "SCDv1-10": ["yes", "no", "up", "down", "left", "right", "on", "off", "stop", "go"],
    "SCDv1-30": [
        "bed", "bird", "cat", "dog", "down", "eight", "five", "four", "go",
        "happy", "house", "left", "marvin", "nine", "no", "off", "on", "one",
        "right", "seven", "sheila", "six", "stop", "three", "tree", "two",
        "up", "wow", "yes", "zero",
    ],
    "SCDv2-10": ["zero", "one", "two", "three", "four", "five", "six", "seven", "eight", "nine"],
    "SCDv2-26": [
        "zero", "backward", "bed", "bird", "cat", "dog", "down", "follow",
        "forward", "go", "happy", "house", "learn", "left", "marvin", "no",
        "off", "on", "right", "sheila", "stop", "tree", "up", "visual",
        "wow", "yes",
    ],
}

DATASET_PATHS: dict[str, str] = {
    "SCDv1-10": "./data/SpeechCommands/speech_commands_v0.01",
    "SCDv1-30": "./data/SpeechCommands/speech_commands_v0.01",
    "SCDv2-10": "./data/SpeechCommands/speech_commands_v0.02",
    "SCDv2-26": "./data/speech_commands_v0.02",
}


@dataclass
class DSPConfig:
    """Audio front-end parameters (reference attack_config.txt:1-9)."""

    sample_rate: int = 16000
    n_mfcc: int = 40
    n_fft: int = 400
    hop_length: int = 160
    n_mels: int = 128
    # "torchaudio": htk mel / no filterbank norm / reflect pad / amplitude_to_DB
    #   with per-clip top_db=80 (reference prepare_dataset.py:35-47).
    # "librosa": slaney mel + slaney norm / constant pad / power_to_db
    #   (reference utils/daba_injection_tools.py:29-35, librosa defaults).
    parity: str = "torchaudio"
    # Route batched MFCC through the fused Pallas kernel (TPU only; the XLA
    # path is used automatically on CPU and for gradient computations).
    # Default OFF by measurement: on v5e-1 the XLA pipeline runs the
    # (512, 16000) jingleback front-end in 2.8 ms vs 3.1-3.3 ms fused Pallas
    # (bench.py r2: pallas_speedup 0.86-0.89x) — XLA's own fusion of the
    # frame-gather + three matmuls already saturates this op; the kernel
    # stays available for future shapes where it wins.
    use_pallas: bool = False

    @property
    def num_frames_1s(self) -> int:
        """Frame count for a 1-second clip, centered STFT."""
        t = self.sample_rate
        return 1 + (t + 2 * (self.n_fft // 2) - self.n_fft) // self.hop_length


@dataclass
class TrainConfig:
    learning_rate: float = 1e-4
    batch_size: int = 256
    num_epochs: int = 300
    patience: int = 20
    seed: int = 35
    optimizer: str = "adam"
    # Early stopping monitors 0.5*(clean_test_loss + bd_test_loss)
    # (reference badnets.py:156).
    monitor: str = "mean_test_loss"
    # Pad final partial batch and mask it out of the metrics (TPU static shapes).
    drop_remainder: bool = False
    # Device-resident epochs: whole dataset in HBM, one lax.scan per epoch —
    # no per-batch host dispatch. Used automatically on a single-device mesh.
    use_scan_epochs: bool = True
    # "float32" (reference parity, default) or "bfloat16" (mixed precision:
    # bf16 activations/matmuls, f32 params/BN-stats/loss).
    compute_dtype: str = "float32"
    # Device-resident feature storage layout for single-device scan epochs:
    # "nchw" (default; API layout, models transpose per step) or "nhwc"
    # (stored (N,F,M,1) once at adoption, models skip the per-step
    # relayout). API boundaries (ArraySet, npy contract) are NCHW either
    # way; the per-batch and sharded engines always use NCHW storage.
    feature_layout: str = "nchw"
    # First smallcnn/smalllstm conv block via the Pallas-backward fused op
    # (ops/fused_conv_block; identical params + forward, faster gradients).
    # "auto" = on for single-chip TPU, off elsewhere (the custom call is not
    # GSPMD-partitionable, so multi-chip sharded runs keep the XLA path).
    fused_conv_block: str = "auto"
    # smallcnn blocks 2-3 conv lowering: "lax" (stock lax.conv) or "im2col"
    # (taps matmul — MXU-shaped for the tiny W extents; same param tree).
    # "auto" currently = "lax"; flipped per-backend once the campaign's
    # block2_shootout measures a win (VERDICT r3 item 6).
    conv_impl: str = "auto"
    # Second/third smallcnn/smalllstm conv blocks via the Pallas-backward
    # fused op (ops/fused_conv_block2; train-mode only, identical params +
    # forward). "auto" currently = off — measurement-gated: the campaign's
    # block2_shootout stage times them against lax/im2col before any flip.
    fused_block2: str = "auto"
    fused_block3: str = "auto"
    # Multi-chip pure-DP epochs as one shard_map'd scan per epoch (dataset
    # row-sharded, psum'd grads/metrics, sync-BN) instead of the per-batch
    # GSPMD path. "auto" = on for real multi-chip TPU meshes; off on the
    # CPU test mesh so fixed-seed anchors stay on the per-batch path
    # (train/scan_epoch.py sharded engine has its own equivalence tests).
    sharded_scan_epochs: str = "auto"
    # Persistent XLA compilation cache (utils/compile_cache.py): "auto" =
    # $JAX_COMPILATION_CACHE_DIR or ~/.cache/audiobd_tpu/jax_cache; "off"
    # disables; any other string is the cache dir. Enabled by every CLI —
    # reruns and chained defenses skip the ~20-60 s/program tunnel compiles.
    compilation_cache: str = "auto"


@dataclass
class MeshConfig:
    """Device-mesh layout for pjit sharding."""

    data: int = -1   # -1 = all remaining devices on the data axis
    model: int = 1   # tensor-parallel axis (models here are small; default off)


@dataclass
class AttackConfig:
    name: str = "badnets"
    model: str = "smallcnn"
    dataset: str = "SCDv1-10"
    num_classes: int = 10
    target_label: int = 2          # hardcoded torch.tensor(2) in reference
    poisoning_rate: float = 0.1
    result: str = "badnets_smallcnn"
    load_clean_data: bool = True
    # BadNets
    trigger_size: int = 5
    # Ultrasonic
    trigger_pos: str = "start"
    trigger_cont: bool = True
    ultra_trigger_size: int = 60   # percent of the 1 s trigger kept
    # JingleBack
    style: int = 0
    # DABA
    poison_label: str = "up"
    trigger_selection_mode: str = "Cer&Inf"
    variant: bool = True
    po_db: float = -20.0
    host_candidates: int = 3000
    # FlowMur
    trigger_duration: float = 0.5
    snr_db: int = 30
    flowmur_opt_epochs: int = 300
    flowmur_opt_lr: float = 1e-3
    flowmur_clamp: float = 0.2
    # "per_batch" (default): Adam step + clamp per batch on that batch's own
    # gradient. "accumulated": reference-faithful — an Adam step + clamp per
    # batch on the PREFIX SUM of the epoch's gradients so far (the running
    # loss + backward(retain_graph) + step inside the batch loop,
    # utils/flowmur_generate_trigger.py:100-105).
    flowmur_update: str = "per_batch"
    # Trigger-opt restarts with probe-victim selection (round-5 mitigation
    # for the seed-bimodal ASR failure, flowmur_diagnosis_r5.jsonl: the
    # attack's outcome is decided by victim epoch ~10 — ASR@10 >= 53 on
    # succeeding seeds vs <= 11 on failing ones — so a short probe victim
    # ranks candidate triggers cheaply). 1 = reference-faithful single opt.
    flowmur_restarts: int = 1
    flowmur_probe_epochs: int = 10
    surrogate_runs: int = 3
    surrogate_epochs: int = 1000

    dsp: DSPConfig = field(default_factory=DSPConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    @property
    def labels(self) -> list[str]:
        return DATASET_LABELS[self.dataset]

    @property
    def data_path(self) -> str:
        return DATASET_PATHS[self.dataset]

    @property
    def record_dir(self) -> str:
        return f"record/{self.result}"


# Per-attack DSP + per-model feature-size table (attack_config.txt:1-23 and
# the load_model() clones: badnets.py:112-125, ultrasonic.py:140-153,
# flowmur.py:129-142, utils/daba_injection_tools.py:14-27).
ATTACK_PRESETS: dict[str, dict[str, Any]] = {
    "badnets": {
        "dsp": dict(sample_rate=16000, n_mfcc=40, n_fft=400, hop_length=160, parity="torchaudio"),
        "linear_features": {
            "smallcnn": 3072, "largecnn": 12288, "smalllstm": 128,
            "lstmwithattention": 101, "rnn": 40, "resnet": 384,
        },
        "result": "badnets_smallcnn",
    },
    "jingleback": {
        "dsp": dict(sample_rate=16000, n_mfcc=40, n_fft=400, hop_length=160, parity="torchaudio"),
        "linear_features": {
            "smallcnn": 3072, "largecnn": 12288, "smalllstm": 128,
            "lstmwithattention": 101, "rnn": 40, "resnet": 384,
        },
        "result": "jingleback_smallcnn",
    },
    "ultrasonic": {
        "dsp": dict(sample_rate=44100, n_mfcc=40, n_fft=1103, hop_length=441, parity="torchaudio"),
        "linear_features": {
            "smallcnn": 3072, "largecnn": 12288, "smalllstm": 128,
            "lstmwithattention": 100, "rnn": 40, "resnet": 384,
        },
        "result": "ultrasonic_smallcnn",
    },
    "daba": {
        "dsp": dict(sample_rate=16000, n_mfcc=40, n_fft=2048, hop_length=512, parity="librosa"),
        "linear_features": {
            "smallcnn": 896, "largecnn": 3072, "smalllstm": 128,
            "lstmwithattention": 32, "rnn": 40, "resnet": 128,
        },
        "result": "daba_smallcnn",
    },
    "flowmur": {
        "dsp": dict(sample_rate=16000, n_mfcc=13, n_fft=2048, hop_length=512, parity="torchaudio"),
        "linear_features": {
            "smallcnn": 224, "largecnn": 768, "smalllstm": 32,
            "lstmwithattention": 32, "rnn": 13, "resnet": 64,
        },
        "result": "flowmur_smallcnn",
    },
}


def linear_features_for(attack: str, model: str) -> int:
    """Flatten/seq size the model constructor needs for this attack's shapes."""
    return ATTACK_PRESETS[attack]["linear_features"][model.lower()]


def make_config(attack: str, **overrides: Any) -> AttackConfig:
    """Build an AttackConfig from the attack preset plus keyword overrides."""
    preset = ATTACK_PRESETS[attack]
    cfg = AttackConfig(name=attack, result=preset["result"])
    cfg.dsp = DSPConfig(**preset["dsp"])
    if attack == "flowmur":
        cfg.model = "smallcnn"
    _apply_overrides(cfg, overrides)
    return cfg


def _apply_overrides(cfg: AttackConfig, overrides: dict[str, Any]) -> None:
    for key, value in overrides.items():
        if value is None:
            continue
        if hasattr(cfg, key):
            setattr(cfg, key, value)
        elif hasattr(cfg.dsp, key):
            setattr(cfg.dsp, key, value)
        elif hasattr(cfg.train, key):
            setattr(cfg.train, key, value)
        elif hasattr(cfg.mesh, key):
            setattr(cfg.mesh, key, value)
        else:
            raise KeyError(f"Unknown config key: {key}")


def load_yaml(path: str) -> dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f) or {}


def config_from_yaml(path: str, attack: str | None = None, **cli_overrides: Any) -> AttackConfig:
    """YAML first, then CLI overrides on top (CLI wins)."""
    raw = load_yaml(path)
    attack = attack or raw.pop("attack", None) or raw.pop("name", None)
    if attack is None:
        raise ValueError(f"YAML {path} must name an 'attack'")
    nested = {}
    for section in ("dsp", "train", "mesh"):
        nested.update(raw.pop(section, None) or {})
    raw.update(nested)
    raw.update({k: v for k, v in cli_overrides.items() if v is not None})
    return make_config(attack, **raw)


def add_common_args(parser: argparse.ArgumentParser) -> None:
    """Flags mirroring the reference scripts' argparse (badnets.py:17-36)."""
    parser.add_argument("--config", type=str, default=None, help="YAML config path")
    parser.add_argument("--model", type=str, default=None)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--load_clean_data", type=lambda s: s.lower() != "false", default=None)
    parser.add_argument("--sample_rate", type=int, default=None)
    parser.add_argument("--n_mfcc", type=int, default=None)
    parser.add_argument("--n_fft", type=int, default=None)
    parser.add_argument("--hop_length", type=int, default=None)
    parser.add_argument("--poisoning_rate", type=float, default=None)
    parser.add_argument("--learning_rate", type=float, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--num_classes", type=int, default=None)
    parser.add_argument("--num_epochs", type=int, default=None)
    parser.add_argument("--patience", type=int, default=None)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--result", type=str, default=None)
    parser.add_argument(
        "--fused_conv_block", type=str, default=None, choices=["auto", "on", "off"],
        help="Pallas-backward first conv block (TrainConfig.fused_conv_block)",
    )
    parser.add_argument(
        "--fused_block2", type=str, default=None, choices=["auto", "on", "off"],
        help="Pallas-backward second conv block (TrainConfig.fused_block2)",
    )
    parser.add_argument(
        "--fused_block3", type=str, default=None, choices=["auto", "on", "off"],
        help="Pallas-backward third conv block (TrainConfig.fused_block3)",
    )


def _is_config_key(key: str) -> bool:
    probe = AttackConfig()
    return (
        hasattr(probe, key)
        or hasattr(probe.dsp, key)
        or hasattr(probe.train, key)
        or hasattr(probe.mesh, key)
    )


def config_from_args(attack: str, args: argparse.Namespace, **extra: Any) -> AttackConfig:
    """Config keys from argparse (CLI-only flags like --synthetic are
    ignored here and handled by the entry script itself)."""
    cli = {
        k: v for k, v in vars(args).items()
        if k != "config" and v is not None and _is_config_key(k)
    }
    cli.update({k: v for k, v in extra.items() if v is not None})
    if getattr(args, "config", None):
        return config_from_yaml(args.config, attack=attack, **cli)
    return make_config(attack, **cli)


def to_dict(cfg: AttackConfig) -> dict[str, Any]:
    return dataclasses.asdict(cfg)
