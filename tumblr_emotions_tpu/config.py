"""Config system: one dataclass tree + the five BASELINE.json presets.

The reference scatters ``tf.app.flags`` across per-model scripts (SURVEY.md
§2a #14).  Here a single immutable dataclass tree replaces them; the five
BASELINE.json ``configs`` entries are named presets, smallest slice first.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

# The 15 Tumblr emotion hashtag labels (SURVEY.md §1; paper arXiv:1805.10205).
# Order is alphabetical for determinism; the label file written next to any
# dataset is authoritative at run time (datasets may carry their own list).
EMOTIONS: Tuple[str, ...] = (
    "amazed",
    "angry",
    "annoyed",
    "ashamed",
    "bored",
    "calm",
    "disgusted",
    "excited",
    "happy",
    "love",
    "optimistic",
    "pensive",
    "sad",
    "scared",
    "surprised",
)
NUM_CLASSES = len(EMOTIONS)


class _Replaceable:
    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class TextConfig(_Replaceable):
    """Text branch: vocab lookup -> embedding matrix -> aggregate -> head."""

    vocab_size: int = 50_000
    embed_dim: int = 200          # GloVe-style dims; reference used word2vec/GloVe
    max_len: int = 50             # Tumblr captions are short (SURVEY.md §2c)
    aggregator: str = "mean"      # "mean" | "sum" | "rnn"  (BASELINE contract is
                                  # dense-over-embeddings; "rnn" kept pluggable per
                                  # SURVEY.md §7 ambiguity note)
    rnn_hidden: int = 256
    pad_id: int = 0
    oov_id: int = 1
    finetune_embeddings: bool = True
    hidden_dim: int = 0           # optional hidden dense layer; 0 = logits direct


@dataclasses.dataclass(frozen=True)
class ImageConfig(_Replaceable):
    """Image branch: TF-Slim-semantics Inception-v3 (SURVEY.md §2a #5)."""

    image_size: int = 299
    num_classes: int = NUM_CLASSES
    depth_multiplier: float = 1.0
    min_depth: int = 16
    dropout_keep_prob: float = 0.8
    create_aux_logits: bool = True
    aux_loss_weight: float = 0.4  # slim default auxiliary loss weight
    # Batch-norm constants from slim inception_v3_arg_scope: scale=False,
    # decay=0.9997, epsilon=0.001 — a classic parity trap (SURVEY.md §5).
    bn_epsilon: float = 0.001
    bn_momentum: float = 0.9997
    bn_scale: bool = False


@dataclasses.dataclass(frozen=True)
class DataConfig(_Replaceable):
    data_dir: str = ""
    split_name: str = "train"
    records_pattern: str = ""     # glob of TFRecord/ArrayRecord shards
    labels_file: str = ""         # one emotion per line; defaults to EMOTIONS
    vocab_file: str = ""
    embeddings_file: str = ""     # GloVe txt or .npy matrix
    shuffle_buffer: int = 4096
    num_workers: int = 8          # host decode/preprocess workers
    prefetch_batches: int = 2     # device-side double buffering depth
    decode_backend: str = "auto"  # "cpp" | "pil" | "auto"
    eval_central_crop: float = 0.875
    resize_method: str = "tf1"    # "tf1" legacy bilinear (parity) | "half_pixel"


@dataclasses.dataclass(frozen=True)
class MeshConfig(_Replaceable):
    """Device mesh for pjit data parallelism (SURVEY.md §2c).

    The reference is single-device; DP over ICI is the one real parallelism
    obligation.  Axis names are declared for all strategies so TP/PP could be
    added without churn, but only "data" is ever >1 here.
    """

    data: int = -1                # -1 = all available devices
    model: int = 1                # TP axis, unused (24M-param model)
    axis_names: Tuple[str, ...] = ("data", "model")


@dataclasses.dataclass(frozen=True)
class TrainConfig(_Replaceable):
    batch_size: int = 32
    eval_batch_size: int = 64
    learning_rate: float = 1e-3
    lr_decay_steps: int = 0       # 0 = constant lr
    lr_decay_factor: float = 0.94
    optimizer: str = "rmsprop"    # slim fine-tune default; "adam"|"sgd"|"rmsprop"
    rmsprop_decay: float = 0.9
    rmsprop_epsilon: float = 1.0
    momentum: float = 0.9
    weight_decay: float = 4e-5    # slim inception arg_scope default
    grad_clip_norm: float = 0.0   # 0 = off
    num_steps: int = 1000
    log_every: int = 50
    checkpoint_every: int = 500
    checkpoint_dir: str = "/tmp/tumblr_emotions_ckpt"
    keep_checkpoints: int = 3
    log_dir: str = ""                # TensorBoard event files (clu writers)
    profile_start_step: int = 0      # 0 = no jax.profiler trace
    profile_num_steps: int = 3
    seed: int = 0
    # "parity" = f32 everywhere (1e-4 logit budget); "perf" = bf16 compute.
    precision_mode: str = "parity"
    trainable_scopes: str = ""    # e.g. "Logits,AuxLogits" = new-head-only phase
    warmstart_checkpoint: str = ""   # slim .ckpt or orbax dir to restore from
    warmstart_exclude: Tuple[str, ...] = ("Logits", "AuxLogits")


@dataclasses.dataclass(frozen=True)
class Config(_Replaceable):
    name: str = "default"
    model: str = "joint"          # "text" | "image" | "joint"
    text: TextConfig = TextConfig()
    image: ImageConfig = ImageConfig()
    data: DataConfig = DataConfig()
    mesh: MeshConfig = MeshConfig()
    train: TrainConfig = TrainConfig()


def _p(**kw) -> Config:
    return Config(**kw)


# The five BASELINE.json configs, smallest runnable slice first (SURVEY.md §7).
PRESETS = {
    # 1. Text-only: embedding + dense softmax on a small post CSV (CPU-sized).
    "text_only": _p(
        name="text_only",
        model="text",
        train=TrainConfig(batch_size=64, optimizer="adam", learning_rate=1e-3,
                          weight_decay=0.0, num_steps=2000),
    ),
    # 2. Image-only: frozen Inception backbone + linear emotion head.
    "image_frozen": _p(
        name="image_frozen",
        model="image",
        train=TrainConfig(batch_size=32, optimizer="rmsprop",
                          trainable_scopes="Logits,AuxLogits",
                          warmstart_checkpoint="", num_steps=5000),
    ),
    # 3. Joint image+text concat fusion, end-to-end fine-tune.
    "joint_finetune": _p(
        name="joint_finetune",
        model="joint",
        train=TrainConfig(batch_size=32, optimizer="rmsprop",
                          learning_rate=1e-4, num_steps=20000),
    ),
    # 4. Fused TPU inference path: decode+preprocess+forward, bf16 perf mode.
    "fused_inference": _p(
        name="fused_inference",
        model="image",
        train=TrainConfig(batch_size=256, precision_mode="perf"),
    ),
    # 5. Full-corpus data-parallel training over a pod slice.
    "data_parallel": _p(
        name="data_parallel",
        model="joint",
        mesh=MeshConfig(data=-1),
        train=TrainConfig(batch_size=1024, precision_mode="perf",
                          num_steps=100_000),
    ),
}


def get_preset(name: str) -> Config:
    try:
        return PRESETS[name]
    except KeyError:
        raise KeyError(
            f"unknown preset {name!r}; available: {sorted(PRESETS)}") from None
