"""tumblr_emotions_tpu: TPU-native multimodal emotion classification framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``anthonyhu/tumblr-emotions`` (KDD 2018 "Multimodal Sentiment Analysis to
Explore the Structure of Emotions"): an Inception-v3 image branch, a
word-embedding text branch, and a concat-fusion "Deep Sentiment" classifier
over 15 Tumblr emotion hashtag labels — trained and served on TPU via
jit/pjit data parallelism, fed by a grain host pipeline with a C++ libjpeg
decoder, with an Orbax checkpoint story plus a TF-Slim checkpoint converter.

Layer map (SURVEY.md §2):
  L0 native runtime  -> XLA:TPU + Pallas kernels + C++ host JPEG decode
  L1 data            -> tumblr_emotions_tpu.data  (records, vocab, pipeline)
  L2 models/ops      -> tumblr_emotions_tpu.models / .ops
  L3 train/eval loop -> tumblr_emotions_tpu.train
  L4 entry points    -> tumblr_emotions_tpu.cli  (train / eval / predict)
"""

__version__ = "0.1.0"

from tumblr_emotions_tpu.config import (  # noqa: F401
    EMOTIONS,
    NUM_CLASSES,
    Config,
    DataConfig,
    ImageConfig,
    MeshConfig,
    TextConfig,
    TrainConfig,
    get_preset,
    PRESETS,
)
