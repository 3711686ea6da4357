"""Single-post predict (SURVEY.md §3.4 / §2a #12).

The reference builds a batch-1 graph, feeds one image+text, and reads the
15-way softmax.  Here: decode at full resolution (C++ decoder), run the
EXACT eval preprocessing (central crop at native resolution -> TF1 bilinear
to 299) on device fused with the forward pass — the parity path, batch 1.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np

from tumblr_emotions_tpu.config import EMOTIONS, Config
from tumblr_emotions_tpu.data import jpeg as jpeg_lib
from tumblr_emotions_tpu.data.preprocessing import preprocess_for_eval
from tumblr_emotions_tpu.data.vocab import Vocabulary


class Predictor:
    """Batch-1 emotion predictor over a trained joint/image/text model."""

    def __init__(self, cfg: Config, variables: Dict,
                 vocab: Optional[Vocabulary] = None,
                 emotions: Sequence[str] = EMOTIONS):
        from tumblr_emotions_tpu.train.trainer import build_model

        self.cfg = cfg
        self.variables = variables
        self.vocab = vocab
        self.emotions = list(emotions)
        self.model, self.forward = build_model(cfg)
        self._jitted = {}  # keyed by raw image shape (per-shape compile)

    def _predict_fn(self):
        def f(variables, batch):
            if "image" in batch:
                image = preprocess_for_eval(
                    batch["image"],
                    self.cfg.image.image_size, self.cfg.image.image_size,
                    central_fraction=self.cfg.data.eval_central_crop,
                    resize_method=self.cfg.data.resize_method)
                batch = dict(batch, image=image)
            logits, end_points = self.forward(variables, batch, train=False)
            return end_points["Predictions"]
        return f

    def predict(self, image_bytes: Optional[bytes] = None,
                text: Optional[str] = None) -> Dict[str, float]:
        """One post -> {emotion: probability}, sorted descending."""
        batch: Dict[str, jax.Array] = {}
        if self.cfg.model in ("image", "joint"):
            if image_bytes is None:
                raise ValueError(f"model {self.cfg.model!r} needs an image")
            raw = jpeg_lib.decode(image_bytes)
            batch["image"] = raw[None]  # [1, H, W, 3] native resolution
        if self.cfg.model in ("text", "joint"):
            if text is None:
                raise ValueError(f"model {self.cfg.model!r} needs text")
            if self.vocab is None:
                raise ValueError("predictor needs a vocabulary for text")
            ids, length = self.vocab.encode(text, self.cfg.text.max_len)
            batch["tokens"] = ids[None]
            batch["lengths"] = np.asarray([length], np.int32)

        shape_key = batch["image"].shape if "image" in batch else ("text",)
        if shape_key not in self._jitted:
            self._jitted[shape_key] = jax.jit(self._predict_fn())
        probs = np.asarray(self._jitted[shape_key](self.variables, batch))[0]
        order = np.argsort(-probs)
        return {self.emotions[i]: float(probs[i]) for i in order}
