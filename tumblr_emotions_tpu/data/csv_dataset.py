"""Small CSV post dataset: the reference's scraped-posts CSV format.

SURVEY.md §3.5: the scraper writes post text/metadata CSV rows; the
text-only model (BASELINE config 1) trains straight off such a CSV.  Columns
(header required): ``text`` and one of ``label`` (int) / ``emotion`` (name);
optional ``id`` and ``image`` (path to the downloaded image file).
"""

from __future__ import annotations

import csv
import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from tumblr_emotions_tpu.config import EMOTIONS
from tumblr_emotions_tpu.data.vocab import Vocabulary


@dataclasses.dataclass
class Post:
    text: str
    label: int
    post_id: str = ""
    image_path: str = ""


def load_posts_csv(path: str,
                   emotions: Sequence[str] = EMOTIONS) -> List[Post]:
    label_of = {name: i for i, name in enumerate(emotions)}
    posts: List[Post] = []
    with open(path, newline="") as f:
        reader = csv.DictReader(f)
        for row in reader:
            if "label" in row and row["label"] not in (None, ""):
                label = int(row["label"])
            elif "emotion" in row:
                emotion = row["emotion"].strip().lstrip("#").lower()
                if emotion not in label_of:
                    continue
                label = label_of[emotion]
            else:
                raise ValueError(f"{path}: need a 'label' or 'emotion' column")
            posts.append(Post(text=row.get("text", ""), label=label,
                              post_id=row.get("id", ""),
                              image_path=row.get("image", "")))
    return posts


def text_batches(posts: Sequence[Post], vocab: Vocabulary, batch_size: int,
                 max_len: int, shuffle: bool = True, seed: int = 0,
                 num_epochs: Optional[int] = None,
                 drop_remainder: bool = True) -> Iterator[Dict[str, np.ndarray]]:
    """Epochs of {tokens, lengths, label, weight} numpy batches.

    Static shapes for TPU: every batch has exactly ``batch_size`` rows.  With
    ``drop_remainder=False`` the final partial batch is padded and its
    padding rows carry ``weight == 0`` (the eval loop masks them out).
    """
    tokens, lengths = vocab.encode_batch([p.text for p in posts], max_len)
    labels = np.asarray([p.label for p in posts], np.int32)
    n = len(posts)
    rng = np.random.RandomState(seed)
    epoch = 0
    while num_epochs is None or epoch < num_epochs:
        order = rng.permutation(n) if shuffle else np.arange(n)
        stop = n - batch_size + 1 if drop_remainder else n
        for start in range(0, max(stop, 0), batch_size):
            idx = order[start:start + batch_size]
            weight = np.ones((len(idx),), np.int32)
            if len(idx) < batch_size:
                pad = batch_size - len(idx)
                idx = np.concatenate([idx, np.zeros((pad,), idx.dtype)])
                weight = np.concatenate([weight, np.zeros((pad,), np.int32)])
            yield {"tokens": tokens[idx], "lengths": lengths[idx],
                   "label": labels[idx], "weight": weight}
        epoch += 1
