"""Streaming classification metrics (accuracy, per-class, confusion).

Rebuilds the reference's slim.evaluation / tf.metrics streaming counters
(SURVEY.md §2a #11) as a pure-pytree accumulator: each batch produces a
sufficient-statistics pytree that adds associatively, so it works unchanged
under jit, across devices (the confusion matrix is a small [C, C] int array
that XLA all-reduces), and across eval batches on host.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def batch_stats(logits: jax.Array, labels: jax.Array, num_classes: int,
                weights: Optional[jax.Array] = None) -> Dict[str, jax.Array]:
    """Per-batch sufficient statistics; add pytrees to stream.

    ``weights`` (0/1 per example) masks out padding rows — static batch
    shapes on TPU mean the final partial eval batch arrives padded.
    """
    preds = jnp.argmax(logits, axis=-1)
    if weights is None:
        weights = jnp.ones(labels.shape, jnp.int32)
    weights = weights.astype(jnp.int32)
    onehot_true = jax.nn.one_hot(labels, num_classes, dtype=jnp.int32)
    onehot_pred = jax.nn.one_hot(preds, num_classes, dtype=jnp.int32) * weights[:, None]
    # confusion[i, j] = count(true=i, pred=j) over valid rows
    confusion = jnp.einsum("bi,bj->ij", onehot_true, onehot_pred)
    return {
        "count": jnp.sum(weights),
        "correct": jnp.sum((preds == labels).astype(jnp.int32) * weights),
        "confusion": confusion,
    }


def merge_stats(a: Dict[str, jax.Array], b: Dict[str, jax.Array]):
    return jax.tree_util.tree_map(lambda x, y: x + y, a, b)


def summarize(stats: Dict[str, np.ndarray],
              class_names: Optional[Sequence[str]] = None) -> Dict:
    """Final metrics: top-1 accuracy, per-class recall/precision table."""
    confusion = np.asarray(stats["confusion"], np.float64)
    count = float(stats["count"])
    correct = float(stats["correct"])
    true_tot = confusion.sum(axis=1)
    pred_tot = confusion.sum(axis=0)
    diag = np.diag(confusion)
    with np.errstate(divide="ignore", invalid="ignore"):
        recall = np.where(true_tot > 0, diag / true_tot, 0.0)
        precision = np.where(pred_tot > 0, diag / pred_tot, 0.0)
    out = {
        "accuracy": correct / max(count, 1.0),
        "count": int(count),
        "per_class_recall": recall,
        "per_class_precision": precision,
        "confusion": confusion,
    }
    if class_names is not None:
        out["per_class"] = {
            name: {"recall": float(recall[i]), "precision": float(precision[i]),
                   "support": int(true_tot[i])}
            for i, name in enumerate(class_names)
        }
    return out


def format_per_class(summary: Dict) -> str:
    """Human-readable per-emotion table (BASELINE config 5: 'eval per
    emotion class')."""
    lines = [f"accuracy: {summary['accuracy']:.4f}  (n={summary['count']})"]
    per = summary.get("per_class", {})
    if per:
        lines.append(f"{'emotion':<12} {'recall':>8} {'precision':>10} {'support':>8}")
        for name, m in per.items():
            lines.append(
                f"{name:<12} {m['recall']:>8.4f} {m['precision']:>10.4f} "
                f"{m['support']:>8d}")
    return "\n".join(lines)
