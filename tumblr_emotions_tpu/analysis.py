"""Emotion-structure analysis (SURVEY.md §2a #13).

The reference's notebooks project the trained model's 15-dim softmax
outputs with PCA and recover a valence/arousal "circumplex" structure of
emotions (the paper's headline analysis).  This module reproduces that as
a library function: collect prediction vectors over a split, PCA them, and
report each emotion's coordinates in the first two components plus the
explained variance.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

from tumblr_emotions_tpu.config import EMOTIONS


def pca(x: np.ndarray, n_components: int = 2
        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Plain SVD PCA: returns (projected, components [k,D], explained_ratio)."""
    x = np.asarray(x, np.float64)
    mean = x.mean(axis=0)
    xc = x - mean
    u, s, vt = np.linalg.svd(xc, full_matrices=False)
    var = (s ** 2) / max(len(x) - 1, 1)
    ratio = var / var.sum()
    comps = vt[:n_components]
    return xc @ comps.T, comps, ratio[:n_components]


def circumplex(probs: np.ndarray, labels: np.ndarray,
               emotions: Sequence[str] = EMOTIONS,
               n_components: int = 2) -> Dict:
    """PCA of per-class mean prediction vectors -> circumplex coordinates.

    probs: [N, C] softmax outputs; labels: [N] true class ids.
    Returns {"coords": {emotion: [pc1, pc2]}, "explained_variance": [...]}.
    """
    probs = np.asarray(probs, np.float64)
    labels = np.asarray(labels)
    C = probs.shape[1]
    means = np.stack([
        probs[labels == c].mean(axis=0) if np.any(labels == c)
        else np.zeros(C) for c in range(C)])
    projected, comps, ratio = pca(means, n_components)
    return {
        "coords": {emotions[c]: projected[c].tolist() for c in range(C)},
        "components": comps.tolist(),
        "explained_variance": ratio.tolist(),
    }


def angular_order(coords: Dict[str, List[float]]) -> List[str]:
    """Emotions ordered by angle around the circumplex (paper-style view)."""
    def angle(xy):
        return float(np.arctan2(xy[1], xy[0]))

    return sorted(coords, key=lambda e: angle(coords[e]))


def format_circumplex(result: Dict) -> str:
    lines = [
        "PCA of per-emotion mean predictions "
        f"(explained variance: {', '.join(f'{r:.2f}' for r in result['explained_variance'])})",
        f"{'emotion':<12} {'pc1':>8} {'pc2':>8}",
    ]
    for e in angular_order(result["coords"]):
        x, y = result["coords"][e][:2]
        lines.append(f"{e:<12} {x:>8.4f} {y:>8.4f}")
    return "\n".join(lines)
