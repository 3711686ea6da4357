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


def plot_circumplex(result: Dict, path: str) -> str:
    """Render the circumplex as a labeled scatter (the reference notebooks'
    figure).  One neutral mark hue; identity rides the direct text labels
    (15 categorical colors would be unreadable); recessive axes.

    Requires matplotlib (present in this environment; an optional extra,
    not a runtime dependency of the framework).
    """
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "plot_circumplex needs matplotlib (pip install matplotlib)"
        ) from e

    coords = result["coords"]
    ratio = result["explained_variance"]
    xs = np.array([coords[e][0] for e in coords])
    ys = np.array([coords[e][1] for e in coords])

    fig, ax = plt.subplots(figsize=(7, 7), dpi=150)
    ax.axhline(0, color="#d4d4d4", lw=1, zorder=0)
    ax.axvline(0, color="#d4d4d4", lw=1, zorder=0)
    # Unit-ish circle guide at the median radius (circumplex reading aid).
    r = float(np.median(np.hypot(xs, ys)))
    ax.add_patch(plt.Circle((0, 0), r, fill=False, color="#e5e5e5",
                            lw=1, zorder=0))
    ax.scatter(xs, ys, s=48, color="#3b5bd9", zorder=2)
    for e in coords:
        x, y = coords[e][:2]
        off = 0.02 * max(np.abs(xs).max(), np.abs(ys).max(), 1e-9)
        ax.annotate(e, (x, y), xytext=(x + off, y + off), fontsize=10,
                    color="#1f1f1f", zorder=3)
    ax.set_xlabel(f"PC1 ({ratio[0]:.0%} var)", color="#525252")
    ax.set_ylabel(f"PC2 ({ratio[1]:.0%} var)", color="#525252")
    ax.set_title("Emotion circumplex (PCA of per-emotion mean predictions)",
                 fontsize=11)
    ax.set_aspect("equal")
    ax.margins(0.14)  # keep edge labels inside the axes
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color("#a3a3a3")
    ax.tick_params(colors="#525252", labelsize=8)
    fig.tight_layout()
    fig.savefig(path)
    plt.close(fig)
    return path
