"""Generate notebooks/circumplex.ipynb (run: python notebooks/make_circumplex_nb.py).

The reference repo ships its emotion-structure analysis as notebooks
(SURVEY.md §2a #13); this writes the equivalent notebook for this
framework.  The notebook is fully offline-executable: it synthesizes a
circumplex-structured toy corpus, trains the text-only model on it, and
shows the paper's PCA analysis recovering the circular emotion structure
from the model's softmax outputs.  tests/test_tooling.py executes it with
nbclient to keep it green.
"""
import nbformat as nbf

nb = nbf.v4.new_notebook()
cells = []

cells.append(nbf.v4.new_markdown_cell("""\
# The structure of emotions: circumplex analysis

The KDD-2018 paper behind the reference repo projects a trained
classifier's 15-dim softmax outputs with PCA and finds the emotions
arranged on a valence/arousal **circumplex** — a circle where nearby
emotions are semantically close (happy ~ excited, sad ~ bored).

This notebook reproduces that analysis end to end with
`tumblr_emotions_tpu`, fully offline:

1. synthesize a toy corpus whose emotions live on a known circle
   (each post borrows marker words from its circular neighbours),
2. train the text-only model on it (`train.Trainer`, jitted loop),
3. collect softmax predictions and run `analysis.circumplex`
   (per-class mean prediction vectors → PCA), and
4. plot the recovered structure.

On real Tumblr data the same code runs via
`python -m tumblr_emotions_tpu.cli analyze --plot circumplex.png`."""))

cells.append(nbf.v4.new_code_cell("""\
import pathlib
import sys

# Run from the repo root or notebooks/ without installing the package.
for p in (pathlib.Path.cwd(), *pathlib.Path.cwd().parents):
    if (p / "tumblr_emotions_tpu").is_dir():
        sys.path.insert(0, str(p))
        break

import numpy as np
import jax

from tumblr_emotions_tpu import analysis
from tumblr_emotions_tpu.config import EMOTIONS, get_preset
from tumblr_emotions_tpu.data import csv_dataset, vocab
from tumblr_emotions_tpu.train import Trainer

C = len(EMOTIONS)
print(f"{C} emotions:", ", ".join(EMOTIONS))"""))

cells.append(nbf.v4.new_markdown_cell("""\
## 1. A corpus with a known circular structure

Place the 15 emotions on a circle.  Each post mostly uses its own
emotion's marker word but borrows markers from circular neighbours with
probability decaying in circular distance — so the *confusions* a model
learns encode the circle, exactly the signal the paper's PCA reads out
of real Tumblr posts."""))

cells.append(nbf.v4.new_code_cell("""\
rng = np.random.RandomState(0)
POSTS_PER_EMOTION, WORDS_PER_POST = 40, 8

def neighbour_probs(i, temp=1.4):
    d = np.array([min(abs(i - j), C - abs(i - j)) for j in range(C)])
    p = np.exp(-d / temp)
    return p / p.sum()

posts = []
for i, emotion in enumerate(EMOTIONS):
    p = neighbour_probs(i)
    for _ in range(POSTS_PER_EMOTION):
        words = [f"mark_{EMOTIONS[j]}"
                 for j in rng.choice(C, WORDS_PER_POST, p=p)]
        posts.append(csv_dataset.Post(text=" ".join(words), label=i))
rng.shuffle(posts)
print(len(posts), "posts; example:",
      EMOTIONS[posts[0].label], "->", posts[0].text)"""))

cells.append(nbf.v4.new_markdown_cell("""\
## 2. Train the text-only model

The same `Trainer` used by `cli train` (jit-compiled step, data-parallel
over whatever mesh is available — one TPU chip, 8 virtual CPU devices in
tests, or a pod slice in production)."""))

cells.append(nbf.v4.new_code_cell("""\
v = vocab.build_vocabulary([p.text for p in posts], max_size=500, min_freq=1)
cfg = get_preset("text_only")
cfg = cfg.replace(
    text=cfg.text.replace(vocab_size=v.size, embed_dim=32, max_len=12),
    train=cfg.train.replace(batch_size=64, num_steps=250, log_every=10**9,
                            checkpoint_every=10**9))

trainer = Trainer(cfg)
batches = csv_dataset.text_batches(posts, v, cfg.train.batch_size,
                                   cfg.text.max_len, seed=0)
state = trainer.init_state(
    jax.random.PRNGKey(0),
    next(iter(csv_dataset.text_batches(posts, v, 8, cfg.text.max_len))))
state = trainer.fit(state, batches, num_steps=cfg.train.num_steps)
print("trained", int(state.step), "steps")"""))

cells.append(nbf.v4.new_code_cell("""\
eval_batches = list(csv_dataset.text_batches(
    posts, v, 64, cfg.text.max_len, shuffle=False, num_epochs=1,
    drop_remainder=False))
summary = trainer.evaluate(state, eval_batches, class_names=EMOTIONS)
print("accuracy:", round(summary["accuracy"], 3),
      "(chance would be", round(1 / C, 3), "— neighbour sharing caps it)")"""))

cells.append(nbf.v4.new_markdown_cell("""\
## 3. Softmax predictions → circumplex PCA

`analysis.circumplex` averages the prediction vectors per true class and
projects the 15 class means onto the first two principal components —
the paper's Figure-style analysis."""))

cells.append(nbf.v4.new_code_cell("""\
import jax.numpy as jnp

variables = {"params": state.params, "batch_stats": state.batch_stats}

@jax.jit
def probs_fn(batch):
    _, ep = trainer.forward(variables, batch, train=False)
    return ep["Predictions"]

probs, labels = [], []
for b in eval_batches:
    p = np.asarray(probs_fn({k: jnp.asarray(v) for k, v in b.items()}))
    w = np.asarray(b.get("weight", np.ones(len(p), np.int32)))
    probs.append(p[w == 1])
    labels.append(np.asarray(b["label"])[w == 1])
probs, labels = np.concatenate(probs), np.concatenate(labels)
result = analysis.circumplex(probs, labels)
print(analysis.format_circumplex(result))"""))

cells.append(nbf.v4.new_code_cell("""\
order = analysis.angular_order(result["coords"])
print("angular order:", " -> ".join(order))

# The corpus was built on a known circle; the recovered angular order
# must walk that circle (up to rotation/reflection).
idx = [EMOTIONS.index(e) for e in order]
start = idx.index(0)
walk = idx[start:] + idx[:start]
forward = sum((b - a) % C == 1 for a, b in zip(walk, walk[1:] + [walk[0]]))
backward = sum((a - b) % C == 1 for a, b in zip(walk, walk[1:] + [walk[0]]))
print(f"circular adjacency recovered: {max(forward, backward)}/{C} steps")
assert max(forward, backward) >= C - 3, "PCA failed to recover the circle"
"""))

cells.append(nbf.v4.new_code_cell("""\
import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

path = analysis.plot_circumplex(result, "circumplex_toy.png")
from IPython.display import Image, display
display(Image(filename=path))"""))

cells.append(nbf.v4.new_markdown_cell("""\
## 4. On real data

With a trained joint checkpoint and real Tumblr records the exact same
analysis runs from the CLI:

```bash
python -m tumblr_emotions_tpu.cli analyze --preset joint_finetune \\
    --records 'data/validation-*.tfrecord' --vocab data/vocab.txt \\
    --checkpoint-dir runs/joint --plot circumplex.png
```

The paper's finding is that the first two components of the 15-dim
softmax outputs arrange the emotions by valence (PC1) and arousal (PC2);
`analysis.angular_order` prints the circumplex walk."""))

nb.cells = cells
for i, c in enumerate(nb.cells):
    c["id"] = f"cell-{i}"  # nbformat's default ids are random; keep it stable
nb.metadata["kernelspec"] = {"name": "python3", "display_name": "Python 3",
                             "language": "python"}
path = __file__.replace("make_circumplex_nb.py", "circumplex.ipynb")
with open(path, "w") as f:
    nbf.write(nb, f)
print("wrote", path)
