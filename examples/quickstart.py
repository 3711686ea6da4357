"""End-to-end offline quickstart: synthetic corpus -> records -> vocab ->
joint train -> eval -> predict -> online serving.

Runs the SAME CLI entry points a user would (in-process, one jax runtime),
on a generated 15-emotion corpus whose images and captions carry a real
class signal, so a short training run visibly learns.  No network, no
fixtures.  On CPU the Inception compiles dominate; on a TPU chip the whole
script is a couple of minutes.

    python examples/quickstart.py --workdir /tmp/tet_quickstart --steps 30
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tumblr_emotions_tpu import cli  # noqa: E402
from tumblr_emotions_tpu.config import EMOTIONS

KEYWORDS = {e: [e, f"so {e}", f"feeling {e} today"] for e in EMOTIONS}
FILLER = ["just", "a", "photo", "from", "my", "day", "tbh", "mood"]


def synth_corpus(workdir: str, n_per_class: int, seed: int = 0):
    """CSV + JPEGs in the scraper's output format; images carry a per-class
    color gradient (plus noise), captions a per-class keyword."""
    from PIL import Image

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(workdir, "images")
    os.makedirs(img_dir, exist_ok=True)
    csv_path = os.path.join(workdir, "posts.csv")
    yy, xx = np.mgrid[0:128, 0:128].astype(np.float32) / 128.0
    with open(csv_path, "w") as f:
        f.write("id,text,emotion\n")
        pid = 0
        for label, emotion in enumerate(EMOTIONS):
            phase = 2 * np.pi * label / len(EMOTIONS)
            base = np.stack([
                127 + 120 * np.sin(phase) * xx,
                127 + 120 * np.cos(phase) * yy,
                127 + 120 * np.sin(phase + 1.0) * (xx + yy) / 2,
            ], -1)
            for k in range(n_per_class):
                img = np.clip(base + rng.randn(128, 128, 3) * 24, 0, 255)
                Image.fromarray(img.astype(np.uint8)).save(
                    os.path.join(img_dir, f"{pid}.jpg"), quality=90)
                words = [rng.choice(KEYWORDS[emotion])] + list(
                    rng.choice(FILLER, size=3))
                rng.shuffle(words)
                f.write(f'{pid},"{" ".join(words)}",{emotion}\n')
                pid += 1
    return csv_path, img_dir


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/tet_quickstart")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--n-per-class", type=int, default=8)
    ap.add_argument("--depth-multiplier", type=float, default=0.25)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--skip-serve", action="store_true")
    args = ap.parse_args()

    wd = args.workdir
    os.makedirs(wd, exist_ok=True)
    print(f"[1/6] synthesizing {args.n_per_class * len(EMOTIONS)} posts")
    csv_path, img_dir = synth_corpus(wd, args.n_per_class)

    print("[2/6] convert-dataset -> sharded TFRecords")
    data_dir = os.path.join(wd, "data")
    assert cli.main(["convert-dataset", "--csv", csv_path,
                     "--images-dir", img_dir, "--out", data_dir,
                     "--num-shards", "2", "--valid-fraction", "0.2"]) == 0

    print("[3/6] build-vocab")
    vocab_path = os.path.join(wd, "vocab.txt")
    assert cli.main(["build-vocab", "--csv", csv_path, "--out", vocab_path,
                     "--min-freq", "1"]) == 0

    common = ["--model", "joint", "--vocab", vocab_path,
              "--depth-multiplier", str(args.depth_multiplier),
              "--batch-size", str(args.batch_size), "--precision", "perf",
              "--checkpoint-dir", os.path.join(wd, "ckpt")]
    print(f"[4/6] train the joint model {args.steps} steps")
    assert cli.main(["train", "--records",
                     os.path.join(data_dir, "train-*.tfrecord"),
                     "--steps", str(args.steps), "--learning-rate", "0.01",
                     *common]) == 0

    print("[5/6] eval per emotion class + single-post predict")
    assert cli.main(["eval", "--records",
                     os.path.join(data_dir, "validation-*.tfrecord"),
                     *common]) == 0
    assert cli.main(["predict", "--image", os.path.join(img_dir, "0.jpg"),
                     "--text", "feeling optimistic today", *common]) == 0

    if not args.skip_serve:
        print("[6/6] online serving (library API; `cli serve` is the "
              "blocking equivalent)")
        import jax

        from tumblr_emotions_tpu.config import get_preset
        from tumblr_emotions_tpu.data.vocab import Vocabulary
        from tumblr_emotions_tpu.ops.serving import build_forward
        from tumblr_emotions_tpu.parallel import mesh as mesh_lib
        from tumblr_emotions_tpu.server import (BatchedPredictor,
                                                EmotionHTTPServer)
        from tumblr_emotions_tpu.train.trainer import Trainer

        vocab = Vocabulary.load(vocab_path)
        cfg = get_preset("joint_finetune")
        cfg = cfg.replace(
            model="joint",
            image=cfg.image.replace(depth_multiplier=args.depth_multiplier),
            text=cfg.text.replace(vocab_size=vocab.size),
            train=cfg.train.replace(
                batch_size=args.batch_size, precision_mode="perf",
                checkpoint_dir=os.path.join(wd, "ckpt")))
        trainer = Trainer(cfg, preprocess="train")
        sample = {"image": np.zeros((1, 347, 347, 3), np.uint8),
                  "tokens": np.zeros((1, cfg.text.max_len), np.int32),
                  "lengths": np.ones((1,), np.int32),
                  "label": np.zeros((1,), np.int32)}
        state = trainer.init_state(jax.random.PRNGKey(0), sample)
        state = trainer.restore_latest(state) or state
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        mesh = mesh_lib.create_mesh(devices=jax.devices()[:1])
        runner = build_forward(cfg, trainer, variables, mesh, engine="bf16")
        predictor = BatchedPredictor(runner, batch_size=4, host_size=347,
                                     vocab=vocab, max_len=cfg.text.max_len,
                                     max_delay_ms=20.0)
        srv = EmotionHTTPServer(predictor, host="127.0.0.1", port=0)
        srv.serve_background()
        host, port = srv.server_address
        with open(os.path.join(img_dir, "0.jpg"), "rb") as f:
            body = f.read()
        req = urllib.request.Request(
            f"http://{host}:{port}/predict?text=so+optimistic",
            data=body, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            out = json.loads(r.read())
        print("served prediction:", out["top"],
              f"(p={max(out['probs'].values()):.3f})")
        srv.close()

    print("quickstart complete; artifacts in", wd)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
