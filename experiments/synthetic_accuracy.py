"""Reference-shaped accuracy benchmark on synthetic data (VERDICT r3
"What's missing" #2).

The paper's accuracy table (~36% image / ~69% text / ~72% joint,
SURVEY.md §6) is untestable without the Tumblr corpus, which does not
exist on disk.  This benchmark reproduces the SHAPE of that experiment
honestly: a 15-class multimodal corpus whose two modalities carry
controlled, independent amounts of label information —

    y        ~ U(15)                                  true emotion
    y_img    = y with prob P_IMG else U(15)           what the image shows
    y_txt    = y with prob P_TXT else U(15)           what the caption says
    image    = class grating(y_img) + noise  (uint8 [B, 347, 347, 3])
    tokens   = class tokens(y_txt) + filler  (int32 [B, max_len])

With P_IMG=0.35 and P_TXT=0.70, Bayes-optimal single-modality accuracy is
P + (1-P)/15 (image 39.3%, text 72.0%) and the joint posterior — which
can exploit agreement between the modalities — sits strictly above the
text ceiling (~75%), mirroring the paper's ordering image < text < joint.

All three presets train on this corpus through the REAL Trainer (fused
device preprocessing, donated step, periodic held-out eval).  Data is
generated ON DEVICE by a jitted sampler keyed on the step counter: fresh
i.i.d. batches every step, zero host->device traffic, so the benchmark
also runs at full chip speed.  The learning curves land in
docs/ACCURACY.md.

Run: python experiments/synthetic_accuracy.py [steps_image] [steps_text]
"""

import json
import sys
import time

import numpy as np

P_IMG, P_TXT = 0.35, 0.70
NUM_CLASSES = 15
B = 64
MAX_LEN = 10
TOKENS_PER_CLASS = 4
FILLER = 32
VOCAB = 2 + NUM_CLASSES * TOKENS_PER_CLASS + FILLER
HOST_SIDE = 347
EVAL_BATCHES = 20
EVAL_EVERY = 100


def make_sampler(jnp, jax, side):
    """jitted (rng) -> batch dict with the controlled-noise structure."""
    yy, xx = np.mgrid[0:side, 0:side].astype(np.float32)
    yy, xx = jnp.asarray(yy), jnp.asarray(xx)
    # Per-class grating parameters: distinct orientation + frequency.
    ang = jnp.asarray([c * np.pi / NUM_CLASSES for c in range(NUM_CLASSES)])
    freq = jnp.asarray([0.05 + 0.015 * c for c in range(NUM_CLASSES)])

    @jax.jit
    def sample(rng):
        ks = jax.random.split(rng, 6)
        y = jax.random.randint(ks[0], (B,), 0, NUM_CLASSES)
        flip_i = jax.random.uniform(ks[1], (B,)) < P_IMG
        flip_t = jax.random.uniform(ks[2], (B,)) < P_TXT
        y_img = jnp.where(flip_i, y, jax.random.randint(ks[1], (B,), 0,
                                                        NUM_CLASSES))
        y_txt = jnp.where(flip_t, y, jax.random.randint(ks[2], (B,), 0,
                                                        NUM_CLASSES))
        a, f = ang[y_img], freq[y_img]
        phase = jax.random.uniform(ks[3], (B, 1, 1)) * 2 * np.pi
        wave = jnp.sin((xx[None] * jnp.cos(a)[:, None, None]
                        + yy[None] * jnp.sin(a)[:, None, None])
                       * f[:, None, None] + phase)
        base = 127.0 + 100.0 * wave
        noise = jax.random.uniform(ks[4], (B, side, side, 3), minval=-25,
                                   maxval=25)
        image = jnp.clip(base[..., None] + noise, 0, 255).astype(jnp.uint8)
        # tokens: first 6 slots are class-specific, rest filler; never PAD/OOV.
        cls_tok = (2 + y_txt[:, None] * TOKENS_PER_CLASS
                   + jax.random.randint(ks[5], (B, 6), 0, TOKENS_PER_CLASS))
        fill = 2 + NUM_CLASSES * TOKENS_PER_CLASS + jax.random.randint(
            ks[5], (B, MAX_LEN - 6), 0, FILLER)
        tokens = jnp.concatenate([cls_tok, fill], axis=1).astype(jnp.int32)
        lengths = jnp.full((B,), MAX_LEN, jnp.int32)
        return {"image": image, "tokens": tokens, "lengths": lengths,
                "label": y}
    return sample


def run_preset(name, steps, sampler, jax, extra=()):
    from tumblr_emotions_tpu.config import get_preset
    from tumblr_emotions_tpu.train import Trainer

    cfg = get_preset(name)
    cfg = cfg.replace(
        text=cfg.text.replace(vocab_size=VOCAB, max_len=MAX_LEN,
                              embed_dim=64),
        train=cfg.train.replace(batch_size=B, precision_mode="perf",
                                num_steps=steps, **dict(extra)))
    trainer = Trainer(cfg, preprocess="train" if cfg.model != "text"
                      else None)
    host_sample = {k: np.asarray(v)[:1]
                   for k, v in sampler(jax.random.PRNGKey(7)).items()}
    state = trainer.init_state(jax.random.PRNGKey(1), host_sample)
    trainer.compile()
    rng = jax.random.PRNGKey(2)

    def evaluate(st):
        total, n = 0.0, 0
        for i in range(EVAL_BATCHES):
            eb = sampler(jax.random.fold_in(jax.random.PRNGKey(10_000), i))
            stats = jax.device_get(trainer._compiled_eval(st, eb))
            total += float(stats["correct"])
            n += int(stats["count"])
        return total / max(n, 1)

    curve = []
    t0 = time.perf_counter()
    for step in range(steps):
        batch = sampler(jax.random.fold_in(rng, step))
        state, m = trainer._compiled_train(state, batch, rng)
        if (step + 1) % EVAL_EVERY == 0 or step + 1 == steps:
            acc = evaluate(state)
            curve.append({"step": step + 1, "eval_acc": round(acc, 4),
                          "train_loss": round(float(m["loss"]), 4)})
            print(json.dumps({"model": name, **curve[-1]}), flush=True)
    dt = time.perf_counter() - t0
    return {"preset": name, "steps": steps, "final_eval_acc":
            curve[-1]["eval_acc"], "curve": curve,
            "img_s": round(B * steps / dt, 1)}


def main() -> int:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    steps_img = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    steps_txt = int(sys.argv[2]) if len(sys.argv) > 2 else 600

    sampler = make_sampler(jnp, jax, HOST_SIDE)
    results = []
    # Order: cheapest compile first so failures surface early.
    results.append(run_preset("text_only", steps_txt, sampler, jax))
    results.append(run_preset(
        "image_frozen", steps_img, sampler, jax,
        extra={"optimizer": "rmsprop", "learning_rate": 0.01}))
    results.append(run_preset("joint_finetune", steps_img, sampler, jax,
                              extra={"learning_rate": 1e-3}))
    ordering = (results[1]["final_eval_acc"] < results[0]["final_eval_acc"]
                < results[2]["final_eval_acc"])
    print(json.dumps({
        "bayes_ceilings": {"image": round(P_IMG + (1 - P_IMG) / 15, 3),
                           "text": round(P_TXT + (1 - P_TXT) / 15, 3)},
        "final": {r["preset"]: r["final_eval_acc"] for r in results},
        "paper_ordering_image<text<joint": bool(ordering),
        "detail": results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
