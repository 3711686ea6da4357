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
    amb      ~ Bernoulli(P_AMB)                       caption is vague
    image    = class pattern(y_img) + noise  (uint8 [B, 347, 347, 3])
    tokens   = pair tokens(y_txt) if amb and y_txt<14 (ambiguous caption:
               one shared token set per class PAIR {2k, 2k+1})
               else class tokens(y_txt); + filler     (int32 [B, max_len])

**Why the ambiguity channel exists** (round-5 measured negative): with a
single categorical cue per modality, the joint Bayes decision ALWAYS
follows the stronger modality — on disagreement it compares likelihood
ratios (text 61:1 vs image 9:1 here), so "joint > text" is
information-theoretically impossible no matter the model, and the first
run's cold joint hitting exactly the text ceiling (0.7117 = text's own
0.7117 on the same eval keys) was in fact Bayes-OPTIMAL behavior, not a
training failure.  The paper's joint gain exists because real captions
are vague between related emotions and the image disambiguates; the
corpus mirrors that: with prob P_AMB a caption only narrows y_txt to a
class pair, and breaking that tie is exactly what the image's 9:1
evidence CAN do.  ``exact_ceilings()`` enumerates the 15x15x22
observation space: with P_IMG=0.35, P_TXT=0.80, P_AMB=0.35 the Bayes
ceilings are image 39.3% / text ~68.3% / joint ~73.0% — within a point
of the paper's ~36/69/72 rows, with the ordering image < text < joint
now carrying a provable ~4.7-point joint margin.

**The image classes must survive the REAL train-time distortions.**  The
first version of this benchmark used 15 plain gratings (one orientation +
frequency per class) and the image models learned NOTHING (chance-level
eval, round-5 first run): slim's train preprocessing — which the Trainer
really applies — random-flips (aliasing orientation a with pi-a, merging
class pairs), zoom-crops over a 20x area range (destroying absolute
frequency), and color-distorts (destroying intensity cues).  The class
cues here are chosen to be invariant to that whole group:

    angle_idx   = y_img %% 5  -> mirror-symmetric cross-hatch at {a, pi-a},
                  a in {9, 27, 45, 63, 81} deg.  The symmetric PAIR is
                  flip-invariant; angles survive zoom; the 18-deg spacing
                  survives the 0.75-1.33 aspect-ratio shear (which moves
                  an angle by at most ~8 deg).
    pattern_idx = y_img // 5 -> waveform type over the same two
                  components: sin(u)+sin(v) | sign+sign | sin(u)*sin(v)
                  (smooth cross-hatch, hard cross-hatch, checkerboard) —
                  distinctions that are invariant to translation, zoom,
                  and the affine brightness/contrast color ops.

All three presets train on this corpus through the REAL Trainer (fused
device preprocessing, donated step, periodic held-out eval).  Data is
generated ON DEVICE by a jitted sampler keyed on the step counter: fresh
i.i.d. batches every step, zero host->device traffic, so the benchmark
also runs at full chip speed.  The learning curves land in
docs/ACCURACY.md.

Two image rows are reported (caveats recorded in docs/ACCURACY.md):
`image_frozen_probe` runs the preset verbatim — a linear probe over a
RANDOM frozen backbone (the paper warm-starts from the ImageNet slim
checkpoint, which does not exist on disk — SURVEY.md §7a), so its
ceiling is whatever random Inception features linearly encode, not
39.3%.  `image_e2e` fine-tunes the tower end to end — the paper's
image-only row IS a fine-tuned Inception, so the ordering claim uses
this one.  Short-horizon overrides (bn_momentum, adam) are explained in
``run_preset``'s docstring.

Run: python experiments/synthetic_accuracy.py [steps_image] [steps_text]
"""

import json
import sys
import time

import numpy as np

P_IMG, P_TXT, P_AMB = 0.35, 0.80, 0.35
NUM_CLASSES = 15
NUM_PAIRS = NUM_CLASSES // 2        # classes {2k, 2k+1}; class 14 unpaired
B = 64
MAX_LEN = 10
TOKENS_PER_CLASS = 4
FILLER = 32
VOCAB = 2 + (NUM_CLASSES + NUM_PAIRS) * TOKENS_PER_CLASS + FILLER
HOST_SIDE = 347
EVAL_BATCHES = 20
FINAL_EVAL_BATCHES = 120            # 7,680 paired examples, sigma ~0.5%
EVAL_EVERY = 200


def exact_ceilings():
    """Exact Bayes accuracy of each modality via full enumeration.

    Observation space: image evidence u in 15 labels x text evidence ev in
    {singleton 0..14} + {pair 0..6} = 22 symbols.  For each (u, ev) the
    posterior over y is computed exactly; argmax ties split their credit
    (matching what a symmetric learned classifier can achieve on average).
    """
    p_i, q_i = P_IMG + (1 - P_IMG) / 15, (1 - P_IMG) / 15
    p_t, q_t = P_TXT + (1 - P_TXT) / 15, (1 - P_TXT) / 15

    def p_u(u, y):                       # image likelihood
        return p_i if u == y else q_i

    def p_t_draw(t, y):                  # text label draw likelihood
        return p_t if t == y else q_t

    def p_ev(ev, y):                     # text EVIDENCE likelihood
        kind, idx = ev
        if kind == "s":                  # unambiguous singleton {t}
            keep = 1.0 if idx == 14 else (1 - P_AMB)
            return keep * p_t_draw(idx, y)
        a, b = 2 * idx, 2 * idx + 1      # ambiguous pair {2k, 2k+1}
        return P_AMB * (p_t_draw(a, y) + p_t_draw(b, y))

    evs = [("s", t) for t in range(15)] + [("p", k) for k in range(7)]
    img = text = joint = 0.0
    for u in range(15):
        img += (1 / 15) * p_u(u, u)      # image argmax is always u
    for ev in evs:
        lik = np.asarray([p_ev(ev, y) for y in range(15)])
        post = lik / 15
        text += post[np.isclose(lik, lik.max())].sum() / \
            np.isclose(lik, lik.max()).sum()
        for u in range(15):
            jl = lik * np.asarray([p_u(u, y) for y in range(15)])
            jp = np.asarray([(1 / 15) * p_ev(ev, y) * p_u(u, y)
                             for y in range(15)])
            top = np.isclose(jl, jl.max())
            joint += jp[top].sum() / top.sum()
    return {"image": round(img, 4), "text": round(text, 4),
            "joint": round(joint, 4)}


def make_sampler(jnp, jax, side):
    """jitted (rng) -> batch dict with the controlled-noise structure."""
    yy, xx = np.mgrid[0:side, 0:side].astype(np.float32)
    yy, xx = jnp.asarray(yy), jnp.asarray(xx)
    # Per-class image cue = (mirror-symmetric angle pair, waveform type);
    # invariant to the train-time flip/zoom-crop/color group (docstring).
    angs = np.asarray([9, 27, 45, 63, 81], np.float32) * np.pi / 180.0
    ang_a = jnp.asarray(angs[np.arange(NUM_CLASSES) % 5])

    @jax.jit
    def sample(rng):
        ks = jax.random.split(rng, 11)
        y = jax.random.randint(ks[0], (B,), 0, NUM_CLASSES)
        flip_i = jax.random.uniform(ks[1], (B,)) < P_IMG
        flip_t = jax.random.uniform(ks[2], (B,)) < P_TXT
        # Independent keys for the keep-draw and the replacement label —
        # reusing one key correlates them and shifts the Bayes ceilings.
        y_img = jnp.where(flip_i, y, jax.random.randint(ks[7], (B,), 0,
                                                        NUM_CLASSES))
        y_txt = jnp.where(flip_t, y, jax.random.randint(ks[8], (B,), 0,
                                                        NUM_CLASSES))
        a = ang_a[y_img][:, None, None]
        pat = (y_img // 5)[:, None, None]
        freq = 0.3  # rad/px -> ~21px wavelength: the tightest train crop
        # (area 0.05 -> 3.8x magnification after the 299px resize) still
        # shows ~3.7 periods, and the full-image 347->299 downsample keeps
        # the wavelength at ~18px, far above the resize Nyquist limit.
        phase_u = jax.random.uniform(ks[3], (B, 1, 1)) * 2 * np.pi
        phase_v = jax.random.uniform(ks[6], (B, 1, 1)) * 2 * np.pi
        # The two mirror components u (angle a) and v (angle pi-a): a
        # horizontal flip maps u->v, so any symmetric combination of the
        # pair is flip-invariant.
        u = (xx[None] * jnp.cos(a) + yy[None] * jnp.sin(a)) * freq + phase_u
        v = (-xx[None] * jnp.cos(a) + yy[None] * jnp.sin(a)) * freq + phase_v
        su, sv = jnp.sin(u), jnp.sin(v)
        wave = jnp.where(pat == 0, 0.5 * (su + sv),
                         jnp.where(pat == 1, 0.5 * (jnp.sign(su)
                                                    + jnp.sign(sv)),
                                   su * sv))
        base = 127.0 + 100.0 * wave
        noise = jax.random.uniform(ks[4], (B, side, side, 3), minval=-25,
                                   maxval=25)
        image = jnp.clip(base[..., None] + noise, 0, 255).astype(jnp.uint8)
        # tokens: first 6 slots carry the text evidence, rest filler; never
        # PAD/OOV.  An ambiguous caption (prob P_AMB, paired classes only)
        # draws from the PAIR's shared token set — the text model can only
        # recover the pair {2k, 2k+1}, and the image must break the tie.
        amb = ((jax.random.uniform(ks[10], (B,)) < P_AMB)
               & (y_txt < 2 * NUM_PAIRS))
        base = jnp.where(amb,
                         (NUM_CLASSES + y_txt // 2) * TOKENS_PER_CLASS,
                         y_txt * TOKENS_PER_CLASS)
        cls_tok = (2 + base[:, None]
                   + jax.random.randint(ks[5], (B, 6), 0, TOKENS_PER_CLASS))
        fill = (2 + (NUM_CLASSES + NUM_PAIRS) * TOKENS_PER_CLASS
                + jax.random.randint(ks[9], (B, MAX_LEN - 6), 0, FILLER))
        tokens = jnp.concatenate([cls_tok, fill], axis=1).astype(jnp.int32)
        lengths = jnp.full((B,), MAX_LEN, jnp.int32)
        return {"image": image, "tokens": tokens, "lengths": lengths,
                "label": y}
    return sample


def run_preset(name, steps, sampler, jax, extra=(), tag=None,
               bn_momentum=0.99, warm_tower=None):
    """Train ``name``'s preset on the synthetic corpus; returns the curve.

    Two deliberate overrides for this short-horizon benchmark (recorded in
    docs/ACCURACY.md):

    - ``bn_momentum=0.99`` instead of slim's 0.9997: the reference's BN
      time constant assumes 20k+-step schedules — after 3k steps the
      moving stats would still sit ~40% at their init values
      (0.9997^3000 = 0.41) and eval accuracy would read chance no matter
      what the tower learned.  Same model, same loss; only the moving-
      average horizon is adapted to the schedule.
    - adam instead of slim rmsprop(eps=1.0) where ``extra`` says so: with
      eps=1.0 the update is ~lr*g for small gradients, i.e. plain SGD at
      1e-4 — another 20k-step assumption (measured: joint stays at chance
      for 300 steps; docs/ACCURACY.md).

    ``warm_tower=(params, batch_stats)`` grafts a trained Inception tower
    into the model before training, with slim's warm-start name filter —
    everything under InceptionV3/ EXCEPT the Logits and AuxLogits scopes
    (SURVEY.md §3.2: ``slim.get_variables_to_restore(exclude=[...])``).
    This is the synthetic analog of the paper's ImageNet warm start: the
    joint model trained from scratch converges onto the text branch (its
    eval pins to the text ceiling — measured on the round-5 first-run
    corpus, docs/ACCURACY.md) because a cold conv tower earns its
    tie-breaking margin far slower than the embedding branch earns the
    text ceiling.
    """
    from tumblr_emotions_tpu.config import get_preset
    from tumblr_emotions_tpu.train import Trainer

    cfg = get_preset(name)
    cfg = cfg.replace(
        image=cfg.image.replace(bn_momentum=bn_momentum),
        text=cfg.text.replace(vocab_size=VOCAB, max_len=MAX_LEN,
                              embed_dim=64),
        train=cfg.train.replace(batch_size=B, precision_mode="perf",
                                num_steps=steps, **dict(extra)))
    tag = tag or name
    trainer = Trainer(cfg, preprocess="train" if cfg.model != "text"
                      else None)
    host_sample = {k: np.asarray(v)[:1]
                   for k, v in sampler(jax.random.PRNGKey(7)).items()}
    state = trainer.init_state(jax.random.PRNGKey(1), host_sample)
    if warm_tower is not None:
        wp, wb = warm_tower
        params, stats = dict(state.params), dict(state.batch_stats)
        tgt_p = dict(params["InceptionV3"]) if "InceptionV3" in params \
            else params
        tgt_b = dict(stats["InceptionV3"]) if "InceptionV3" in stats \
            else stats
        for k, v in wp.items():
            if k not in ("Logits", "AuxLogits"):
                tgt_p[k] = v
        for k, v in wb.items():
            if k not in ("Logits", "AuxLogits"):
                tgt_b[k] = v
        if "InceptionV3" in params:
            params["InceptionV3"], stats["InceptionV3"] = tgt_p, tgt_b
        else:
            params, stats = tgt_p, tgt_b
        state = state.replace(params=params, batch_stats=stats)
    trainer.compile()
    rng = jax.random.PRNGKey(2)

    def evaluate(st, n_batches=EVAL_BATCHES):
        # Fixed eval keys shared by every model -> paired comparisons.
        total, n = 0.0, 0
        for i in range(n_batches):
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
                          "train_loss": round(float(m["loss"]), 4),
                          "train_acc": round(float(m["accuracy"]), 4)})
            print(json.dumps({"model": tag, **curve[-1]}), flush=True)
    dt = time.perf_counter() - t0
    # Headline number: one WIDE paired eval (120 batches = 7,680 examples,
    # binomial sigma ~0.5%) on the shared fixed eval keys — the 20-batch
    # curve evals have ~1.2% sigma, too loose to resolve the ~4.7-point
    # text-vs-joint Bayes gap cleanly.
    wide = evaluate(state, n_batches=FINAL_EVAL_BATCHES)
    return {"preset": name, "tag": tag, "steps": steps,
            "final_eval_acc": round(wide, 4),
            "final_eval_examples": FINAL_EVAL_BATCHES * B,
            "curve": curve, "img_s": round(B * steps / dt, 1)}, state


def main() -> int:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    steps_img = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    steps_txt = int(sys.argv[2]) if len(sys.argv) > 2 else 600

    sampler = make_sampler(jnp, jax, HOST_SIDE)
    results = {}
    # Order: cheapest compile first so failures surface early.
    results["text"], _ = run_preset("text_only", steps_txt, sampler, jax)
    # Linear probe over the RANDOM frozen backbone (the preset verbatim;
    # caveat in the module docstring — its ceiling is whatever random
    # Inception features encode, not 39.3%).
    results["image_probe"], _ = run_preset(
        "image_frozen", min(steps_img, 1500), sampler, jax,
        extra={"optimizer": "adam", "learning_rate": 1e-3},
        tag="image_frozen_probe")
    # End-to-end image fine-tune — the paper's image-only row IS a
    # fine-tuned Inception, so this is the number the ordering claim uses.
    results["image"], image_state = run_preset(
        "image_frozen", steps_img, sampler, jax,
        extra={"optimizer": "adam", "learning_rate": 3e-4,
               "trainable_scopes": ""},
        tag="image_e2e")
    # Joint, warm-started from the trained image tower with slim's
    # exclude-Logits/AuxLogits filter (SURVEY.md §3.2) — the synthetic
    # analog of the paper's ImageNet warm start.  Cold-start joint
    # (round-5 first run, pre-ambiguity corpus) pinned to the text
    # ceiling: 0.7117 text vs 0.7117 joint peak / 0.70 final on the same
    # eval keys — a cold conv tower earns its tie-breaking margin far
    # slower than the embedding branch earns the text ceiling.
    tower_p = jax.device_get(image_state.params)
    tower_b = jax.device_get(image_state.batch_stats)
    results["joint"], joint_state = run_preset(
        "joint_finetune", steps_img, sampler, jax,
        extra={"optimizer": "adam", "learning_rate": 3e-4,
               "lr_decay_steps": 1500, "lr_decay_factor": 0.5},
        warm_tower=(tower_p, tower_b))
    del joint_state
    ordering = (results["image"]["final_eval_acc"]
                < results["text"]["final_eval_acc"]
                < results["joint"]["final_eval_acc"])

    # int8 delta on TRAINED weights (VERDICT r4 weak #3): the shipped
    # serving config (shift epilogue, stem_s2d="pre") vs the bf16 engine,
    # on the trained IMAGE tower + a representative synthetic batch.  The
    # image-only state is the right subject: its Logits head is trained.
    # (A joint tower's own Logits head receives no gradient — the joint
    # softmax lives in JointLogits — so its logits stay near-constant and
    # argmax agreement over them is tie-dominated noise: measured 0.547
    # agreement at 0.0 prob delta on the round-5 cold-start run.)
    from tumblr_emotions_tpu.data.preprocessing import preprocess_for_eval
    from tumblr_emotions_tpu.ops.quant import quantization_delta

    tower = {"params": tower_p, "batch_stats": tower_b}
    eval_imgs = preprocess_for_eval(
        sampler(jax.random.PRNGKey(77))["image"], dtype=jnp.float32)
    delta = quantization_delta(tower, eval_imgs, epilogue="shift",
                               stem_s2d="pre")

    print(json.dumps({
        "bayes_ceilings": exact_ceilings(),
        "final": {r["tag"]: r["final_eval_acc"] for r in results.values()},
        "paper_ordering_image<text<joint": bool(ordering),
        "trained_tower_quantization_delta": delta,
        "detail": list(results.values())}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
