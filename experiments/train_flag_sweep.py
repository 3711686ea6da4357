"""Post-preprocess-fix train-step compiler-flag sweep (round 3, cont.).

The earlier train-step sweep (docs/PERFORMANCE.md) ran while the fused
train preprocessing was gather-bound (2,150 ms of a 2,305 ms step), so
conv-path flags could not move the total.  With preprocessing now on the
MXU (7 ms) the backward conv tower dominates again — re-measure.

Usage: python experiments/train_flag_sweep.py [B] [steps] [rounds]
       python experiments/train_flag_sweep.py --batches  # batch-size sweep

Interleaved rounds (A,B,C,...,A,B,C,...) with a median-per-candidate
reduction, host readback of the loss ending every timed window (the
remote-TPU runtime's block_until_ready is not synchronous).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tumblr_emotions_tpu.config import get_preset
from tumblr_emotions_tpu.train.trainer import Trainer

VOCAB, MAXLEN = 5000, 50

CANDIDATES = {
    "plain": {},
    # vmem32 measured once at 646.7 img/s vs plain 1,612.8 (big loss) —
    # dropped from the ladder to save a slow-session compile.
    "vmem48": {"xla_tpu_scoped_vmem_limit_kib": "49152"},
    "vmem64": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem64+scav": {"xla_tpu_scoped_vmem_limit_kib": "65536",
                    "xla_tpu_scavenge_vmem_for_fusions": "true"},
    "downcast": {
        "xla_tpu_allow_conv_input_fusion_with_downcast_convert": "true"},
    "serving-set": {
        "xla_tpu_scoped_vmem_limit_kib": "65536",
        "xla_tpu_scavenge_vmem_for_fusions": "true",
        "xla_tpu_allow_conv_input_fusion_with_downcast_convert": "true"},
    "vmem48+downcast": {
        "xla_tpu_scoped_vmem_limit_kib": "49152",
        "xla_tpu_allow_conv_input_fusion_with_downcast_convert": "true"},
}


def make_batch(rng, b):
    return {
        "image": rng.randint(0, 256, size=(b, 347, 347, 3), dtype=np.uint8),
        "tokens": rng.randint(0, VOCAB, size=(b, MAXLEN)).astype(np.int32),
        "lengths": rng.randint(1, MAXLEN, size=(b,)).astype(np.int32),
        "label": rng.randint(0, 15, size=(b,)).astype(np.int32),
    }


def build(b):
    cfg = get_preset("joint_finetune")
    cfg = cfg.replace(
        train=cfg.train.replace(batch_size=b, precision_mode="perf"),
        text=cfg.text.replace(vocab_size=VOCAB, max_len=MAXLEN))
    trainer = Trainer(cfg, preprocess="train")
    rng = np.random.RandomState(0)
    batch = make_batch(rng, b)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    return trainer, state, {k: jax.device_put(v) for k, v in batch.items()}


_COMPILED = {}


def measure(trainer, state0, batch, opts, b, steps):
    key = tuple(sorted(opts.items()))  # cache across rounds: one compile
    if key not in _COMPILED:           # per candidate, not per round
        _COMPILED[key] = (
            jax.jit(trainer.train_step, compiler_options=dict(opts))
            if opts else jax.jit(trainer.train_step))
    step = _COMPILED[key]
    rng = jax.random.PRNGKey(1)
    state, m = step(state0, batch, rng)  # compile + warmup (no donation:
    float(m["loss"])                     # state0 is reused per candidate)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, batch, rng)
    float(m["loss"])
    return b * steps / (time.perf_counter() - t0)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    b = int(args[0]) if args else 256
    steps = int(args[1]) if len(args) > 1 else 12
    rounds = int(args[2]) if len(args) > 2 else 3

    if "--batches" in sys.argv:
        for bb in (128, 256, 384, 512):
            _COMPILED.clear()  # shapes changed; old executables are stale
            trainer, state, batch = build(bb)
            try:
                r = measure(trainer, state, batch,
                            CANDIDATES["vmem64"], bb, steps)
            except Exception as e:  # noqa: BLE001 — OOM at large B is data
                print(f"B={bb}: FAILED {type(e).__name__}: {e}")
                continue
            print(f"B={bb}: vmem64 {r:.1f} img/s", flush=True)
        return

    trainer, state, batch = build(b)
    results = {k: [] for k in CANDIDATES}
    for rnd in range(rounds):
        for name, opts in CANDIDATES.items():
            try:
                r = results[name]
                r.append(measure(trainer, state, batch, opts, b, steps))
            except Exception as e:  # noqa: BLE001 — rejected flags are data
                results[name].append(float("nan"))
                print(f"  [{rnd}] {name}: FAILED {type(e).__name__}")
                continue
            print(f"  [{rnd}] {name}: {results[name][-1]:.1f} img/s",
                  flush=True)
    print(f"\nB={b}, {steps} steps x {rounds} rounds (median):")
    for name, rs in results.items():
        good = sorted(x for x in rs if x == x)
        med = good[len(good) // 2] if good else float("nan")
        print(f"  {name:18s} {med:8.1f} img/s")


if __name__ == "__main__":
    main()
