"""Train-step performance ledger to serving's standard (VERDICT r3 #5).

Per-stage decomposition of the joint fine-tune step (B=256, perf mode,
fused train preprocessing, vmem64 flags) by measuring nested prefixes of
the step as separate programs on device-resident data:

    pp        : preprocess_for_train alone
    fwd       : forward + loss (no grad)
    fwd_bwd   : value_and_grad (no optimizer/BN commit)
    full      : the production train_step (donated state)

differences give preprocess / forward / backward / optimizer+commit.
Speed-of-light context: the int8 serving forward runs ~10.1k img/s and a
bf16 fwd-only pass ~5.7k (BN-folded engine); a naive fwd+2x-bwd model
puts the full step's ceiling around ~2.5-3.3k img/s.

Levers measured on top (each one compile):
    remat_dots  : jax.checkpoint(loss, policy=checkpoint_dots) — trade
                  HBM activation traffic for recompute in the backward
    remat_full  : jax.checkpoint(loss) — recompute everything
    bf16_batch  : keep the preprocessed image in bf16 into the tower
                  (default already computes in bf16; this drops the f32
                  image materialization between preprocess and stem)

Run on the real chip: python experiments/train_profile.py [B] [steps]
"""

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from tumblr_emotions_tpu.config import get_preset
    from tumblr_emotions_tpu.train import Trainer
    from tumblr_emotions_tpu.utils.compile_opts import (
        tpu_jit, train_default_options)

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    src = 347

    cfg = get_preset("joint_finetune")
    cfg = cfg.replace(train=cfg.train.replace(batch_size=B,
                                              precision_mode="perf"))
    trainer = Trainer(cfg, preprocess="train")
    opts = train_default_options()

    @jax.jit
    def setup(key):
        ki, kt, kl = jax.random.split(key, 3)
        batch = {
            "image": jax.random.randint(ki, (B, src, src, 3), 0, 256,
                                        dtype=jnp.uint8),
            "tokens": jax.random.randint(kt, (B, cfg.text.max_len), 1, 1000,
                                         dtype=jnp.int32),
            "lengths": jnp.full((B,), cfg.text.max_len, jnp.int32),
            "label": jax.random.randint(kl, (B,), 0, 15, dtype=jnp.int32),
        }
        return batch

    batch = setup(jax.random.PRNGKey(0))
    host_sample = {k: np.asarray(v[:1]) for k, v in batch.items()}
    state = trainer.init_state(jax.random.PRNGKey(1), host_sample)
    rng = jax.random.PRNGKey(2)

    def window(fn, *args, donate_state=False):
        out = fn(*args)
        jax.tree_util.tree_leaves(out)
        # warmup done by caller loop; measure median of 3 windows
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            o = None
            for _ in range(steps):
                o = fn(*args)
            leaf = jax.tree_util.tree_leaves(o)[0]
            float(jnp.ravel(leaf.astype(jnp.float32) if hasattr(leaf, "astype")
                            else leaf)[0])
            rates.append(B * steps / (time.perf_counter() - t0))
        return sorted(rates)[1]

    results = {}

    # -- pp: fused train preprocess alone --------------------------------
    from tumblr_emotions_tpu.data import preprocessing as pp

    def pp_only(raw, r):
        x = pp.preprocess_for_train(r, raw, cfg.image.image_size,
                                    cfg.image.image_size,
                                    resize_method=cfg.data.resize_method)
        return x.astype(jnp.float32).sum()

    f_pp = tpu_jit(pp_only, compiler_options=opts)
    results["pp"] = window(f_pp, batch["image"], rng)
    print(json.dumps({"stage": "preprocess", "img_s": round(results['pp'], 1)}),
          flush=True)

    # -- fwd: forward + loss (no grad), preprocess included --------------
    def fwd(params, stats, b, r):
        r1, r2 = jax.random.split(r)
        b2 = trainer._maybe_preprocess(b, True, r1)
        loss, _ = trainer._loss_fn(params, stats, b2, r2, True)
        return loss

    f_fwd = tpu_jit(fwd, compiler_options=opts)
    results["fwd"] = window(f_fwd, state.params, state.batch_stats, batch, rng)
    print(json.dumps({"stage": "pp+forward+loss",
                      "img_s": round(results['fwd'], 1)}), flush=True)

    # -- fwd+bwd: value_and_grad, no optimizer ---------------------------
    def fwd_bwd(params, stats, b, r):
        r1, r2 = jax.random.split(r)
        b2 = trainer._maybe_preprocess(b, True, r1)
        (loss, _), grads = jax.value_and_grad(
            lambda p: trainer._loss_fn(p, stats, b2, r2, True),
            has_aux=True)(params)
        gsum = sum(jnp.sum(jnp.abs(g.astype(jnp.float32)))
                   for g in jax.tree_util.tree_leaves(grads))
        return loss + gsum * 0.0

    f_fb = tpu_jit(fwd_bwd, compiler_options=opts)
    results["fwd_bwd"] = window(f_fb, state.params, state.batch_stats,
                                batch, rng)
    print(json.dumps({"stage": "pp+fwd+bwd",
                      "img_s": round(results['fwd_bwd'], 1)}), flush=True)

    # -- full production step (donated) ----------------------------------
    trainer.compile()
    st = state
    f_full = trainer._compiled_train
    st, m = f_full(st, batch, rng)  # warmup/compile
    rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(steps):
            st, m = f_full(st, batch, rng)
        float(m["loss"])
        rates.append(B * steps / (time.perf_counter() - t0))
    results["full"] = sorted(rates)[1]
    print(json.dumps({"stage": "full step (donated)",
                      "img_s": round(results['full'], 1)}), flush=True)

    # Derived per-stage shares.
    ms = {k: B / v * 1000.0 for k, v in results.items()}
    print(json.dumps({
        "ms_per_step": {k: round(v, 1) for k, v in ms.items()},
        "derived_ms": {
            "preprocess": round(ms["pp"], 1),
            "forward+loss": round(ms["fwd"] - ms["pp"], 1),
            "backward": round(ms["fwd_bwd"] - ms["fwd"], 1),
            "optimizer+commit": round(ms["full"] - ms["fwd_bwd"], 1),
        }}), flush=True)

    # -- levers ------------------------------------------------------------
    import optax
    from tumblr_emotions_tpu.train.trainer import TrainState

    def make_step(loss_wrap):
        def step(stt, b, r):
            r1, r2 = jax.random.split(jax.random.fold_in(r, stt.step))
            b2 = trainer._maybe_preprocess(b, True, r1)

            def loss_fn(p):
                return loss_wrap(
                    lambda q: trainer._loss_fn(q, stt.batch_stats, b2, r2,
                                               True))(p)

            (loss, (logits, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(stt.params)
            updates, new_opt = trainer.tx.update(grads, stt.opt_state,
                                                 stt.params)
            new_params = optax.apply_updates(stt.params, updates)
            return TrainState(step=stt.step + 1, params=new_params,
                              batch_stats=new_stats, opt_state=new_opt), loss
        return step

    levers = {
        "remat_dots": lambda f: jax.checkpoint(
            f, policy=jax.checkpoint_policies.checkpoint_dots),
        "remat_full": lambda f: jax.checkpoint(f),
    }
    for name, wrap in levers.items():
        try:
            f = tpu_jit(make_step(wrap), compiler_options=opts,
                        donate_argnums=(0,))
            st2 = trainer.init_state(jax.random.PRNGKey(1), host_sample)
            st2, loss = f(st2, batch, rng)
            rates = []
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(steps):
                    st2, loss = f(st2, batch, rng)
                float(loss)
                rates.append(B * steps / (time.perf_counter() - t0))
            r = sorted(rates)[1]
        except Exception as e:  # noqa: BLE001
            r = None
            print(json.dumps({"lever": name, "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)
        if r is not None:
            print(json.dumps({"lever": name, "img_s": round(r, 1),
                              "vs_full": round(r / results["full"], 3)}),
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
