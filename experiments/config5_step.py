"""Real-chip wall-clock + HBM high-water for the config-5 per-chip share.

`tests/test_config5_preset.py` proves the REAL ``data_parallel`` preset
(joint, full width, global B=1024, perf mode) compiles sharded over the
8-virtual-device mesh — shape/layout regressions are caught there.  This
experiment supplies the other half that a compile can't: on the ONE real
v5e chip, run the exact per-chip share of that program — the same
Trainer/preset, B = 1024/8 = 128, fused train preprocessing from host
uint8, aux+L2 loss, bwd, rmsprop, BN stats — and record ms/step plus the
device's peak HBM so a future change that regresses either is visible in
the PERFORMANCE.md round-5 ledger.  (The DP all-reduce this omits moves
~95 MB of f32 grads over ICI per step — sub-ms at v5e ICI bandwidth,
negligible against the measured step time.)

Data is generated on device once (fixed batch, realistic uint8/token
ranges); the timed loop re-feeds it so the measurement is pure step time,
matching how bench.py isolates device rate from this 1-core host's feed.

Run: python experiments/config5_step.py [steps]
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

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    cfg = get_preset("data_parallel")
    assert cfg.model == "joint" and cfg.train.precision_mode == "perf"
    n_pod = 8  # v5e-8: the slice BASELINE.json's config 5 names
    per_chip = cfg.train.batch_size // n_pod
    cfg = cfg.replace(train=cfg.train.replace(batch_size=per_chip))

    dev = jax.devices()[0]
    rng = np.random.RandomState(0)
    host = {
        "image": rng.randint(0, 256, (per_chip, 347, 347, 3)).astype(np.uint8),
        "tokens": rng.randint(2, cfg.text.vocab_size,
                              (per_chip, cfg.text.max_len)).astype(np.int32),
        "lengths": rng.randint(1, cfg.text.max_len,
                               (per_chip,)).astype(np.int32),
        "label": rng.randint(0, 15, (per_chip,)).astype(np.int32),
    }
    trainer = Trainer(cfg, preprocess="train")
    state = trainer.init_state(jax.random.PRNGKey(0), host)
    trainer.compile()
    batch = {k: jax.device_put(v, dev) for k, v in host.items()}
    key = jax.random.PRNGKey(1)

    # warm up / compile outside the timed windows
    for _ in range(3):
        state, m = trainer._compiled_train(state, batch, key)
    float(m["loss"])

    windows = []
    per_window = max(steps // 5, 1)
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(per_window):
            state, m = trainer._compiled_train(state, batch, key)
        float(m["loss"])  # block
        dt = time.perf_counter() - t0
        windows.append(dt / per_window * 1e3)

    # Runtime memory_stats() is unavailable over this sandbox's tunneled
    # device plugin (returns {}), so report the XLA-compiled memory
    # analysis instead: temp (activations/workspace) + args + outputs is
    # the program's HBM high-water, the number a pod deployment sizes to.
    hbm = {}
    stats = dev.memory_stats() or {}
    if stats.get("peak_bytes_in_use"):
        hbm["runtime_peak_gib"] = round(stats["peak_bytes_in_use"] / 2**30, 3)
    try:
        import jax as _jax
        ma = (_jax.jit(trainer.train_step, donate_argnums=(0,))
              .lower(state, batch, key).compile().memory_analysis())
        hbm["compiled_temp_gib"] = round(ma.temp_size_in_bytes / 2**30, 3)
        hbm["compiled_args_out_gib"] = round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             - ma.alias_size_in_bytes) / 2**30, 3)
        hbm["compiled_code_mib"] = round(
            ma.generated_code_size_in_bytes / 2**20, 1)
    except Exception as e:  # noqa: BLE001 — backend-dependent API
        hbm["memory_analysis_error"] = str(e)[:120]
    out = {
        "preset": "data_parallel",
        "global_batch": per_chip * n_pod,
        "per_chip_batch": per_chip,
        "ms_per_step": round(float(np.median(windows)), 2),
        "window_spread_pct": round(
            100.0 * (max(windows) - min(windows)) / np.median(windows), 2),
        "img_s_per_chip": round(per_chip / (np.median(windows) / 1e3), 1),
        "hbm": hbm,
        "loss_finite": bool(np.isfinite(float(m["loss"]))),
    }
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
