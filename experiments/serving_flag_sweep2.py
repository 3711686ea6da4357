"""Extended serving-engine flag sweep: new candidates on top of the winner.

Round-3 found {vmem64m, scavenge, conv-input-downcast-fusion} -> 10,110
img/s.  This sweep stacks further speculative libtpu knobs on that base;
unknown/rejected flag names fail the remote compile cleanly and are
skipped, so the candidate list can be speculative.

Usage: python experiments/serving_flag_sweep2.py [B] [steps] [rounds]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from tumblr_emotions_tpu.config import get_preset
from tumblr_emotions_tpu.data.preprocessing import preprocess_for_eval
from tumblr_emotions_tpu.train import build_model
from tumblr_emotions_tpu.ops.quant import QuantizedInceptionV3
from tumblr_emotions_tpu.utils.compile_opts import DEFAULT_TPU_COMPILER_OPTIONS

BASE = dict(DEFAULT_TPU_COMPILER_OPTIONS)

EXTRAS = {
    "base": {},
    "dot-dot-fusion": {"xla_tpu_dot_dot_fusion": "true"},
    "dot-dot-dup": {"xla_tpu_dot_dot_fusion_duplicated": "true"},
    "multi-level-nested-loop": {
        "xla_tpu_enable_multi_level_nested_loop_fusion": "true"},
    "licm-inflation": {"xla_tpu_licm_size_inflation_ratio": "2.0"},
    "copy-region-analysis": {
        "xla_tpu_copy_insertion_use_region_analysis": "true"},
    "experimental-fusion-cost": {
        "xla_tpu_use_experimental_fusion_cost_model": "true"},
    "repeated-prefetch": {
        "xla_tpu_use_repeated_instance_for_preferred_prefetch_time": "true"},
    "async-alloc": {"xla_tpu_prefer_async_allocations": "true"},
    "dot-grouping": {"xla_tpu_layout_use_dot_grouping": "true"},
    "order-dot-after-layout": {"xla_tpu_order_dot_after_layout": "true"},
    "reduce-loop-fusion-dup": {
        "xla_tpu_reduce_loop_fusion_dup_with_unfusable_user": "true"},
    "vmem-compute-overlap": {
        "xla_tpu_enable_vmem_compute_overlap": "true"},
    "input-fusion-dup": {
        "xla_tpu_input_fusion_duplication": "true"},
    "broadcast-prio": {
        "xla_tpu_enable_aggressive_broadcast_priority_update": "true"},
    "scheduler-mem-limit": {
        "xla_tpu_scheduler_percent_shared_memory_limit": "90"},
    "rematerialization": {"xla_tpu_rematerialization_percent_shared_memory_limit": "95"},
}


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 768
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    cfg = get_preset("fused_inference")
    model, _ = build_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 299, 299, 3), jnp.bfloat16),
                           train=False)
    rng = np.random.RandomState(0)
    host = [rng.randint(0, 256, size=(b, 347, 347, 3), dtype=np.uint8)
            for _ in range(4)]
    dev = [jax.device_put(h) for h in host]
    calib = preprocess_for_eval(dev[0][:64], dtype=jnp.float32)
    engine = QuantizedInceptionV3(variables, calib, epilogue="shift")

    def body(raw):
        x = preprocess_for_eval(raw, dtype=jnp.bfloat16)
        logits, _ = engine(x)
        return logits.astype(jnp.float32).sum()

    compiled = {}
    results = {k: [] for k in EXTRAS}
    for rnd in range(rounds):
        for name, extra in EXTRAS.items():
            if name not in compiled:
                fn = jax.jit(body, compiler_options={**BASE, **extra})
                try:
                    float(fn(dev[0]))
                except Exception as e:  # noqa: BLE001 — rejected flag = skip
                    print(f"  {name}: REJECTED ({type(e).__name__})",
                          flush=True)
                    compiled[name] = None
                    continue
                compiled[name] = fn
            fn = compiled[name]
            if fn is None:
                continue
            float(fn(dev[0]))  # rewarm
            t0 = time.perf_counter()
            outs = [fn(dev[i % 4]) for i in range(steps)]
            float(jnp.stack(outs).sum())
            r = b * steps / (time.perf_counter() - t0)
            results[name].append(r)
            print(f"  [{rnd}] {name}: {r:.1f} img/s", flush=True)
    print(f"\nB={b}, {steps} steps x {rounds} rounds (median):")
    for name, rs in results.items():
        if not rs:
            continue
        med = sorted(rs)[len(rs) // 2]
        print(f"  {name:26s} {med:8.1f} img/s")


if __name__ == "__main__":
    main()
