"""Round-5 front A/B: measure the SHIPPED serving program per front.

VERDICT r4 weak #1 / next-step #1: round 4's headline (10,162 img/s) was
measured on bench.py's program (s2d preprocess + stem_s2d="pre"), but
ops/serving.build_forward shipped the uint8 int8-GEMM front — the product
and the benchmark had diverged.  Round 5 plumbs a ``front`` knob through
build_forward (default "s2d"); this experiment measures the *actual
served program* — ``ops.serving.data_parallel_server`` over a single-chip
mesh, returning (probs, feature) like production, not bench.py's
scalar-sum body — for all three fronts, interleaved so session drift
cancels:

    s2d:   preprocess_for_eval_s2d (bf16) + stem_s2d="pre" engine
    float: preprocess_for_eval (bf16)     + normal-layout engine
    uint8: forward_from_uint8 (all-int8 front, no float image in HBM)

Run on the real chip (kill any other TPU client first):
    python experiments/serving_front_ab.py [steps] [batch]

Results land in docs/PERFORMANCE.md (round-5 section).
"""

import json
import sys
import time


def main() -> int:
    import jax

    sys.path.insert(0, ".")
    import bench
    from tumblr_emotions_tpu.config import get_preset
    from tumblr_emotions_tpu.ops.quant import QuantizedInceptionV3
    from tumblr_emotions_tpu.ops.serving import data_parallel_server
    from tumblr_emotions_tpu.parallel import create_mesh
    from tumblr_emotions_tpu.train import build_model

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    src = 347

    cfg = get_preset("fused_inference")
    model, _ = build_model(cfg)
    t0 = time.perf_counter()
    variables, dev_batches, calib = bench._setup_on_device(model, batch, src)
    print(f"# setup {time.perf_counter() - t0:.0f}s", flush=True)
    base = QuantizedInceptionV3(variables, calib, epilogue="shift")
    s2d = QuantizedInceptionV3(variables, calib, epilogue="shift",
                               stem_s2d="pre")
    print(f"# calib {time.perf_counter() - t0:.0f}s", flush=True)

    mesh = create_mesh(devices=jax.devices()[:1])
    servers = {
        "s2d": data_parallel_server(s2d, mesh),
        "float": data_parallel_server(base, mesh),
        "uint8": data_parallel_server(base, mesh, from_uint8=True),
    }

    def measure(server):
        # bench._measure's readback discipline: through the remote-TPU
        # tunnel only a host readback proves execution finished; device
        # execution is serial per stream, so one scalar off the LAST
        # step's probs proves every step ran.
        probs, _ = server(dev_batches[0])  # warmup / compile
        float(probs.sum())
        rates = []
        for _ in range(5):
            t = time.perf_counter()
            out = None
            for i in range(steps):
                out = server(dev_batches[i % len(dev_batches)])
            float(out[0].sum())
            rates.append(batch * steps / (time.perf_counter() - t))
        return sorted(rates)[2]

    # Interleave rounds so service drift hits every front equally.
    acc = {k: [] for k in servers}
    for rnd in range(3):
        for k, server in servers.items():
            acc[k].append(measure(server))
            print(json.dumps({"round": rnd, "front": k,
                              "img_s": round(acc[k][-1], 1)}), flush=True)
    summary = {k: round(sorted(v)[len(v) // 2], 1) for k, v in acc.items()}
    best = max(summary, key=summary.get)
    print(json.dumps({"median": summary, "winner": best,
                      "batch": batch, "steps": steps}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
