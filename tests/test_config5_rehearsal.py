"""Config-5 integration rehearsal (SURVEY.md §7 step 7, VERDICT r3 #4).

The WHOLE production path, jointly, at synthetic-moderate scale, through
the REAL CLI in subprocesses:

    synthetic JPEG corpus -> sharded TFRecords -> grain pipeline
    -> C++ batch decode (thread pool) -> device-prefetched feed
    -> data-parallel joint train step on an 8-device mesh
    -> periodic checkpoints + in-train eval
    -> SIGKILL mid-run -> restart -> exact-record resume
    -> final params EQUAL to an uninterrupted control run.

Params equality between the killed+resumed run and the control run is the
gold assertion: it holds only if (a) the checkpoint restored exactly,
(b) the input stream resumed at the exact record (per-step iterator
state, through the prefetch wrapper's consumed-position tracking), and
(c) every downstream piece (preprocess rng folding, optimizer state,
BN stats) is step-deterministic.

grain subprocess workers are byte-identical-tested in test_pipeline; this
1-core VM runs worker_count=0 here because subprocess prefetch with no
spare cores is pure overhead (measured, docs/PERFORMANCE.md) and would
only slow the rehearsal without changing coverage.
"""

import io
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-minute CPU compiles, 3 train runs

N_RECORDS = 2000
BATCH = 16
STEPS = 50
CKPT_EVERY = 10


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Synthetic labeled JPEG corpus in sharded TFRecords."""
    from PIL import Image

    from tumblr_emotions_tpu.data import records

    d = tmp_path_factory.mktemp("c5corpus")
    rng = np.random.RandomState(0)
    exs = []
    for i in range(N_RECORDS):
        label = i % 15
        # Class-dependent gratings so training has real signal.
        yy, xx = np.mgrid[0:96, 0:96]
        img = (127 + 120 * np.sin((xx + yy * (label % 4)) / (2 + label % 5))
               ).astype(np.uint8)
        img = np.stack([img, np.roll(img, label, 0), img.T], -1)
        img = np.clip(img + rng.randint(-20, 20, img.shape), 0, 255
                      ).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=85)
        exs.append(records.post_to_example(
            buf.getvalue(), f"synthetic post {i} about emotion {label}",
            label, post_id=str(i)))
    records.write_sharded_tfrecords(exs, str(d), "train", 4)
    records.write_sharded_tfrecords(exs[:300], str(d), "validation", 1)
    return str(d)


def _vocab(corpus, tmp_path_factory):
    from tumblr_emotions_tpu.data.vocab import build_vocabulary

    v = build_vocabulary(
        [f"synthetic post {i} about emotion {i % 15}"
         for i in range(N_RECORDS)], min_freq=1)
    d = tmp_path_factory.mktemp("c5vocab")
    path = os.path.join(d, "vocab.txt")
    v.save(path)
    return path


def _train_argv(corpus, vocab_path, ckpt_dir, log_dir):
    return [
        sys.executable, "-m", "tumblr_emotions_tpu.cli", "train",
        "--preset", "joint_finetune",
        "--records", os.path.join(corpus, "train-*.tfrecord"),
        "--eval-records", os.path.join(corpus, "validation-*.tfrecord"),
        "--vocab", vocab_path,
        "--checkpoint-dir", ckpt_dir,
        "--batch-size", str(BATCH), "--steps", str(STEPS),
        "--checkpoint-every", str(CKPT_EVERY), "--log-every", "5",
        "--image-size", "75", "--depth-multiplier", "0.25", "--no-aux",
        "--max-len", "10", "--seed", "3", "--precision", "parity",
        # Pinned ON (the shipped default is 0, round-5 A/B): this test is
        # the coverage for resume-through-the-prefetch-wrapper, so it must
        # keep exercising the consumed-position path.
        "--prefetch-depth", "2",
    ]


def _env(log_dir):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["TET_LOG_DIR"] = log_dir  # unused; kept for debugging
    # Pure-CPU children must not register the axon TPU plugin: with the
    # parent pytest process also registered, the child's compiles detour
    # through the remote service and crawl (measured: >15 min vs ~2 min
    # for the identical command standalone; main thread parked in
    # tcp_recvmsg).  The sandbox's sitecustomize only registers when
    # PALLAS_AXON_POOL_IPS is set, so dropping it gives a clean local
    # CPU child.
    for var in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE",
                "PALLAS_AXON_TPU_GEN", "AXON_LOOPBACK_RELAY"):
        env.pop(var, None)
    return env


def _load_final_params(ckpt_dir, step):
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(ckpt_dir) as mgr:
        assert mgr.latest_step() == step, (mgr.all_steps(), step)
        tree = mgr.restore(step)
    return tree["params"], tree


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def test_kill_resume_matches_uninterrupted_run(corpus, tmp_path_factory,
                                               tmp_path):
    vocab_path = _vocab(corpus, tmp_path_factory)
    log = tmp_path / "runs"
    log.mkdir()

    # --- run A: train, SIGKILL after the first checkpoint lands ---------
    ckpt_a = str(tmp_path / "ckpt_a")
    log_a = open(tmp_path / "run_a.log", "wb")
    proc = subprocess.Popen(
        _train_argv(corpus, vocab_path, ckpt_a, str(log)),
        env=_env(str(log)), stdout=log_a, stderr=subprocess.STDOUT)
    deadline = time.time() + 900
    killed_after = None

    def _tail_a():
        log_a.flush()
        return (tmp_path / "run_a.log").read_text(errors="replace")[-4000:]

    try:
        while time.time() < deadline:
            done = [p for p in os.listdir(ckpt_a)
                    if p.isdigit()] if os.path.isdir(ckpt_a) else []
            steps_done = sorted(int(p) for p in done)
            # Kill once a MID-RUN checkpoint exists (not the final one).
            if steps_done and steps_done[-1] >= CKPT_EVERY:
                killed_after = steps_done[-1]
                break
            if proc.poll() is not None:
                pytest.fail("train run A exited before its first "
                            "checkpoint:\n" + _tail_a())
            time.sleep(0.5)
        else:
            proc.kill()
            pytest.fail("run A produced no checkpoint within the deadline:\n"
                        + _tail_a())
        # Let the input-iterator state land (written before mgr.save, but
        # give the fs a beat), then SIGKILL — no cleanup, no atexit.
        time.sleep(1.0)
        os.kill(proc.pid, signal.SIGKILL)
    finally:
        proc.wait(timeout=60)
    assert killed_after is not None and killed_after < STEPS

    # --- run A': restart the SAME command; must resume and finish -------
    out_a2 = subprocess.run(
        _train_argv(corpus, vocab_path, ckpt_a, str(log)),
        env=_env(str(log)), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, timeout=1800)
    text_a2 = out_a2.stdout.decode(errors="replace")
    assert out_a2.returncode == 0, text_a2
    assert "input position restored" in text_a2, text_a2
    assert "eval @ step" in text_a2, "in-train eval never ran"

    # --- run B: uninterrupted control ------------------------------------
    ckpt_b = str(tmp_path / "ckpt_b")
    out_b = subprocess.run(
        _train_argv(corpus, vocab_path, ckpt_b, str(log)),
        env=_env(str(log)), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, timeout=1800)
    text_b = out_b.stdout.decode(errors="replace")
    assert out_b.returncode == 0, text_b
    assert "eval @ step" in text_b

    # --- the gold assertion ----------------------------------------------
    params_a, tree_a = _load_final_params(ckpt_a, STEPS)
    params_b, tree_b = _load_final_params(ckpt_b, STEPS)
    flat_a, flat_b = _flatten(params_a), _flatten(params_b)
    assert set(flat_a) == set(flat_b)
    for k in sorted(flat_a):
        np.testing.assert_allclose(
            flat_a[k], flat_b[k], rtol=1e-6, atol=1e-7,
            err_msg=f"{k}: killed+resumed run diverged from control — "
                    "exact-record resume is broken")
    # BN statistics advanced identically too (stream equality).
    bn_a, bn_b = _flatten(tree_a["batch_stats"]), _flatten(tree_b["batch_stats"])
    for k in sorted(bn_a):
        np.testing.assert_allclose(bn_a[k], bn_b[k], rtol=1e-6, atol=1e-7,
                                   err_msg=f"batch_stats {k} diverged")
