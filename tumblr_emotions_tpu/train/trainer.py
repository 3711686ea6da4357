"""Training + evaluation loops: one jit-compiled XLA program per step.

Replaces the reference's L3 (SURVEY.md §3.1): slim's ``create_train_op`` +
Supervisor loop crossed Python->C++ per ``session.run``; here the whole step
(optional device-side preprocessing, forward, loss with aux head + L2
regularization, backward, optimizer update, BN moving-stat updates) is ONE
jitted function with donated state, executed under a device mesh with the
batch sharded on the "data" axis — XLA inserts the gradient all-reduce over
ICI (SURVEY.md §2c).

Loss math mirrors slim: mean softmax cross-entropy, plus
``aux_loss_weight`` * CE on AuxLogits when present, plus TF-style L2
(``wd * sum(w^2)/2``) over conv/dense kernels only (not biases/BN/embeddings,
matching slim's arg_scope regularizer placement).
"""

from __future__ import annotations

import logging
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tumblr_emotions_tpu.config import Config
from tumblr_emotions_tpu.data import preprocessing as pp
from tumblr_emotions_tpu.models import (
    DeepSentimentModel, InceptionV3, TextEmotionModel)
from tumblr_emotions_tpu.parallel import mesh as mesh_lib
from tumblr_emotions_tpu.utils import metrics as metrics_lib
from tumblr_emotions_tpu.utils.summaries import ProfilerHook, SummaryWriter

log = logging.getLogger("tumblr_emotions_tpu")


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


# ---------------------------------------------------------------------------
# Model factory
# ---------------------------------------------------------------------------

def build_model(cfg: Config):
    """Config -> (flax module, forward(variables, batch, train, rngs)).

    The forward closure hides the three model signatures behind one batch
    dict: image [B,H,W,C] (f32 model-ready or uint8 raw), tokens [B,T],
    lengths [B], label [B].
    """
    dtype = jnp.bfloat16 if cfg.train.precision_mode == "perf" else jnp.float32
    # Parity mode: force true-f32 MXU passes so logits meet the 1e-4 budget
    # vs the TF reference (TPU's default precision multiplies in bf16).
    precision = None if cfg.train.precision_mode == "perf" else "highest"
    if cfg.model == "text":
        model = TextEmotionModel(
            vocab_size=cfg.text.vocab_size, embed_dim=cfg.text.embed_dim,
            num_classes=cfg.image.num_classes, aggregator=cfg.text.aggregator,
            rnn_hidden=cfg.text.rnn_hidden, hidden_dim=cfg.text.hidden_dim,
            pad_id=cfg.text.pad_id, dtype=dtype)

        def forward(variables, batch, train, rngs=None, mutable=False):
            return model.apply(variables, batch["tokens"],
                               batch.get("lengths"), train=train,
                               rngs=rngs, mutable=mutable)
    elif cfg.model == "image":
        model = InceptionV3(
            num_classes=cfg.image.num_classes,
            depth_multiplier=cfg.image.depth_multiplier,
            min_depth=cfg.image.min_depth,
            dropout_keep_prob=cfg.image.dropout_keep_prob,
            create_aux_logits=cfg.image.create_aux_logits,
            bn_momentum=cfg.image.bn_momentum, bn_epsilon=cfg.image.bn_epsilon,
            bn_scale=cfg.image.bn_scale, dtype=dtype, precision=precision,
            name="InceptionV3")

        def forward(variables, batch, train, rngs=None, mutable=False):
            return model.apply(variables, batch["image"], train=train,
                               rngs=rngs, mutable=mutable)
    elif cfg.model == "joint":
        model = DeepSentimentModel(
            vocab_size=cfg.text.vocab_size, embed_dim=cfg.text.embed_dim,
            num_classes=cfg.image.num_classes, aggregator=cfg.text.aggregator,
            rnn_hidden=cfg.text.rnn_hidden,
            dropout_keep_prob=cfg.image.dropout_keep_prob,
            create_aux_logits=cfg.image.create_aux_logits,
            depth_multiplier=cfg.image.depth_multiplier,
            min_depth=cfg.image.min_depth, pad_id=cfg.text.pad_id,
            bn_momentum=cfg.image.bn_momentum,
            bn_epsilon=cfg.image.bn_epsilon, bn_scale=cfg.image.bn_scale,
            dtype=dtype, precision=precision)

        def forward(variables, batch, train, rngs=None, mutable=False):
            return model.apply(variables, batch["image"], batch["tokens"],
                               batch.get("lengths"), train=train,
                               rngs=rngs, mutable=mutable)
    else:
        raise ValueError(f"unknown model type {cfg.model!r}")
    return model, forward


# ---------------------------------------------------------------------------
# Optimizer (slim-style schedules + scope freezing)
# ---------------------------------------------------------------------------

def _lr_schedule(cfg: Config) -> optax.Schedule:
    t = cfg.train
    if t.lr_decay_steps > 0:
        return optax.exponential_decay(
            t.learning_rate, transition_steps=t.lr_decay_steps,
            decay_rate=t.lr_decay_factor, staircase=True)
    return optax.constant_schedule(t.learning_rate)


def make_optimizer(cfg: Config, params=None) -> optax.GradientTransformation:
    t = cfg.train
    lr = _lr_schedule(cfg)
    if t.optimizer == "rmsprop":
        # slim fine-tune default: decay 0.9, momentum 0.9, epsilon 1.0.
        opt = optax.rmsprop(lr, decay=t.rmsprop_decay, eps=t.rmsprop_epsilon,
                            momentum=t.momentum)
    elif t.optimizer == "adam":
        opt = optax.adam(lr)
    elif t.optimizer == "sgd":
        opt = optax.sgd(lr, momentum=t.momentum or None)
    else:
        raise ValueError(f"unknown optimizer {t.optimizer!r}")
    if t.grad_clip_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(t.grad_clip_norm), opt)
    if t.trainable_scopes and params is not None:
        scopes = _parse_scopes(t.trainable_scopes)
        labels = traverse_util.path_aware_map(
            lambda p, _: "train" if _path_in_scopes(p, scopes) else "freeze",
            params)
        opt = optax.multi_transform(
            {"train": opt, "freeze": optax.set_to_zero()}, labels)
    return opt


def _parse_scopes(trainable_scopes: str) -> Tuple[str, ...]:
    return tuple(s.strip() for s in trainable_scopes.split(",") if s.strip())


def _path_in_scopes(path: Tuple[str, ...], scopes: Tuple[str, ...]) -> bool:
    # slim-style scope matching on path-segment boundaries ("Logits" must
    # NOT match "AuxLogits").  Wrapping the joined path in "/"s makes one
    # substring test cover every segment position (start, middle, end) —
    # flax keys that themselves contain "/" are segmented the same way.
    joined = "/".join(path)
    return any(f"/{s}/" in f"/{joined}/" for s in scopes)


def stop_frozen_gradients(params, trainable_scopes: str):
    """``lax.stop_gradient`` on every param leaf OUTSIDE trainable_scopes.

    Optimizer masking (``set_to_zero``) already keeps frozen params fixed;
    cutting the gradient at the leaves makes the dead-coding of the frozen
    backward EXPLICIT instead of relying on XLA noticing that
    ``set_to_zero`` discards those grads.  Measured on v5e (image_frozen,
    B=256): neutral — 59.6 vs 59.4 ms/step — i.e. XLA's DCE already
    eliminates the frozen tower backward either way (ledger entry in
    docs/PERFORMANCE.md).  Kept because the guarantee should not depend on
    a whole-program DCE pass seeing through optax internals.
    Gradient STRUCTURE is unchanged: frozen leaves get zeros, exactly what
    the masked optimizer expects.
    """
    if not trainable_scopes:
        return params
    scopes = _parse_scopes(trainable_scopes)
    return traverse_util.path_aware_map(
        lambda p, v: v if _path_in_scopes(p, scopes)
        else jax.lax.stop_gradient(v), params)


def l2_regularization(params, weight_decay: float) -> jax.Array:
    """TF-style: wd * sum(||w||^2 / 2) over kernel-like leaves only."""
    if weight_decay <= 0:
        return jnp.asarray(0.0, jnp.float32)
    flat = traverse_util.flatten_dict(params)
    total = jnp.asarray(0.0, jnp.float32)
    for path, w in flat.items():
        if path[-1] in ("weights", "kernel"):
            total = total + 0.5 * jnp.sum(jnp.square(w.astype(jnp.float32)))
    return weight_decay * total


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  label_smoothing: float = 0.0,
                  reduce: bool = True) -> jax.Array:
    logits = logits.astype(jnp.float32)
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / num_classes
    per_example = optax.softmax_cross_entropy(logits, onehot)
    return jnp.mean(per_example) if reduce else per_example


# ---------------------------------------------------------------------------
# Trainer
# ---------------------------------------------------------------------------

class Trainer:
    """Orchestrates init, the jitted train/eval steps, checkpoints, logging.

    ``preprocess``: None (batch["image"] already model-ready), "train"
    (uint8 -> distorted crop/flip/color on device, fused into the step), or
    "eval" (uint8 -> central-crop/resize, fused).
    """

    def __init__(self, cfg: Config, mesh: Optional[Mesh] = None,
                 preprocess: Optional[str] = None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else mesh_lib.create_mesh(cfg.mesh)
        self.preprocess = preprocess
        self.model, self.forward = build_model(cfg)
        self.tx: Optional[optax.GradientTransformation] = None
        self._compiled_train = None
        self._compiled_eval = None
        self._ckpt_mgr = None

    # -- initialization ----------------------------------------------------

    def _maybe_preprocess(self, batch: Dict[str, jax.Array], train: bool,
                          rng: Optional[jax.Array]) -> Dict[str, jax.Array]:
        if self.preprocess is None or "image" not in batch:
            return batch
        image = batch["image"]
        size = self.cfg.image.image_size
        if self.preprocess == "train" and train:
            image = pp.preprocess_for_train(
                rng, image, size, size,
                resize_method=self.cfg.data.resize_method)
        else:
            image = pp.preprocess_for_eval(
                image, size, size,
                central_fraction=self.cfg.data.eval_central_crop,
                resize_method=self.cfg.data.resize_method)
        return dict(batch, image=image)

    def init_state(self, rng: jax.Array, sample_batch: Dict[str, np.ndarray],
                   initial_variables: Optional[Dict] = None,
                   embedding_matrix: Optional[np.ndarray] = None) -> TrainState:
        if initial_variables is None:
            init_rngs = {"params": rng, "dropout": jax.random.PRNGKey(0)}
            batch = jax.tree_util.tree_map(
                lambda x: jnp.asarray(x)[:1], dict(sample_batch))
            batch = self._maybe_preprocess(batch, False, None)
            variables = self.model.init(
                init_rngs, *self._model_args(batch), train=False)
        else:
            variables = initial_variables
        params = flax.core.unfreeze(variables["params"])
        batch_stats = flax.core.unfreeze(variables.get("batch_stats", {}))
        if embedding_matrix is not None:
            params = _set_embedding(params, embedding_matrix)
        self.tx = make_optimizer(self.cfg, params)
        opt_state = self.tx.init(params)
        return TrainState(step=jnp.asarray(0, jnp.int32), params=params,
                          batch_stats=batch_stats, opt_state=opt_state)

    def _model_args(self, batch: Dict[str, jax.Array]) -> Tuple:
        if self.cfg.model == "text":
            return (batch["tokens"], batch.get("lengths"))
        if self.cfg.model == "image":
            return (batch["image"],)
        return (batch["image"], batch["tokens"], batch.get("lengths"))

    # -- the jitted step ---------------------------------------------------

    def _loss_fn(self, params, batch_stats, batch, rng, train: bool):
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = {"dropout": rng} if train else None
        mutable = ["batch_stats"] if train else False
        out = self.forward(variables, batch, train=train, rngs=rngs,
                           mutable=mutable)
        if train:
            (logits, end_points), updates = out
            new_stats = updates.get("batch_stats", batch_stats)
        else:
            logits, end_points = out
            new_stats = batch_stats
        loss = cross_entropy(logits, batch["label"])
        if train and "AuxLogits" in end_points:
            loss = loss + self.cfg.image.aux_loss_weight * cross_entropy(
                end_points["AuxLogits"], batch["label"])
        loss = loss + l2_regularization(params, self.cfg.train.weight_decay)
        return loss, (logits, new_stats)

    def train_step(self, state: TrainState, batch, rng):
        rng_pp, rng_drop = jax.random.split(jax.random.fold_in(rng, state.step))
        batch = self._maybe_preprocess(batch, True, rng_pp)
        grad_fn = jax.value_and_grad(
            lambda p: self._loss_fn(
                stop_frozen_gradients(p, self.cfg.train.trainable_scopes),
                state.batch_stats, batch, rng_drop, True),
            has_aux=True)
        (loss, (logits, new_stats)), grads = grad_fn(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32))
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        return new_state, {"loss": loss, "accuracy": acc}

    def eval_step(self, state: TrainState, batch):
        batch = self._maybe_preprocess(batch, False, None)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logits, _ = self.forward(variables, batch, train=False)
        stats = metrics_lib.batch_stats(logits, batch["label"],
                                        self.cfg.image.num_classes,
                                        weights=batch.get("weight"))
        # Pad-masked eval loss: weight=0 rows (last-batch padding) contribute
        # nothing; the L2 term is per-example-constant so it scales by count.
        per_ex = cross_entropy(logits, batch["label"], reduce=False)
        w = batch.get("weight")
        w = (jnp.ones_like(per_ex) if w is None else w.astype(jnp.float32))
        l2 = l2_regularization(state.params, self.cfg.train.weight_decay)
        stats["loss_sum"] = (jnp.sum(per_ex * w)
                             + l2 * stats["count"].astype(jnp.float32))
        return stats

    def compile(self):
        """jit both steps; donates state so HBM holds one copy.

        On a single-device mesh plain jit is used — explicit shardings are
        no-ops there, and this environment's remote-TPU runtime executes
        sharded-annotated programs ~200x slower (measured 20.5 s vs 103 ms
        per step).  Multi-device meshes get explicit NamedShardings: params
        replicated, batch split on the data axis, XLA all-reducing grads.

        Train/eval compiles take `train_default_options()` — 64M scoped
        vmem only (+4% on the backward+optimizer program; the serving
        trio's vmem scavenging costs it ~4%, interleaved sweeps in
        docs/PERFORMANCE.md); override via TET_TRAIN_COMPILER_OPTIONS.
        """
        from tumblr_emotions_tpu.utils.compile_opts import (
            tpu_jit, train_default_options)

        opts = train_default_options()
        if self.mesh.devices.size == 1:
            self._compiled_train = tpu_jit(self.train_step,
                                           compiler_options=opts,
                                           donate_argnums=(0,))
            self._compiled_eval = tpu_jit(self.eval_step,
                                          compiler_options=opts)
            return self
        repl = NamedSharding(self.mesh, P())
        data = NamedSharding(self.mesh, P("data"))
        self._compiled_train = tpu_jit(
            self.train_step,
            compiler_options=opts,
            in_shardings=(repl, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,))
        self._compiled_eval = tpu_jit(
            self.eval_step, compiler_options=opts,
            in_shardings=(repl, data), out_shardings=repl)
        return self

    # -- loops ---------------------------------------------------------------

    def fit(self, state: TrainState, batches: Iterable[Dict[str, np.ndarray]],
            num_steps: Optional[int] = None,
            eval_batches: Optional[Callable[[], Iterable]] = None,
            input_iterator=None) -> TrainState:
        """Train for ``num_steps``.  ``eval_batches`` (a callable returning
        a fresh pass over the eval split) is evaluated at every checkpoint
        interval and at the end, with ``eval/*`` summaries written.
        ``input_iterator`` (a resumable grain iterator, if the stream has
        one underneath) has its position saved next to each checkpoint so
        a restart resumes at the exact record (see
        ``restore_input_iterator``)."""
        if self._compiled_train is None:
            self.compile()
        state = self._place_state(state)
        t = self.cfg.train
        num_steps = num_steps if num_steps is not None else t.num_steps
        rng = self._place_state(jax.random.PRNGKey(t.seed))
        it = iter(batches)
        writer = SummaryWriter(t.log_dir)
        profiler = ProfilerHook(t.log_dir or "/tmp/tumblr_emotions_trace",
                                t.profile_start_step, t.profile_num_steps)
        last_t = time.perf_counter()
        # Track the step on the HOST: reading state.step back each
        # iteration would block on the previous step's device execution
        # and serialize the dispatch pipeline (it increments by exactly 1
        # per train_step, so the mirror stays consistent).
        step = last_step = int(state.step)
        try:
            for _ in range(num_steps):
                try:
                    batch = next(it)
                except StopIteration:
                    log.info("input exhausted at step %d", step)
                    break
                step_next = step + 1
                profiler.maybe_start(step_next)
                batch = mesh_lib.shard_batch(self.mesh, batch)
                state, m = self._compiled_train(state, batch, rng)
                step = step_next
                profiler.maybe_stop(step)
                if step % t.log_every == 0:
                    jax.block_until_ready(m)
                    now = time.perf_counter()
                    ips = (t.batch_size * (step - last_step)) / max(now - last_t, 1e-9)
                    loss = float(m["loss"])
                    acc = float(m["accuracy"])
                    log.info("step %d loss %.4f acc %.3f (%.1f ex/s)",
                             step, loss, acc, ips)
                    writer.write_scalars(step, {
                        "train/loss": loss, "train/accuracy": acc,
                        "train/examples_per_sec": ips,
                        "train/learning_rate": float(_lr_schedule(self.cfg)(step)),
                    })
                    last_t, last_step = now, step
                if self._ckpt_mgr is not None and step % t.checkpoint_every == 0:
                    self.save_checkpoint(state, input_iterator=input_iterator)
                    if eval_batches is not None:
                        self._eval_and_log(state, eval_batches, step, writer)
        finally:
            profiler.stop_if_active()
            writer.flush()
        if self._ckpt_mgr is not None:
            self.save_checkpoint(state, input_iterator=input_iterator)
        if eval_batches is not None:
            self._eval_and_log(state, eval_batches, step, writer)
            writer.flush()
        return state

    def _eval_and_log(self, state: TrainState,
                      eval_batches: Callable[[], Iterable],
                      step: int, writer) -> Dict:
        summary = self.evaluate(state, eval_batches())
        log.info("eval @ step %d: accuracy %.4f loss %.4f (n=%d)", step,
                 summary.get("accuracy", 0.0), summary.get("loss", 0.0),
                 summary.get("count", 0))
        writer.write_scalars(step, {
            "eval/accuracy": float(summary.get("accuracy", 0.0)),
            "eval/loss": float(summary.get("loss", 0.0)),
        })
        return summary

    def _place_state(self, state: TrainState) -> TrainState:
        """Multi-host: turn host-local state leaves (fresh init / numpy
        restore) into replicated GLOBAL arrays so the pjit'd step accepts
        them.  Single-process runs pass through — jit places uncommitted
        leaves itself, and committing on a 1-device mesh trips this
        environment's remote-runtime slow path (see ``compile``)."""
        if jax.process_count() == 1:
            return state
        return jax.tree_util.tree_map(self._ensure_global, state)

    def evaluate(self, state: TrainState,
                 batches: Iterable[Dict[str, np.ndarray]],
                 class_names=None) -> Dict:
        if self._compiled_eval is None:
            self.compile()
        state = self._place_state(state)
        total = None
        loss_sum, count = 0.0, 0
        if jax.process_count() > 1:
            batches = self._lockstep_local_batches(batches)
        for batch in batches:
            batch = mesh_lib.shard_batch(self.mesh, batch)
            stats = jax.device_get(self._compiled_eval(state, batch))
            loss_sum += float(stats.pop("loss_sum"))
            count += int(stats["count"])
            total = stats if total is None else metrics_lib.merge_stats(total, stats)
        if total is None or int(total["count"]) == 0:
            return {"accuracy": 0.0, "count": 0}
        summary = metrics_lib.summarize(total, class_names)
        summary["loss"] = loss_sum / max(count, 1)
        return summary

    def _lockstep_local_batches(self, batches):
        """Multi-host eval sharding (VERDICT r4 #6): each process reads only
        its record shard (``cli._make_batches shard_eval=True``) so the
        split is covered exactly once across the pod instead of N-way
        redundantly.  The jitted eval step is a COLLECTIVE program — the
        global batch is assembled from the per-process slices and the
        sufficient statistics come back already globally reduced (the
        pjit all-reduce), so no host-side cross-process merge is needed.
        What IS needed is lockstep: every process must invoke the program
        the same number of times or the collective deadlocks.  Record
        shards can be uneven, so the shorter shards repeat their last
        batch with weight=0 — a zero-weight batch contributes nothing to
        any statistic (``metrics.batch_stats`` masks by weight; the eval
        loss and its L2 term both scale by the weighted count).
        """
        from jax.experimental import multihost_utils

        local = []
        for b in batches:
            if "weight" not in b:
                # Every process must trace/call the IDENTICAL program, so
                # the batch structure (incl. the weight leaf) must match
                # across processes even when only some shards are padded.
                b = dict(b, weight=np.ones(
                    np.asarray(b["label"]).shape[0], np.int32))
            local.append(b)
        n_max = int(np.max(multihost_utils.process_allgather(
            np.int64(len(local)))))
        if len(local) < n_max:
            if not local:
                raise ValueError(
                    "multi-host sharded eval: this process's record shard "
                    "produced zero batches while another produced "
                    f"{n_max}; shard the eval split so every process gets "
                    "at least one batch, or evaluate unsharded")
            pad = dict(local[-1],
                       weight=np.zeros_like(local[-1]["weight"]))
            local.extend([pad] * (n_max - len(local)))
        return local

    def evaluate_continuously(self, state: TrainState,
                              batches_fn: Callable[[], Iterable],
                              class_names=None,
                              interval_secs: float = 30.0,
                              max_step: Optional[int] = None,
                              timeout_secs: Optional[float] = None,
                              _sleep=time.sleep):
        """slim ``evaluation_loop`` semantics (SURVEY.md §2a #11, §3.3):
        poll the checkpoint dir, evaluate every NEW checkpoint as it
        appears, write eval summaries, and stop once the evaluated step
        reaches ``max_step`` (default: cfg.train.num_steps) or no new
        checkpoint arrives within ``timeout_secs``.

        ``batches_fn`` is called once per evaluation to produce a fresh
        pass over the eval split.  Yields ``(step, summary)`` per
        evaluation so callers can stream results.
        """
        mgr = self.checkpoint_manager()
        stop_step = max_step if max_step is not None else self.cfg.train.num_steps
        writer = SummaryWriter(self.cfg.train.log_dir)
        last_evaluated = -1
        # Wall-clock timeout accounting (monotonic, not summed intervals):
        # interval_secs=0 must still time out, and poll cost must count.
        deadline = (time.monotonic() + timeout_secs
                    if timeout_secs is not None else None)
        while True:
            step = mgr.latest_step()
            if step is None or step <= last_evaluated:
                if deadline is not None and time.monotonic() >= deadline:
                    log.info("eval loop: no new checkpoint after %.0fs, "
                             "stopping", timeout_secs)
                    return
                _sleep(interval_secs)
                continue
            restored = self.restore_latest(state)
            if restored is None:
                # Checkpoint vanished between poll and read, or was only
                # partially written: honor the deadline and back off rather
                # than busy-spinning (and do NOT reset the deadline — a
                # permanently corrupt latest ckpt must still time out).
                if deadline is not None and time.monotonic() >= deadline:
                    log.info("eval loop: no restorable checkpoint after "
                             "%.0fs, stopping", timeout_secs)
                    return
                _sleep(interval_secs)
                continue
            if timeout_secs is not None:
                deadline = time.monotonic() + timeout_secs
            summary = self.evaluate(restored, batches_fn(),
                                    class_names=class_names)
            last_evaluated = int(restored.step)
            log.info("eval @ step %d: accuracy %.4f loss %.4f",
                     last_evaluated, summary.get("accuracy", 0.0),
                     summary.get("loss", 0.0))
            writer.write_scalars(last_evaluated, {
                "eval/accuracy": float(summary.get("accuracy", 0.0)),
                "eval/loss": float(summary.get("loss", 0.0)),
            })
            writer.flush()
            yield last_evaluated, summary
            if last_evaluated >= stop_step:
                log.info("eval loop: reached final step %d", last_evaluated)
                return

    # -- checkpointing (Orbax; SURVEY.md §5 checkpoint/resume) --------------

    def checkpoint_manager(self, directory: Optional[str] = None):
        import orbax.checkpoint as ocp

        if self._ckpt_mgr is None:
            directory = directory or self.cfg.train.checkpoint_dir
            self._ckpt_mgr = ocp.CheckpointManager(
                directory,
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=self.cfg.train.keep_checkpoints, create=True))
        return self._ckpt_mgr

    def save_checkpoint(self, state: TrainState, input_iterator=None) -> None:
        import orbax.checkpoint as ocp

        mgr = self.checkpoint_manager()
        step = int(jax.device_get(state.step))
        # Input position FIRST, one file PER STEP (advisor r3): a crash
        # between the two writes leaves at worst an orphan iterator file
        # (pruned below), never a checkpoint paired with a stale position;
        # and restoring an older kept checkpoint finds ITS matching file.
        if input_iterator is not None and hasattr(input_iterator, "get_state"):
            from tumblr_emotions_tpu.data import pipeline

            pipeline.save_iterator_state(input_iterator,
                                         self._input_state_path(step))
        tree = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": state.step}
        if jax.process_count() > 1:
            # Multi-host: every process calls save() (orbax synchronizes
            # internally — gating on process 0 would deadlock its barriers)
            # with GLOBAL jax.Arrays, so each shard is written exactly once
            # (primary host for replicated leaves).  device_get'ing to
            # host numpy and writing from every process would race N
            # writers on the same files.
            tree = jax.tree_util.tree_map(self._ensure_global, tree)
        else:
            tree = jax.device_get(tree)
        mgr.save(step, args=ocp.args.StandardSave(tree))
        mgr.wait_until_finished()
        self._prune_input_states()

    def _ensure_global(self, x):
        """Leaf -> globally-addressable replicated jax.Array (multi-host
        save path).  Already-global arrays (compiled-step outputs) pass
        through; host-local values (fresh init, a restored numpy tree) are
        identical on every process by construction (same seed / same
        checkpoint), so assembling them as fully-replicated is exact."""
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x
        repl = NamedSharding(self.mesh, P())
        return jax.make_array_from_process_local_data(repl, np.asarray(x))

    def _input_state_path(self, step: Optional[int] = None) -> str:
        """Iterator-state file for ``step`` (None = the legacy single file).
        Multi-host runs get per-process files: each host checkpoints its
        OWN input shard's position."""
        d = str(self.checkpoint_manager().directory)
        if step is None:
            return f"{d}/input_iterator.json"
        proc = (f".proc{jax.process_index()}"
                if jax.process_count() > 1 else "")
        return f"{d}/input_iterator_{step}{proc}.json"

    def _prune_input_states(self) -> None:
        """Drop iterator-state files whose step is no longer kept by the
        checkpoint manager (mirrors ``max_to_keep``)."""
        import glob as glob_lib
        import os
        import re

        mgr = self.checkpoint_manager()
        keep = {int(s) for s in mgr.all_steps()}
        proc = (f"\\.proc{jax.process_index()}"
                if jax.process_count() > 1 else "")
        pat = re.compile(rf"input_iterator_(\d+){proc}\.json$")
        for p in glob_lib.glob(
                str(mgr.directory) + "/input_iterator_*.json"):
            m = pat.search(p)
            if m and int(m.group(1)) not in keep:
                try:
                    os.unlink(p)
                except OSError:
                    pass

    def restore_input_iterator(self, iterator,
                               step: Optional[int] = None) -> bool:
        """Restore the input position saved with the checkpoint at ``step``
        (default: the latest).  Returns False when there is no saved state
        or the iterator is not resumable (e.g. a plain generator)."""
        if iterator is None or not hasattr(iterator, "set_state"):
            return False
        from tumblr_emotions_tpu.data import pipeline

        mgr = self.checkpoint_manager()
        if step is None:
            step = mgr.latest_step()
        if step is not None and pipeline.restore_iterator_state(
                iterator, self._input_state_path(int(step))):
            return True
        # Legacy layout (pre-round-4 checkpoints): one overwritten file.
        return pipeline.restore_iterator_state(iterator,
                                               self._input_state_path())

    def restore_latest(self, state: TrainState) -> Optional[TrainState]:
        """slim-Supervisor-style resume: restore the latest checkpoint if one
        exists, else return None."""
        import orbax.checkpoint as ocp

        mgr = self.checkpoint_manager()
        step = mgr.latest_step()
        if step is None:
            return None
        target = jax.device_get(
            {"params": state.params, "batch_stats": state.batch_stats,
             "opt_state": state.opt_state, "step": state.step})
        restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
        return TrainState(step=jnp.asarray(restored["step"]),
                          params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=restored["opt_state"])


def _set_embedding(params: Dict, matrix: np.ndarray) -> Dict:
    """Install a pretrained embedding matrix wherever the text branch lives."""
    flat = traverse_util.flatten_dict(params)
    hits = [p for p in flat if p[-1] == "WordEmbedding/embeddings"]
    if not hits:
        raise ValueError("model has no WordEmbedding/embeddings parameter")
    for p in hits:
        if flat[p].shape != matrix.shape:
            raise ValueError(f"embedding shape {matrix.shape} != {flat[p].shape}")
        flat[p] = jnp.asarray(matrix)
    return traverse_util.unflatten_dict(flat)
