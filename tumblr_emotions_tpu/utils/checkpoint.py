"""TF-Slim checkpoint conversion + warm-start (SURVEY.md §3.2, §5).

The reference warm-starts Inception from the ImageNet slim checkpoint via
name-based restore, excluding the ``InceptionV3/Logits`` / ``AuxLogits``
scopes.  Because our Flax module names reproduce slim variable scopes
verbatim (models/inception_v3.py), conversion is a mechanical key map:

  InceptionV3/<scope>/weights                      -> params[<scope>]["weights"]
  InceptionV3/<scope>/biases                       -> params[<scope>]["biases"]
  InceptionV3/<scope>/BatchNorm/beta|gamma         -> params[...]["BatchNorm"][...]
  InceptionV3/<scope>/BatchNorm/moving_mean        -> batch_stats[...]
  InceptionV3/<scope>/BatchNorm/moving_variance    -> batch_stats[...]

Conv kernels are stored HWIO in TF checkpoints — exactly our layout — so no
transposes are needed (parity trap avoided by construction).  slim's
``scale=False`` BN means no gamma keys exist in ImageNet checkpoints; if one
appears (a scale=True training run) it maps through fine.

TensorFlow is imported lazily and only used as a checkpoint *reader*
(``tf.train.load_checkpoint``, verified available — SURVEY.md §7a).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
from flax import traverse_util

# Optimizer slot / bookkeeping variables to ignore in slim checkpoints.
_SKIP_SUBSTRINGS = ("RMSProp", "Momentum", "Adam", "ExponentialMovingAverage",
                    "global_step", "beta1_power", "beta2_power")

_STAT_LEAVES = ("moving_mean", "moving_variance")


def load_slim_checkpoint(ckpt_path: str, root_scope: str = "InceptionV3",
                         exclude_scopes: Sequence[str] = ()
                         ) -> Dict[str, Dict]:
    """Read a TF1 name-based checkpoint -> {"params": tree, "batch_stats": tree}.

    Keys outside ``root_scope`` and optimizer slots are skipped; scopes whose
    path contains any of ``exclude_scopes`` are skipped (the reference's
    ``slim.get_variables_to_restore(exclude=...)`` behavior).
    The returned trees are rooted BELOW ``root_scope`` (i.e. start at
    ``Conv2d_1a_3x3``...), matching a standalone InceptionV3 module.
    """
    import tensorflow as tf  # local: TF is a tool, not a dependency

    reader = tf.train.load_checkpoint(ckpt_path)
    shape_map = reader.get_variable_to_shape_map()
    params: Dict[Tuple[str, ...], np.ndarray] = {}
    batch_stats: Dict[Tuple[str, ...], np.ndarray] = {}
    prefix = root_scope + "/"
    for key in sorted(shape_map):
        if not key.startswith(prefix):
            continue
        if any(s in key for s in _SKIP_SUBSTRINGS):
            continue
        rel = key[len(prefix):]
        # Scope-prefix matching on path-segment boundaries, like slim's
        # get_variables_to_restore: excluding "Logits" must not also drop
        # "AuxLogits" (a substring match would).
        if any(rel == ex or rel.startswith(ex + "/") or f"/{ex}/" in rel
               or rel.endswith("/" + ex) for ex in exclude_scopes):
            continue
        path = tuple(rel.split("/"))
        value = np.asarray(reader.get_tensor(key))
        if path[-1] in _STAT_LEAVES:
            batch_stats[path] = value
        else:
            params[path] = value
    return {
        "params": traverse_util.unflatten_dict(params),
        "batch_stats": traverse_util.unflatten_dict(batch_stats),
    }


def merge_pretrained(variables: Dict, pretrained: Dict[str, Dict],
                     subtree: Optional[str] = None,
                     require_all_used: bool = True) -> Dict:
    """Merge converted checkpoint values into freshly-initialized variables.

    ``subtree``: nest the pretrained trees under this key (e.g. "InceptionV3"
    for the joint model, whose image branch lives in that scope).  Shapes are
    validated leaf by leaf; with ``require_all_used`` a pretrained leaf that
    matches nothing raises (catches naming drift instead of silently
    ignoring it).
    """
    out = {}
    for col in variables:
        tree = traverse_util.flatten_dict(variables[col])
        # Flax module names may themselves contain "/" (one dict key per slim
        # scope path), so matching happens on slash-joined strings — nesting
        # differences between the two trees then don't matter.
        by_str = {"/".join(p): p for p in tree}
        pre = traverse_util.flatten_dict(pretrained.get(col, {}))
        missing = []
        for path, value in pre.items():
            s = "/".join(path)
            full = f"{subtree}/{s}" if subtree else s
            key = by_str.get(full)
            if key is None:
                missing.append(full)
                continue
            if tuple(tree[key].shape) != tuple(value.shape):
                raise ValueError(
                    f"{col}/{full}: checkpoint shape {value.shape} != "
                    f"model shape {tree[key].shape}")
            tree[key] = value.astype(np.asarray(tree[key]).dtype)
        if require_all_used and missing:
            raise ValueError(
                f"{len(missing)} pretrained {col} leaves matched no model "
                f"parameter (e.g. {missing[0]}); wrong model or root scope?")
        out[col] = traverse_util.unflatten_dict(tree)
    return out


def save_as_slim_checkpoint(variables: Dict, ckpt_path: str,
                            root_scope: str = "InceptionV3") -> str:
    """Write our variables as a TF1 name-based checkpoint (the inverse map).

    Lets checkpoints trained here be consumed by slim-era tooling, and gives
    the converter a self-contained round-trip test without the original
    ImageNet checkpoint on disk (SURVEY.md §7a: none available offline).
    """
    import tensorflow as tf

    tf1 = tf.compat.v1
    graph = tf.Graph()
    with graph.as_default():
        tf_vars = []
        for col, leaf_kinds in (("params", None), ("batch_stats", _STAT_LEAVES)):
            flat = traverse_util.flatten_dict(variables.get(col, {}))
            for path, value in flat.items():
                name = root_scope + "/" + "/".join(path)
                tf_vars.append(tf1.get_variable(
                    name, initializer=np.asarray(value), trainable=False))
        saver = tf1.train.Saver(var_list=tf_vars)
        with tf1.Session(graph=graph) as sess:
            sess.run(tf1.global_variables_initializer())
            return saver.save(sess, ckpt_path)
