"""Data-parallel serving path (BASELINE config 4's v5e-8 aspect) on the
8-device virtual CPU mesh: batch sharded over "data", engine weights
replicated, outputs identical to the single-device engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tumblr_emotions_tpu.models import InceptionV3
from tumblr_emotions_tpu.ops.quant import QuantizedInceptionV3
from tumblr_emotions_tpu.ops.serving import data_parallel_server
from tumblr_emotions_tpu.parallel import create_mesh, shard_batch

pytestmark = pytest.mark.heavy  # full-tower CPU compiles


def test_data_parallel_server_matches_single_device():
    model = InceptionV3(num_classes=7, depth_multiplier=0.25, min_depth=8,
                        create_aux_logits=False)
    rng = np.random.RandomState(0)
    raw = rng.randint(0, 256, (8, 330, 340, 3), dtype=np.uint8)

    from tumblr_emotions_tpu.data.preprocessing import preprocess_for_eval

    calib = preprocess_for_eval(jnp.asarray(raw), dtype=jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(1)}, calib[:1],
                           train=False)
    engine = QuantizedInceptionV3(variables, calib)

    mesh = create_mesh()
    assert mesh.devices.size == 8
    server = data_parallel_server(engine, mesh)
    sharded = shard_batch(mesh, {"image": np.asarray(raw)})["image"]
    probs, feature = server(sharded)
    assert probs.shape == (8, 7) and feature.shape[0] == 8

    # The sharded outputs live on the data axis.
    assert probs.sharding.spec == jax.sharding.PartitionSpec("data")

    # Matches the single-device engine (same math, modulo bf16 fusion drift).
    logits1, feat1 = jax.jit(lambda im: engine(im))(
        preprocess_for_eval(jnp.asarray(raw), dtype=jnp.bfloat16))
    p1 = jax.nn.softmax(np.asarray(logits1, np.float32), axis=-1)
    np.testing.assert_allclose(np.asarray(probs), p1, atol=2e-4)
    # bf16 preprocess rounds differently under the sharded fusion context;
    # the int8 tower then quantizes, so allow a few quant steps of drift.
    np.testing.assert_allclose(np.asarray(feature), np.asarray(feat1),
                               rtol=5e-3, atol=5e-3)
