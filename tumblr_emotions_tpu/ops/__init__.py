from tumblr_emotions_tpu.ops.fused_inception import (  # noqa: F401
    fold_batchnorm,
    fused_inception_a,
    fused_inception_b,
)
from tumblr_emotions_tpu.ops.inference import FusedInceptionV3  # noqa: F401
from tumblr_emotions_tpu.ops.quant import (  # noqa: F401
    QuantizedInceptionV3,
    quantization_delta,
)
from tumblr_emotions_tpu.ops.serving import data_parallel_server  # noqa: F401
