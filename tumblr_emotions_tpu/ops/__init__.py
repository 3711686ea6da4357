from tumblr_emotions_tpu.ops.fused_inception import (  # noqa: F401
    fold_batchnorm,
    fused_inception_a,
    fused_inception_b,
)
