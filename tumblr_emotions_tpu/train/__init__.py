from tumblr_emotions_tpu.train.trainer import (  # noqa: F401
    Trainer,
    TrainState,
    build_model,
    make_optimizer,
)
