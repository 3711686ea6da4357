from tumblr_emotions_tpu.models.inception_v3 import InceptionV3  # noqa: F401
from tumblr_emotions_tpu.models.text_model import TextEmotionModel  # noqa: F401
from tumblr_emotions_tpu.models.joint_model import DeepSentimentModel  # noqa: F401
