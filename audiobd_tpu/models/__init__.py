from audiobd_tpu.models.zoo import (
    MODEL_REGISTRY,
    LargeCNN,
    LSTMWithAttention,
    ResNet,
    RNN,
    SmallCNN,
    SmallLSTM,
    build_model,
    jit_init,
)

__all__ = [
    "MODEL_REGISTRY",
    "SmallCNN",
    "LargeCNN",
    "SmallLSTM",
    "LSTMWithAttention",
    "RNN",
    "ResNet",
    "build_model",
    "jit_init",
]
