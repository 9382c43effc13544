from audiobd_tpu.data.speech_commands import (
    CleanData,
    load_clean_data,
    make_synthetic_clean_data,
    prepare_clean_dataset,
)
from audiobd_tpu.data.wavio import read_wav, write_wav

__all__ = [
    "CleanData",
    "load_clean_data",
    "prepare_clean_dataset",
    "make_synthetic_clean_data",
    "read_wav",
    "write_wav",
]
