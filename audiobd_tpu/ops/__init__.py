from audiobd_tpu.ops.pallas_mfcc import fused_mfcc, fused_mfcc_features

__all__ = ["fused_mfcc", "fused_mfcc_features"]
