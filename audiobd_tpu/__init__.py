"""audiobd_tpu — a TPU-native audio-backdoor attack/defense framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of the
reference PyTorch research benchmark ``quantum-bitss/Audio-Backdoor-Attack``:
five audio backdoor attacks (BadNets, JingleBack, Ultrasonic, DABA, FlowMur)
against keyword-spotting models on Google Speech Commands, three defenses
(Fine-Pruning, FT-reg, TSBD) and an unlearning correlation analysis.

Design principles (TPU-first, not a port):
  * The audio front-end (STFT → mel → log → DCT MFCC) is expressed as dense
    matmuls that map onto the MXU, fully differentiable, and optionally fused
    into a single Pallas kernel (``audiobd_tpu.ops``).
  * Poisoning operators are pure, batched, jittable functions over device
    arrays — no per-sample Python loops, no filesystem round-trips in the hot
    path (reference: per-wav loops, e.g. badnets.py:53-77).
  * One jitted train/eval step with on-device metrics (clean acc, ASR with
    poison-indicator masking) and data parallelism over a ``jax.sharding.Mesh``
    from day one.
  * Orbax checkpointing preserving the reference's ``record/<result>/...``
    path contract (reference: utils/training_tools.py:44-50).
"""

__version__ = "0.1.0"
