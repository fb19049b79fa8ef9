"""Training: alternating D/G loop, losses, EMA, checkpointing.

Reference equivalents: trainer.py (Trainer), the inline WGAN/hinge losses
(trainer.py:222-247), gradient penalty (trainer.py:177-197), weight_avg EMA
(trainer.py:199-206), checkpoint/resume (trainer.py:128-163). The key
TPU-native difference: one jitted fused step runs iterD D-updates + 1
G-update per call instead of eager per-op dispatch.
"""

from gan3d_tpu.train.trainer import Trainer

__all__ = ["Trainer"]
