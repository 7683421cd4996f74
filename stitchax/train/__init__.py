"""stitchax.train — losses, optimizer, train step, checkpointing (L5).

Reconstruction of the reference's unshipped training loop from its surviving
scaffolding (SURVEY.md §3.3), rebuilt as pure jittable functions over a
device mesh.
"""

from .losses import (LossConfig, sequence_alignment_loss, photometric_l1,
                     rigid_motion_loss, border_zero_flow_loss,
                     smoothness_loss)
from .optim import OptimConfig, fetch_optimizer, onecycle_schedule
from .trainer import (TrainState, create_train_state, make_train_step,
                      align_train_forward, save_checkpoint,
                      restore_checkpoint)

__all__ = [k for k in dir() if not k.startswith("_")]
