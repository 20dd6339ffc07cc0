"""sgg.train — WGAN-GP objective, fused train step, state, checkpointing.

Capability parity with SURVEY.md §2.1 #6–#7: GAN assembly, losses, and the
train loop — redesigned as one jit-compiled fused update (n_critic critic
steps + 1 generator step per dispatch) instead of per-op session calls.
"""

from sgg.utils.gumbel import gumbel_softmax, sample_gumbel
from sgg.train.losses import critic_loss, generator_loss, gradient_penalty
from sgg.train.state import GANTrainState, create_train_state
from sgg.train.step import make_train_step

__all__ = [
    "gumbel_softmax",
    "sample_gumbel",
    "critic_loss",
    "generator_loss",
    "gradient_penalty",
    "GANTrainState",
    "create_train_state",
    "make_train_step",
]
