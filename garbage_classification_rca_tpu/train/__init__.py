from .loss import cross_entropy_loss  # noqa: F401
from .optim import make_optimizer, PlateauScheduler  # noqa: F401
from .loop import make_train_step, head_only_mask, all_trainable_mask  # noqa: F401
