from .losses import YOLOv3Loss, IouLoss, IouAwareLoss, total_loss
from .lr_schedule import make_lr_fn
from .optimizer import init_momentum, sgd_momentum_update
from .train_step import TrainState, make_train_step, init_train_state, build_loss
