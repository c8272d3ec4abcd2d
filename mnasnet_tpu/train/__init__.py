from mnasnet_tpu.train.state import TrainState  # noqa: F401
from mnasnet_tpu.train.steps import (  # noqa: F401
    make_train_step,
    make_eval_step,
    make_predict_fn,
)
from mnasnet_tpu.train.optim import create_optimizer, rmsprop_tf, sgd  # noqa: F401
from mnasnet_tpu.train.schedules import make_schedule, scale_lr_for_batch  # noqa: F401
from mnasnet_tpu.train.loss import cross_entropy, topk_correct  # noqa: F401
