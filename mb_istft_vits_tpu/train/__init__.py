"""Training: functional GAN train step, optimizer construction, state."""

from mb_istft_vits_tpu.train.step import (  # noqa: F401
    TrainState,
    create_train_state,
    make_train_step,
)
