from nefes_tpu.train.losses import (
    nerfw_loss, color_loss, nefes_training_loss, psnr, mse, l1,
)
from nefes_tpu.train.model import ModelConfig, NeFeSModel
from nefes_tpu.train.trainer import (
    EPOCH_TO_FUSION, TrainState, create_train_state, make_optimizer,
    stage_for_epoch, lr_for_epoch, train_step_rays, train_step_patch,
)
from nefes_tpu.train.checkpoint import (
    save_checkpoint, restore_checkpoint, latest_checkpoint,
)
from nefes_tpu.train.calibration import calibrate_fusion_bn, fusion_pre_bn
