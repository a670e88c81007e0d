from dkt_stereo_tpu.train.state import DKTHyperParams, DKTTrainState, make_optimizer
from dkt_stereo_tpu.train.dkt_step import create_dkt_state, make_dkt_train_step
