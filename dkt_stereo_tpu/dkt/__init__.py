from dkt_stereo_tpu.dkt.fande import fande_ensemble, fande_filter
from dkt_stereo_tpu.dkt.ema import ema_update
