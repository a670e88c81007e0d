from dkt_stereo_tpu.data import readers
