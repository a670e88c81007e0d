"""Model zoo + registry.

Mirrors the reference registry (meta_arch/__init__.py:7-21) — and registers
IGEVStereo, which the reference forgot (SURVEY.md §2.3) — mapping model names
to (module class, config class, loss fn).
"""

from dkt_stereo_tpu.models.registry import get_model, register_model, MODELS
from dkt_stereo_tpu.models.raft_stereo import RAFTStereo, RAFTStereoConfig
from dkt_stereo_tpu.models.gwcnet import GWCNet, GWCNetConfig
from dkt_stereo_tpu.models.igev_stereo import IGEVStereo, IGEVStereoConfig
from dkt_stereo_tpu.models.cgi_stereo import CGIStereo, CGIStereoConfig
from dkt_stereo_tpu.models.pcvnet import PCVNet, PCVNetConfig
from dkt_stereo_tpu.losses.sequence import sequence_loss_igev, sequence_loss_raft
from dkt_stereo_tpu.losses.gwc import loss_gwcnet
from dkt_stereo_tpu.losses.cgi import loss_cgi
from dkt_stereo_tpu.losses.pcv import sequence_loss_pcvnet

register_model("RAFTStereo", RAFTStereo, RAFTStereoConfig, sequence_loss_raft)
register_model("GWCNet", GWCNet, GWCNetConfig, loss_gwcnet)
# the reference forgot to register IGEVStereo (meta_arch/__init__.py:7-12)
register_model("IGEVStereo", IGEVStereo, IGEVStereoConfig, sequence_loss_igev)
register_model("CGI_Stereo", CGIStereo, CGIStereoConfig, loss_cgi)
register_model("PCVNet", PCVNet, PCVNetConfig, sequence_loss_pcvnet)
