"""Flax (linen) neural-net building blocks.

Module/parameter names deliberately mirror the reference's attribute names
(conv1/norm1/layer1/...) so the ``.pth`` checkpoint importer in
``train/checkpoint.py`` is a mechanical name map rather than a lookup table.
"""

from dkt_stereo_tpu.nn.norms import Norm
from dkt_stereo_tpu.nn.blocks import (
    BasicEncoder,
    BottleneckBlock,
    MultiBasicEncoder,
    ResidualBlock,
)
from dkt_stereo_tpu.nn.gru import (
    BasicMotionEncoder,
    BasicMultiUpdateBlock,
    ConvGRU,
    FlowHead,
    SepConvGRU,
)
