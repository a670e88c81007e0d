"""Minimal torch MobileNetV2-100 mimicking timm's module structure.

Lets the reference IGEV/CGI models (which do
``timm.create_model('mobilenetv2_100', features_only=True)`` and tap
``conv_stem``/``bn1``/``act1``/``blocks``) import and run without timm, with
timm's parameter naming (conv_pw/conv_dw/conv_pwl, bn1/bn2/bn3) so the same
state dict maps onto our flax MobileNetV2Trunk through the .pth importer.
Install with ``sys.modules['timm'] = tests.fake_timm`` before importing the
reference package.
"""

from __future__ import annotations

import torch
import torch.nn as nn


class DepthwiseSeparableConv(nn.Module):
    def __init__(self, in_ch, out_ch, stride=1):
        super().__init__()
        self.conv_dw = nn.Conv2d(in_ch, in_ch, 3, stride, 1, groups=in_ch, bias=False)
        self.bn1 = nn.BatchNorm2d(in_ch)
        self.conv_pw = nn.Conv2d(in_ch, out_ch, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.act = nn.ReLU6(inplace=True)
        self.has_residual = stride == 1 and in_ch == out_ch

    def forward(self, x):
        shortcut = x
        x = self.act(self.bn1(self.conv_dw(x)))
        x = self.bn2(self.conv_pw(x))
        if self.has_residual:
            x = x + shortcut
        return x


class InvertedResidual(nn.Module):
    def __init__(self, in_ch, out_ch, stride=1, expand=6):
        super().__init__()
        mid = in_ch * expand
        self.conv_pw = nn.Conv2d(in_ch, mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(mid)
        self.conv_dw = nn.Conv2d(mid, mid, 3, stride, 1, groups=mid, bias=False)
        self.bn2 = nn.BatchNorm2d(mid)
        self.conv_pwl = nn.Conv2d(mid, out_ch, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(out_ch)
        self.act = nn.ReLU6(inplace=True)
        self.has_residual = stride == 1 and in_ch == out_ch

    def forward(self, x):
        shortcut = x
        x = self.act(self.bn1(self.conv_pw(x)))
        x = self.act(self.bn2(self.conv_dw(x)))
        x = self.bn3(self.conv_pwl(x))
        if self.has_residual:
            x = x + shortcut
        return x


# (expansion, channels, repeats, first-stride), mobilenetv2_100 stages 0-6
_STAGES = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class _MobileNetV2Features(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv_stem = nn.Conv2d(3, 32, 3, 2, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(32)
        self.act1 = nn.ReLU6(inplace=True)
        stages = []
        c_in = 32
        for t, c, n, s in _STAGES:
            blocks = []
            for i in range(n):
                stride = s if i == 0 else 1
                if t == 1:
                    blocks.append(DepthwiseSeparableConv(c_in, c, stride))
                else:
                    blocks.append(InvertedResidual(c_in, c, stride, t))
                c_in = c
            stages.append(nn.Sequential(*blocks))
        self.blocks = nn.Sequential(*stages)


def create_model(name, pretrained=False, features_only=False, **kw):
    assert name == "mobilenetv2_100", name
    return _MobileNetV2Features()
