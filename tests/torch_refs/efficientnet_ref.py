"""Hand-built torch replica of torchvision's EfficientNet (v1 + v2).

torchvision is not installed here; this replica reproduces its module tree
and state_dict key layout (features.{i}.{j}.block.{k}...) so converter +
numerics tests are hermetic. Structure follows
torchvision.models.efficientnet (Conv2dNormActivation, SqueezeExcitation,
MBConv, FusedMBConv) — the same graphs the reference builds via
models.py:9-124 and CVPR_code/multimodal_model.py:113-126.
"""

import math
from functools import partial

import torch
import torch.nn as nn


class Conv2dNormActivation(nn.Sequential):
    def __init__(self, c_in, c_out, kernel, stride=1, groups=1,
                 norm_layer=None, act=True):
        padding = (kernel - 1) // 2
        layers = [nn.Conv2d(c_in, c_out, kernel, stride, padding,
                            groups=groups, bias=False),
                  norm_layer(c_out)]
        if act:
            layers.append(nn.SiLU(inplace=True))
        super().__init__(*layers)


class SqueezeExcitation(nn.Module):
    def __init__(self, c_in, squeeze):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(c_in, squeeze, 1)
        self.fc2 = nn.Conv2d(squeeze, c_in, 1)
        self.activation = nn.SiLU(inplace=True)
        self.scale_activation = nn.Sigmoid()

    def forward(self, x):
        s = self.avgpool(x)
        s = self.activation(self.fc1(s))
        s = self.scale_activation(self.fc2(s))
        return x * s


class MBConv(nn.Module):
    def __init__(self, c_in, c_out, kernel, stride, expand, norm_layer, sd_prob):
        super().__init__()
        self.use_res = stride == 1 and c_in == c_out
        self.sd_prob = sd_prob
        exp = c_in * expand
        layers = []
        if expand != 1:
            layers.append(Conv2dNormActivation(c_in, exp, 1, norm_layer=norm_layer))
        layers.append(Conv2dNormActivation(exp, exp, kernel, stride,
                                           groups=exp, norm_layer=norm_layer))
        layers.append(SqueezeExcitation(exp, max(1, c_in // 4)))
        layers.append(Conv2dNormActivation(exp, c_out, 1, norm_layer=norm_layer,
                                           act=False))
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        out = self.block(x)
        if self.use_res:
            if self.training and self.sd_prob > 0:
                keep = 1 - self.sd_prob
                mask = torch.rand(x.shape[0], 1, 1, 1, device=x.device) < keep
                out = out * mask / keep
            out = out + x
        return out


class FusedMBConv(nn.Module):
    def __init__(self, c_in, c_out, kernel, stride, expand, norm_layer, sd_prob):
        super().__init__()
        self.use_res = stride == 1 and c_in == c_out
        self.sd_prob = sd_prob
        exp = c_in * expand
        layers = []
        if expand != 1:
            layers.append(Conv2dNormActivation(c_in, exp, kernel, stride,
                                               norm_layer=norm_layer))
            layers.append(Conv2dNormActivation(exp, c_out, 1,
                                               norm_layer=norm_layer, act=False))
        else:
            layers.append(Conv2dNormActivation(c_in, c_out, kernel, stride,
                                               norm_layer=norm_layer))
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        out = self.block(x)
        if self.use_res:
            out = out + x
        return out


class EfficientNetRef(nn.Module):
    """stages: list of (block_type, expand, kernel, stride, c_in, c_out, n)."""

    def __init__(self, stages, stem_out, head_out, norm_layer, num_classes=4,
                 dropout=0.2):
        super().__init__()
        total = sum(s[-1] for s in stages)
        features = [Conv2dNormActivation(3, stem_out, 3, 2, norm_layer=norm_layer)]
        idx = 0
        for btype, expand, kernel, stride, c_in, c_out, n in stages:
            blocks = []
            for j in range(n):
                cls = MBConv if btype == "mb" else FusedMBConv
                sd = 0.2 * idx / total
                blocks.append(cls(c_in if j == 0 else c_out, c_out, kernel,
                                  stride if j == 0 else 1, expand, norm_layer, sd))
                idx += 1
            features.append(nn.Sequential(*blocks))
        features.append(Conv2dNormActivation(stages[-1][5], head_out, 1,
                                             norm_layer=norm_layer))
        self.features = nn.Sequential(*features)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.classifier = nn.Sequential(nn.Dropout(dropout),
                                        nn.Linear(head_out, num_classes))

    def forward(self, x):
        x = self.features(x)
        x = self.avgpool(x)
        x = torch.flatten(x, 1)
        return self.classifier(x)


def make_efficientnet(*args, **kw):
    return EfficientNetRef(*args, **kw)


V2_NORM = partial(nn.BatchNorm2d, eps=1e-3)
V1_NORM = nn.BatchNorm2d  # eps 1e-5 (b5+ uses eps 1e-3 mom 0.01 — see configs)

# torchvision efficientnet_v2_s stage table
V2_S_STAGES = [
    ("fused", 1, 3, 1, 24, 24, 2),
    ("fused", 4, 3, 2, 24, 48, 4),
    ("fused", 4, 3, 2, 48, 64, 4),
    ("mb", 4, 3, 2, 64, 128, 6),
    ("mb", 6, 3, 1, 128, 160, 9),
    ("mb", 6, 3, 2, 160, 256, 15),
]

V2_M_STAGES = [
    ("fused", 1, 3, 1, 24, 24, 3),
    ("fused", 4, 3, 2, 24, 48, 5),
    ("fused", 4, 3, 2, 48, 80, 5),
    ("mb", 4, 3, 2, 80, 160, 7),
    ("mb", 6, 3, 1, 160, 176, 14),
    ("mb", 6, 3, 2, 176, 304, 18),
    ("mb", 6, 3, 1, 304, 512, 5),
]


def _make_divisible(v, divisor=8):
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


def v1_stages(width, depth):
    base = [(1, 3, 1, 32, 16, 1), (6, 3, 2, 16, 24, 2), (6, 5, 2, 24, 40, 2),
            (6, 3, 2, 40, 80, 3), (6, 5, 1, 80, 112, 3), (6, 5, 2, 112, 192, 4),
            (6, 3, 1, 192, 320, 1)]
    out = []
    for expand, k, s, c_in, c_out, n in base:
        out.append(("mb", expand, k, s, _make_divisible(c_in * width),
                    _make_divisible(c_out * width), math.ceil(n * depth)))
    return out
