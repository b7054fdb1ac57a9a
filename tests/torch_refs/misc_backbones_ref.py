"""Torch replicas of torchvision ResNet / MobileNetV3-L / ShuffleNetV2 /
ConvNeXt with torchvision state_dict key layouts (torchvision itself is not
installed in this image). Used for converter + numerics parity tests."""

import torch
import torch.nn as nn


# ---------------------------------------------------------------- ResNet
class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, c_in, c_mid, stride=1, down=False):
        super().__init__()
        c_out = c_mid * self.expansion
        self.conv1 = nn.Conv2d(c_in, c_mid, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(c_mid)
        self.conv2 = nn.Conv2d(c_mid, c_out, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(c_out)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = nn.Sequential(
            nn.Conv2d(c_in, c_out, 1, stride, bias=False),
            nn.BatchNorm2d(c_out)) if down else None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idt)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, c_in, c_mid, stride=1, down=False):
        super().__init__()
        c_out = c_mid * self.expansion
        self.conv1 = nn.Conv2d(c_in, c_mid, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(c_mid)
        self.conv2 = nn.Conv2d(c_mid, c_mid, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(c_mid)
        self.conv3 = nn.Conv2d(c_mid, c_out, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(c_out)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = nn.Sequential(
            nn.Conv2d(c_in, c_out, 1, stride, bias=False),
            nn.BatchNorm2d(c_out)) if down else None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idt)


class ResNetRef(nn.Module):
    def __init__(self, block, layers, num_classes=4):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        c_in = 64
        for si, n in enumerate(layers):
            c_mid = 64 * 2 ** si
            blocks = []
            for j in range(n):
                stride = 2 if (si > 0 and j == 0) else 1
                down = j == 0 and (si > 0 or block.expansion != 1)
                blocks.append(block(c_in if j == 0 else c_mid * block.expansion,
                                    c_mid, stride, down))
            setattr(self, f"layer{si + 1}", nn.Sequential(*blocks))
            c_in = c_mid * block.expansion
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(c_in, num_classes)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(1, 5):
            x = getattr(self, f"layer{i}")(x)
        return self.fc(torch.flatten(self.avgpool(x), 1))


# ------------------------------------------------------- MobileNetV3-Large
class SqueezeExcitationHS(nn.Module):
    def __init__(self, c_in, squeeze):
        super().__init__()
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc1 = nn.Conv2d(c_in, squeeze, 1)
        self.fc2 = nn.Conv2d(squeeze, c_in, 1)
        self.activation = nn.ReLU(inplace=True)
        self.scale_activation = nn.Hardsigmoid()

    def forward(self, x):
        s = self.avgpool(x)
        s = self.activation(self.fc1(s))
        return x * self.scale_activation(self.fc2(s))


def _cna(c_in, c_out, k, stride=1, groups=1, act=nn.Hardswish):
    norm = nn.BatchNorm2d(c_out, eps=1e-3, momentum=0.01)
    layers = [nn.Conv2d(c_in, c_out, k, stride, (k - 1) // 2, groups=groups,
                        bias=False), norm]
    if act is not None:
        layers.append(act(inplace=True))
    return nn.Sequential(*layers)


def _make_div(v, d=8):
    n = max(d, int(v + d / 2) // d * d)
    return n + d if n < 0.9 * v else n


class InvertedResidual(nn.Module):
    def __init__(self, c_in, k, exp, out, se, hs, stride):
        super().__init__()
        self.use_res = stride == 1 and c_in == out
        act = nn.Hardswish if hs else nn.ReLU
        layers = []
        if exp != c_in:
            layers.append(_cna(c_in, exp, 1, act=act))
        layers.append(_cna(exp, exp, k, stride, groups=exp, act=act))
        if se:
            layers.append(SqueezeExcitationHS(exp, _make_div(exp // 4)))
        layers.append(_cna(exp, out, 1, act=None))
        self.block = nn.Sequential(*layers)

    def forward(self, x):
        y = self.block(x)
        return x + y if self.use_res else y


MBV3_ROWS = [
    (3, 16, 16, False, False, 1), (3, 64, 24, False, False, 2),
    (3, 72, 24, False, False, 1), (5, 72, 40, True, False, 2),
    (5, 120, 40, True, False, 1), (5, 120, 40, True, False, 1),
    (3, 240, 80, False, True, 2), (3, 200, 80, False, True, 1),
    (3, 184, 80, False, True, 1), (3, 184, 80, False, True, 1),
    (3, 480, 112, True, True, 1), (3, 672, 112, True, True, 1),
    (5, 672, 160, True, True, 2), (5, 960, 160, True, True, 1),
    (5, 960, 160, True, True, 1),
]


class MobileNetV3Ref(nn.Module):
    def __init__(self, num_classes=4):
        super().__init__()
        feats = [_cna(3, 16, 3, 2)]
        c_in = 16
        for (k, exp, out, se, hs, stride) in MBV3_ROWS:
            feats.append(InvertedResidual(c_in, k, exp, out, se, hs, stride))
            c_in = out
        feats.append(_cna(c_in, 960, 1))
        self.features = nn.Sequential(*feats)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.classifier = nn.Sequential(
            nn.Linear(960, 1280), nn.Hardswish(inplace=True),
            nn.Dropout(0.2), nn.Linear(1280, num_classes))

    def forward(self, x):
        x = torch.flatten(self.avgpool(self.features(x)), 1)
        return self.classifier(x)


# --------------------------------------------------------- ShuffleNetV2
def _shuffle(x, groups=2):
    b, c, h, w = x.shape
    return x.view(b, groups, c // groups, h, w).transpose(1, 2).reshape(b, c, h, w)


class ShuffleUnit(nn.Module):
    def __init__(self, c_in, c_out, stride):
        super().__init__()
        self.stride = stride
        half = c_out // 2
        if stride == 2:
            self.branch1 = nn.Sequential(
                nn.Conv2d(c_in, c_in, 3, 2, 1, groups=c_in, bias=False),
                nn.BatchNorm2d(c_in),
                nn.Conv2d(c_in, half, 1, bias=False),
                nn.BatchNorm2d(half), nn.ReLU(inplace=True))
            b2_in = c_in
        else:
            self.branch1 = nn.Sequential()
            b2_in = half
        self.branch2 = nn.Sequential(
            nn.Conv2d(b2_in, half, 1, bias=False), nn.BatchNorm2d(half),
            nn.ReLU(inplace=True),
            nn.Conv2d(half, half, 3, stride, 1, groups=half, bias=False),
            nn.BatchNorm2d(half),
            nn.Conv2d(half, half, 1, bias=False), nn.BatchNorm2d(half),
            nn.ReLU(inplace=True))

    def forward(self, x):
        if self.stride == 2:
            out = torch.cat([self.branch1(x), self.branch2(x)], 1)
        else:
            x1, x2 = x.chunk(2, dim=1)
            out = torch.cat([x1, self.branch2(x2)], 1)
        return _shuffle(out)


class ShuffleNetV2Ref(nn.Module):
    def __init__(self, num_classes=4):
        super().__init__()
        self.conv1 = nn.Sequential(nn.Conv2d(3, 24, 3, 2, 1, bias=False),
                                   nn.BatchNorm2d(24), nn.ReLU(inplace=True))
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        c_in = 24
        for si, (c_out, n) in enumerate(zip((244, 488, 976), (4, 8, 4))):
            units = [ShuffleUnit(c_in, c_out, 2)]
            units += [ShuffleUnit(c_out, c_out, 1) for _ in range(n - 1)]
            setattr(self, f"stage{si + 2}", nn.Sequential(*units))
            c_in = c_out
        self.conv5 = nn.Sequential(nn.Conv2d(c_in, 2048, 1, bias=False),
                                   nn.BatchNorm2d(2048), nn.ReLU(inplace=True))
        self.fc = nn.Linear(2048, num_classes)

    def forward(self, x):
        x = self.maxpool(self.conv1(x))
        x = self.stage2(x)
        x = self.stage3(x)
        x = self.stage4(x)
        x = self.conv5(x)
        return self.fc(x.mean([2, 3]))


# ------------------------------------------------------------- ConvNeXt
class LayerNorm2d(nn.LayerNorm):
    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class CNBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.block = nn.Sequential(
            nn.Conv2d(dim, dim, 7, padding=3, groups=dim, bias=True),
            Permute([0, 2, 3, 1]),
            nn.LayerNorm(dim, eps=1e-6),
            nn.Linear(dim, 4 * dim),
            nn.GELU(),
            nn.Linear(4 * dim, dim),
            Permute([0, 3, 1, 2]),
        )
        self.layer_scale = nn.Parameter(torch.full((dim, 1, 1), 1e-6))

    def forward(self, x):
        return x + self.layer_scale * self.block(x)


class Permute(nn.Module):
    def __init__(self, dims):
        super().__init__()
        self.dims = dims

    def forward(self, x):
        return x.permute(self.dims)


class ConvNeXtRef(nn.Module):
    def __init__(self, widths=(128, 256, 512, 1024), depths=(3, 3, 27, 3),
                 num_classes=4):
        super().__init__()
        feats = [nn.Sequential(nn.Conv2d(3, widths[0], 4, 4),
                               LayerNorm2d(widths[0], eps=1e-6))]
        for si, (w, d) in enumerate(zip(widths, depths)):
            feats.append(nn.Sequential(*[CNBlock(w) for _ in range(d)]))
            if si < 3:
                feats.append(nn.Sequential(
                    LayerNorm2d(w, eps=1e-6),
                    nn.Conv2d(w, widths[si + 1], 2, 2)))
        self.features = nn.Sequential(*feats)
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.classifier = nn.Sequential(LayerNorm2d(widths[-1], eps=1e-6),
                                        nn.Flatten(1),
                                        nn.Linear(widths[-1], num_classes))

    def forward(self, x):
        return self.classifier(self.avgpool(self.features(x)))
