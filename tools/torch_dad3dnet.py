"""PyTorch mirror of the reference DAD-3DNet, with state-dict keys identical
to the reference's (pytorchcv resnet50 backbone + FlameRegression assembly).

Purpose: numerical validation of the torch->flax weight port without network
access. The module tree reproduces the reference naming exactly so that a
state dict saved from the real reference model (or this mirror) maps
one-to-one through tools/port_torch_weights.py's explicit name map:

  - encoder:  pytorchcv ``resnet50(...).features`` layout —
    ``encoder.model.init_block.conv.{conv,bn}``,
    ``encoder.model.stage{S}.unit{U}.body.conv{1,2,3}.{conv,bn}`` and
    ``...unit1.identity_conv.{conv,bn}`` (reference wraps it at
    /root/reference/model_training/model/encoders.py:20-31).
  - bifpn:    /root/reference/model_training/model/bifpn.py:134-150
    (``bifpn.p3..p6`` convs, ``bifpn.p7.{conv,bn}``,
    ``bifpn.bifpn.{0,1}.{p*_td,p*_out}.{depthwise,pointwise,bn}`` + w1/w2).
  - assembly: /root/reference/model_training/model/flame_regression.py:62-85
    (``head.heatmap``, ``fusion_layer.conv1x1``,
    ``{shape,pose,landmarks}.logit_image.{0,3}``).

Only parameterized modules matter for state-dict parity; activation modules
carry no tensors and are free-form here.
"""

from __future__ import annotations

from collections import OrderedDict

import torch
import torch.nn as nn
import torch.nn.functional as F

RESNET50_UNITS = (3, 4, 6, 3)
RESNET50_CHANNELS = (256, 512, 1024, 2048)
MOBILENET_UNITS = (1, 2, 2, 6, 2)
MOBILENET_CHANNELS = (64, 128, 256, 512, 1024)


def _conv_bn(in_c: int, out_c: int, k: int, stride: int = 1, pad: int = 0) -> nn.Module:
    """pytorchcv ConvBlock: children named ``conv`` and ``bn``."""
    m = nn.Module()
    m.conv = nn.Conv2d(in_c, out_c, k, stride=stride, padding=pad, bias=False)
    m.bn = nn.BatchNorm2d(out_c)
    return m


def _run_conv_bn(m: nn.Module, x: torch.Tensor, relu: bool = True) -> torch.Tensor:
    x = m.bn(m.conv(x))
    return F.relu(x) if relu else x


class ResUnit(nn.Module):
    """pytorchcv ResUnit (bottleneck, conv1_stride=False: stride on conv2)."""

    def __init__(self, in_c: int, out_c: int, stride: int):
        super().__init__()
        mid = out_c // 4
        self.body = nn.Module()
        self.body.conv1 = _conv_bn(in_c, mid, 1)
        self.body.conv2 = _conv_bn(mid, mid, 3, stride=stride, pad=1)
        self.body.conv3 = _conv_bn(mid, out_c, 1)
        self.resize_identity = stride != 1 or in_c != out_c
        if self.resize_identity:
            self.identity_conv = _conv_bn(in_c, out_c, 1, stride=stride)

    def forward(self, x):
        idn = _run_conv_bn(self.identity_conv, x, relu=False) if self.resize_identity else x
        y = _run_conv_bn(self.body.conv1, x)
        y = _run_conv_bn(self.body.conv2, y)
        y = _run_conv_bn(self.body.conv3, y, relu=False)
        return F.relu(y + idn)


class ResInitBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv = _conv_bn(3, 64, 7, stride=2, pad=3)
        self.pool = nn.MaxPool2d(3, stride=2, padding=1)

    def forward(self, x):
        return self.pool(_run_conv_bn(self.conv, x))


def resnet50_features() -> nn.Module:
    """pytorchcv ``resnet50().features`` minus the final avgpool."""
    feats = nn.Module()
    feats.init_block = ResInitBlock()
    in_c = 64
    for s, (units, out_c) in enumerate(zip(RESNET50_UNITS, RESNET50_CHANNELS), start=1):
        stage = nn.Sequential(
            OrderedDict(
                (
                    f"unit{u + 1}",
                    ResUnit(in_c if u == 0 else out_c, out_c, stride=(2 if (s > 1 and u == 0) else 1)),
                )
                for u in range(units)
            )
        )
        setattr(feats, f"stage{s}", stage)
        in_c = out_c
    return feats


class StagedEncoder(nn.Module):
    """Reference StagedEncoder: five stages, init block separate
    (encoders.py:46-48)."""

    def __init__(self):
        super().__init__()
        self.model = resnet50_features()
        self.stages = [
            self.model.init_block,
            self.model.stage1,
            self.model.stage2,
            self.model.stage3,
            self.model.stage4,
        ]
        self.encoder_channels = {
            "layer0": 2048, "layer1": 1024, "layer2": 512, "layer3": 256, "layer4": 64,
        }


class ConvBlock(nn.Module):
    """pytorchcv ConvBlock WITH forward (conv+bn+relu) — the mobilenet
    init block."""

    def __init__(self, in_c: int, out_c: int, k: int, stride: int = 1, pad: int = 0):
        super().__init__()
        self.conv = nn.Conv2d(in_c, out_c, k, stride=stride, padding=pad, bias=False)
        self.bn = nn.BatchNorm2d(out_c)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class DwsConvBlock(nn.Module):
    """pytorchcv DwsConvBlock: children ``dw_conv`` and ``pw_conv``, each a
    ConvBlock (depthwise 3x3 then pointwise 1x1, BN+ReLU after each)."""

    def __init__(self, in_c: int, out_c: int, stride: int):
        super().__init__()
        self.dw_conv = nn.Module()
        self.dw_conv.conv = nn.Conv2d(
            in_c, in_c, 3, stride=stride, padding=1, groups=in_c, bias=False
        )
        self.dw_conv.bn = nn.BatchNorm2d(in_c)
        self.pw_conv = nn.Module()
        self.pw_conv.conv = nn.Conv2d(in_c, out_c, 1, bias=False)
        self.pw_conv.bn = nn.BatchNorm2d(out_c)

    def forward(self, x):
        x = F.relu(self.dw_conv.bn(self.dw_conv.conv(x)))
        return F.relu(self.pw_conv.bn(self.pw_conv.conv(x)))


def mobilenet_features() -> nn.Module:
    """pytorchcv ``mobilenet_w1().features`` minus the final avgpool
    (init_block 3x3/s2 -> 32ch, then 5 depthwise-separable stages)."""
    feats = nn.Module()
    feats.init_block = ConvBlock(3, 32, 3, stride=2, pad=1)
    in_c = 32
    for s, (units, out_c) in enumerate(zip(MOBILENET_UNITS, MOBILENET_CHANNELS), start=1):
        stage = nn.Sequential(
            OrderedDict(
                (
                    f"unit{u + 1}",
                    DwsConvBlock(
                        in_c if u == 0 else out_c,
                        out_c,
                        stride=(2 if (s > 1 and u == 0) else 1),
                    ),
                )
                for u in range(units)
            )
        )
        setattr(feats, f"stage{s}", stage)
        in_c = out_c
    return feats


class MobileEncoder(nn.Module):
    """Reference (non-staged) Encoder for mobilenet_w1: stage 0 is
    init_block + stage1 (encoders.py:25-31, encoder_mapping:52-54)."""

    def __init__(self):
        super().__init__()
        self.model = mobilenet_features()
        self.stages = [
            nn.Sequential(self.model.init_block, self.model.stage1),
            self.model.stage2,
            self.model.stage3,
            self.model.stage4,
            self.model.stage5,
        ]
        self.encoder_channels = {
            "layer0": 1024, "layer1": 512, "layer2": 256, "layer3": 128, "layer4": 64,
        }


class DepthwiseConvBlock(nn.Module):
    def __init__(self, c: int):
        super().__init__()
        self.depthwise = nn.Conv2d(c, c, 1, groups=c, bias=False)
        self.pointwise = nn.Conv2d(c, c, 1, bias=False)
        self.bn = nn.BatchNorm2d(c, momentum=0.9997, eps=4e-5)

    def forward(self, x):
        return F.relu(self.bn(self.pointwise(self.depthwise(x))))


class TorchBiFPNBlock(nn.Module):
    def __init__(self, c: int, epsilon: float = 1e-4):
        super().__init__()
        self.epsilon = epsilon
        for node in ("p3_td", "p4_td", "p5_td", "p6_td", "p4_out", "p5_out", "p6_out", "p7_out"):
            setattr(self, node, DepthwiseConvBlock(c))
        self.w1 = nn.Parameter(torch.ones(2, 4))
        self.w2 = nn.Parameter(torch.ones(3, 4))

    def forward(self, feats):
        p3, p4, p5, p6, p7 = feats
        w1 = F.relu(self.w1)
        w1 = w1 / w1.sum(dim=0) + self.epsilon
        w2 = F.relu(self.w2)
        w2 = w2 / w2.sum(dim=0) + self.epsilon

        down = lambda t, ref: F.interpolate(t, size=ref.shape[2:])
        p6t = self.p6_td(w1[0, 0] * p6 + w1[1, 0] * down(p7, p6))
        p5t = self.p5_td(w1[0, 1] * p5 + w1[1, 1] * down(p6t, p5))
        p4t = self.p4_td(w1[0, 2] * p4 + w1[1, 2] * down(p5t, p4))
        p3o = self.p3_td(w1[0, 3] * p3 + w1[1, 3] * down(p4t, p3))
        p4o = self.p4_out(w2[0, 0] * p4 + w2[1, 0] * p4t + w2[2, 0] * down(p3o, p4))
        p5o = self.p5_out(w2[0, 1] * p5 + w2[1, 1] * p5t + w2[2, 1] * down(p4o, p5))
        p6o = self.p6_out(w2[0, 2] * p6 + w2[1, 2] * p6t + w2[2, 2] * down(p5o, p6))
        p7o = self.p7_out(w2[0, 3] * p7 + w2[1, 3] * p7t_identity(p7) + w2[2, 3] * down(p6o, p7))
        return [p3o, p4o, p5o, p6o, p7o]


def p7t_identity(p7):
    # reference: p7_td = p7_x (bifpn.py:110); kept as a function for clarity
    return p7


class TorchBiFPN(nn.Module):
    def __init__(self, sizes, feature_size: int):
        super().__init__()
        self.p3 = nn.Conv2d(sizes[0], feature_size, 1)
        self.p4 = nn.Conv2d(sizes[1], feature_size, 1)
        self.p5 = nn.Conv2d(sizes[2], feature_size, 1)
        self.p6 = nn.Conv2d(sizes[2], feature_size, 3, stride=2, padding=1)
        self.p7 = nn.Module()
        self.p7.conv = nn.Conv2d(feature_size, feature_size, 3, stride=2, padding=1)
        self.p7.bn = nn.BatchNorm2d(feature_size, momentum=0.9997, eps=4e-5)
        self.bifpn = nn.Sequential(TorchBiFPNBlock(feature_size), TorchBiFPNBlock(feature_size))

    def forward(self, inputs):
        c2, c3, c4 = inputs
        p6 = self.p6(c4)
        feats = [self.p3(c2), self.p4(c3), self.p5(c4), p6, F.relu(self.p7.bn(self.p7.conv(p6)))]
        for block in self.bifpn:
            feats = block(feats)
        return feats


class TorchClassificationHead(nn.Module):
    def __init__(self, in_c: int, num_classes: int, linear_size: int = 512):
        super().__init__()
        self.logit_image = nn.Sequential(
            nn.Linear(in_c, linear_size), nn.ReLU(), nn.Dropout(0.3), nn.Linear(linear_size, num_classes)
        )

    def forward(self, x):
        return self.logit_image(F.adaptive_avg_pool2d(x, 1).flatten(1))


class TorchDAD3DNet(nn.Module):
    """Mirror of FlameRegression (flame_regression.py:62-106) for both
    reference backbones (resnet50 staged / mobilenet_w1 non-staged)."""

    def __init__(
        self,
        num_filters: int = 256,
        num_classes: int = 68,
        limit_value: float = 3.0,
        backbone: str = "resnet50",
    ):
        super().__init__()
        if backbone == "resnet50":
            self.encoder = StagedEncoder()
        elif backbone == "mobilenet_w1":
            self.encoder = MobileEncoder()
        else:
            raise KeyError(backbone)
        ch = self.encoder.encoder_channels
        self.bifpn = TorchBiFPN([ch["layer3"], ch["layer2"], ch["layer1"]], num_filters)
        self.head = nn.Module()
        self.head.heatmap = nn.Conv2d(num_filters, num_classes, 3, padding=1)
        self.fusion_layer = nn.Module()
        self.fusion_layer.conv1x1 = nn.Conv2d(num_filters + num_classes + ch["layer1"], ch["layer1"], 1)
        self.shape = TorchClassificationHead(ch["layer0"], 403)
        self.pose = TorchClassificationHead(ch["layer0"], 10)
        self.landmarks = TorchClassificationHead(ch["layer0"], num_classes * 2)
        self.limit_value = limit_value
        self.num_classes = num_classes

    def forward(self, x):
        feats = []
        for stage in self.encoder.stages[:4]:
            x = stage(x)
            feats.append(x)
        pyramid = self.bifpn(feats[1:])
        heatmap = self.head.heatmap(pyramid[0])

        hm = torch.sigmoid(
            F.interpolate(heatmap, size=x.shape[2:], mode="bilinear", align_corners=True)
        )
        fmap = self.fusion_layer.conv1x1(torch.cat([x, hm, pyramid[2]], dim=1)) * x
        fmap = self.encoder.stages[4](fmap)

        shape = torch.tanh(self.shape(fmap)) * self.limit_value
        pose = self.pose(fmap)
        lm = F.relu(self.landmarks(fmap)).reshape(x.shape[0], self.num_classes, 2)
        return {"heatmap": heatmap, "params_3dmm": torch.cat([shape, pose], dim=1), "landmarks": lm}


def randomize_bn_stats(model: nn.Module, seed: int = 0) -> None:
    """Give every BN layer nontrivial running stats so a port test exercises
    the stats lanes (fresh BN stats are all-zero mean / unit var, which would
    hide mean<->var swaps)."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75)
            m.weight.data.copy_(torch.rand(m.weight.shape, generator=g) * 0.5 + 0.75)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
