"""Test-only PyTorch reference architectures.

These replicate the well-known public layouts (torchvision ResNet/VGG, Cadene
InceptionV4) whose state-dict key names the zoo checkpoints use, so parity
tests can validate the torch->flax converter and the flax forward math without
any network access or torchvision dependency.
"""

from __future__ import annotations

import torch
import torch.nn as nn


# --------------------------- torchvision-style ResNet ---------------------------
class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class ResNet(nn.Module):
    def __init__(self, block, layers, num_classes):
        super().__init__()
        self.inplanes = 64
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], 2)
        self.layer3 = self._make_layer(block, 256, layers[2], 2)
        self.layer4 = self._make_layer(block, 512, layers[3], 2)
        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512 * block.expansion, num_classes)

    def _make_layer(self, block, planes, blocks, stride=1):
        downsample = None
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride, bias=False),
                nn.BatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def torch_resnet34(num_classes):
    return ResNet(BasicBlock, [3, 4, 6, 3], num_classes)


def torch_resnet50(num_classes):
    return ResNet(Bottleneck, [3, 4, 6, 3], num_classes)


# ------------------------------- PreAct ResNet ----------------------------------
class PreActBlock(nn.Module):
    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.bn1 = nn.BatchNorm2d(inplanes)
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.downsample = None
        if stride != 1 or inplanes != planes:
            self.downsample = nn.Sequential(nn.Conv2d(inplanes, planes, 1, stride, bias=False))

    def forward(self, x):
        pre = torch.relu(self.bn1(x))
        identity = self.downsample(pre) if self.downsample is not None else x
        out = self.conv1(pre)
        out = self.conv2(torch.relu(self.bn2(out)))
        return out + identity


class PreActResNet(nn.Module):
    def __init__(self, layers, num_classes):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        inplanes = 64
        for li, blocks in enumerate(layers):
            stride = 1 if li == 0 else 2
            planes = 64 * (2**li)
            seq = []
            for bi in range(blocks):
                seq.append(PreActBlock(inplanes, planes, stride if bi == 0 else 1))
                inplanes = planes
            setattr(self, f"layer{li + 1}", nn.Sequential(*seq))
        self.bn_final = nn.BatchNorm2d(inplanes)
        self.fc = nn.Linear(inplanes, num_classes)

    def forward(self, x):
        x = self.maxpool(self.conv1(x))
        x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
        x = torch.relu(self.bn_final(x))
        x = x.mean(dim=(2, 3))
        return self.fc(x)


def torch_preactresnet34(num_classes):
    return PreActResNet([3, 4, 6, 3], num_classes)


# ----------------------------------- VGG16 --------------------------------------
class VGG16(nn.Module):
    def __init__(self, num_classes):
        super().__init__()
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M", 512, 512, 512, "M"]
        layers = []
        in_ch = 3
        for v in cfg:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(in_ch, v, 3, padding=1), nn.ReLU(inplace=True)]
                in_ch = v
        self.features = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d((7, 7))
        self.classifier = nn.Sequential(
            nn.Linear(512 * 7 * 7, 4096),
            nn.ReLU(True),
            nn.Dropout(),
            nn.Linear(4096, 4096),
            nn.ReLU(True),
            nn.Dropout(),
            nn.Linear(4096, num_classes),
        )

    def forward(self, x):
        x = self.features(x)
        x = torch.flatten(self.avgpool(x), 1)
        return self.classifier(x)


def torch_vgg16(num_classes):
    return VGG16(num_classes)


# -------------------------------- InceptionV4 -----------------------------------
class BasicConv2d(nn.Module):
    def __init__(self, in_planes, out_planes, kernel_size, stride=1, padding=0, bn=True):
        super().__init__()
        self.conv = nn.Conv2d(in_planes, out_planes, kernel_size, stride, padding, bias=not bn)
        self.bn = nn.BatchNorm2d(out_planes, eps=0.001) if bn else None
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        x = self.conv(x)
        if self.bn is not None:
            x = self.bn(x)
        return self.relu(x)


class Mixed3a(nn.Module):
    def __init__(self, bn=True):
        super().__init__()
        self.maxpool = nn.MaxPool2d(3, 2)
        self.conv = BasicConv2d(64, 96, 3, 2, bn=bn)

    def forward(self, x):
        return torch.cat((self.maxpool(x), self.conv(x)), 1)


class Mixed4a(nn.Module):
    def __init__(self, bn=True):
        super().__init__()
        self.branch0 = nn.Sequential(
            BasicConv2d(160, 64, 1, bn=bn), BasicConv2d(64, 96, 3, bn=bn)
        )
        self.branch1 = nn.Sequential(
            BasicConv2d(160, 64, 1, bn=bn),
            BasicConv2d(64, 64, (1, 7), padding=(0, 3), bn=bn),
            BasicConv2d(64, 64, (7, 1), padding=(3, 0), bn=bn),
            BasicConv2d(64, 96, 3, bn=bn),
        )

    def forward(self, x):
        return torch.cat((self.branch0(x), self.branch1(x)), 1)


class Mixed5a(nn.Module):
    def __init__(self, bn=True):
        super().__init__()
        self.conv = BasicConv2d(192, 192, 3, 2, bn=bn)
        self.maxpool = nn.MaxPool2d(3, 2)

    def forward(self, x):
        return torch.cat((self.conv(x), self.maxpool(x)), 1)


class InceptionA(nn.Module):
    def __init__(self, bn=True):
        super().__init__()
        self.branch0 = BasicConv2d(384, 96, 1, bn=bn)
        self.branch1 = nn.Sequential(
            BasicConv2d(384, 64, 1, bn=bn), BasicConv2d(64, 96, 3, padding=1, bn=bn)
        )
        self.branch2 = nn.Sequential(
            BasicConv2d(384, 64, 1, bn=bn),
            BasicConv2d(64, 96, 3, padding=1, bn=bn),
            BasicConv2d(96, 96, 3, padding=1, bn=bn),
        )
        self.branch3 = nn.Sequential(
            nn.AvgPool2d(3, 1, 1, count_include_pad=False), BasicConv2d(384, 96, 1, bn=bn)
        )

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x), self.branch2(x), self.branch3(x)], 1)


class ReductionA(nn.Module):
    def __init__(self, bn=True):
        super().__init__()
        self.branch0 = BasicConv2d(384, 384, 3, 2, bn=bn)
        self.branch1 = nn.Sequential(
            BasicConv2d(384, 192, 1, bn=bn),
            BasicConv2d(192, 224, 3, padding=1, bn=bn),
            BasicConv2d(224, 256, 3, 2, bn=bn),
        )
        self.branch2 = nn.MaxPool2d(3, 2)

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x), self.branch2(x)], 1)


class InceptionB(nn.Module):
    def __init__(self, bn=True):
        super().__init__()
        self.branch0 = BasicConv2d(1024, 384, 1, bn=bn)
        self.branch1 = nn.Sequential(
            BasicConv2d(1024, 192, 1, bn=bn),
            BasicConv2d(192, 224, (1, 7), padding=(0, 3), bn=bn),
            BasicConv2d(224, 256, (7, 1), padding=(3, 0), bn=bn),
        )
        self.branch2 = nn.Sequential(
            BasicConv2d(1024, 192, 1, bn=bn),
            BasicConv2d(192, 192, (7, 1), padding=(3, 0), bn=bn),
            BasicConv2d(192, 224, (1, 7), padding=(0, 3), bn=bn),
            BasicConv2d(224, 224, (7, 1), padding=(3, 0), bn=bn),
            BasicConv2d(224, 256, (1, 7), padding=(0, 3), bn=bn),
        )
        self.branch3 = nn.Sequential(
            nn.AvgPool2d(3, 1, 1, count_include_pad=False), BasicConv2d(1024, 128, 1, bn=bn)
        )

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x), self.branch2(x), self.branch3(x)], 1)


class ReductionB(nn.Module):
    def __init__(self, bn=True):
        super().__init__()
        self.branch0 = nn.Sequential(
            BasicConv2d(1024, 192, 1, bn=bn), BasicConv2d(192, 192, 3, 2, bn=bn)
        )
        self.branch1 = nn.Sequential(
            BasicConv2d(1024, 256, 1, bn=bn),
            BasicConv2d(256, 256, (1, 7), padding=(0, 3), bn=bn),
            BasicConv2d(256, 320, (7, 1), padding=(3, 0), bn=bn),
            BasicConv2d(320, 320, 3, 2, bn=bn),
        )
        self.branch2 = nn.MaxPool2d(3, 2)

    def forward(self, x):
        return torch.cat([self.branch0(x), self.branch1(x), self.branch2(x)], 1)


class InceptionC(nn.Module):
    def __init__(self, bn=True):
        super().__init__()
        self.branch0 = BasicConv2d(1536, 256, 1, bn=bn)
        self.branch1_0 = BasicConv2d(1536, 384, 1, bn=bn)
        self.branch1_1a = BasicConv2d(384, 256, (1, 3), padding=(0, 1), bn=bn)
        self.branch1_1b = BasicConv2d(384, 256, (3, 1), padding=(1, 0), bn=bn)
        self.branch2_0 = BasicConv2d(1536, 384, 1, bn=bn)
        self.branch2_1 = BasicConv2d(384, 448, (3, 1), padding=(1, 0), bn=bn)
        self.branch2_2 = BasicConv2d(448, 512, (1, 3), padding=(0, 1), bn=bn)
        self.branch2_3a = BasicConv2d(512, 256, (1, 3), padding=(0, 1), bn=bn)
        self.branch2_3b = BasicConv2d(512, 256, (3, 1), padding=(1, 0), bn=bn)
        self.branch3 = nn.Sequential(
            nn.AvgPool2d(3, 1, 1, count_include_pad=False), BasicConv2d(1536, 256, 1, bn=bn)
        )

    def forward(self, x):
        x0 = self.branch0(x)
        x1_0 = self.branch1_0(x)
        x1 = torch.cat((self.branch1_1a(x1_0), self.branch1_1b(x1_0)), 1)
        x2_0 = self.branch2_0(x)
        x2_2 = self.branch2_2(self.branch2_1(x2_0))
        x2 = torch.cat((self.branch2_3a(x2_2), self.branch2_3b(x2_2)), 1)
        return torch.cat([x0, x1, x2, self.branch3(x)], 1)


class InceptionV4(nn.Module):
    def __init__(self, num_classes, bn=True):
        super().__init__()
        self.features = nn.Sequential(
            BasicConv2d(3, 32, 3, 2, bn=bn),
            BasicConv2d(32, 32, 3, bn=bn),
            BasicConv2d(32, 64, 3, padding=1, bn=bn),
            Mixed3a(bn),
            Mixed4a(bn),
            Mixed5a(bn),
            InceptionA(bn), InceptionA(bn), InceptionA(bn), InceptionA(bn),
            ReductionA(bn),
            InceptionB(bn), InceptionB(bn), InceptionB(bn), InceptionB(bn),
            InceptionB(bn), InceptionB(bn), InceptionB(bn),
            ReductionB(bn),
            InceptionC(bn), InceptionC(bn), InceptionC(bn),
        )
        self.avg_pool = nn.AdaptiveAvgPool2d((1, 1))
        self.last_linear = nn.Linear(1536, num_classes)

    def forward(self, x):
        x = self.features(x)
        x = torch.flatten(self.avg_pool(x), 1)
        return self.last_linear(x)


def torch_inceptionv4(num_classes, bn=True):
    return InceptionV4(num_classes, bn=bn)
