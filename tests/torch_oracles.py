"""Compact torch oracle models for converter verification.

These mirror the torchvision / reference module graphs (same state_dict key
names) so tests can check: torch forward == flax forward with converted
weights.  Written independently for testing; not part of the framework.
"""

import torch
import torch.nn as nn


# ----------------------------- ResNet (torchvision-style) -----------------

class TBasic(nn.Module):
    expansion = 1

    def __init__(self, cin, w, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, w, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(w)
        self.conv2 = nn.Conv2d(w, w, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(w)
        self.downsample = None
        if stride != 1 or cin != w:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, w, 1, stride, bias=False), nn.BatchNorm2d(w))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        o = torch.relu(self.bn1(self.conv1(x)))
        o = self.bn2(self.conv2(o))
        return torch.relu(o + idt)


class TBottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, w, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, w, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(w)
        self.conv2 = nn.Conv2d(w, w, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(w)
        self.conv3 = nn.Conv2d(w, w * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(w * 4)
        self.downsample = None
        if stride != 1 or cin != w * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, w * 4, 1, stride, bias=False), nn.BatchNorm2d(w * 4))

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        o = torch.relu(self.bn1(self.conv1(x)))
        o = torch.relu(self.bn2(self.conv2(o)))
        o = self.bn3(self.conv3(o))
        return torch.relu(o + idt)


def _make_stage(block, cin, w, n, stride):
    layers = [block(cin, w, stride)]
    for _ in range(n - 1):
        layers.append(block(w * block.expansion, w))
    return nn.Sequential(*layers)


class TResNet(nn.Module):
    def __init__(self, depth, num_classes=3, adapted_head=True):
        super().__init__()
        block = TBasic if depth == 18 else TBottleneck
        sizes = (2, 2, 2, 2) if depth == 18 else (3, 4, 6, 3)
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU()
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, (n, w) in enumerate(zip(sizes, (64, 128, 256, 512))):
            stage = _make_stage(block, cin, w, n, 1 if i == 0 else 2)
            setattr(self, f"layer{i + 1}", stage)
            cin = w * block.expansion
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        if adapted_head:
            self.fc = nn.Sequential(nn.Dropout(0.5), nn.Linear(cin, num_classes))
        else:
            self.fc = nn.Linear(cin, 1000)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        x = self.avgpool(x).flatten(1)
        return self.fc(x)

    def encoder_taps(self, x):
        e1 = self.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(e1)
        feats = [e1]
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
            feats.append(x)
        return feats


# ----------------------------- VGG-BN (torchvision-style) -----------------

class TVGG(nn.Module):
    def __init__(self, depth, num_classes=3, adapted_head=True):
        super().__init__()
        stages = (2, 2, 3, 3, 3) if depth == 16 else (2, 2, 4, 4, 4)
        widths = (64, 128, 256, 512, 512)
        layers = []
        cin = 3
        for n, w in zip(stages, widths):
            for _ in range(n):
                layers += [nn.Conv2d(cin, w, 3, padding=1), nn.BatchNorm2d(w), nn.ReLU()]
                cin = w
            layers.append(nn.MaxPool2d(2, 2))
        self.features = nn.Sequential(*layers)
        self.avgpool = nn.AdaptiveAvgPool2d(7)
        head = [nn.Linear(512 * 49, 4096), nn.ReLU(), nn.Dropout(),
                nn.Linear(4096, 4096), nn.ReLU(), nn.Dropout()]
        if adapted_head:
            head += [nn.Dropout(0.5), nn.Linear(4096, num_classes)]
        else:
            head += [nn.Linear(4096, 1000)]
        self.classifier = nn.Sequential(*head)

    def forward(self, x):
        x = self.avgpool(self.features(x)).flatten(1)
        return self.classifier(x)


# ----------------------------- U-Net pieces (reference-style) --------------

def t_basic_block(cin, cout):
    return nn.Sequential(
        nn.Conv2d(cin, cout, 3, padding=1), nn.BatchNorm2d(cout), nn.ReLU(),
        nn.Conv2d(cout, cout, 3, padding=1), nn.BatchNorm2d(cout), nn.ReLU())


class TUpConv(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.up = nn.Sequential(
            nn.Upsample(scale_factor=2), nn.Conv2d(cin, cout, 3, padding=1),
            nn.BatchNorm2d(cout), nn.ReLU())

    def forward(self, x):
        return self.up(x)


class TAttGate(nn.Module):
    def __init__(self, fg, fl, fint):
        super().__init__()
        self.W_g = nn.Sequential(nn.Conv2d(fg, fint, 1), nn.BatchNorm2d(fint))
        self.W_x = nn.Sequential(nn.Conv2d(fl, fint, 1), nn.BatchNorm2d(fint))
        self.psi = nn.Sequential(nn.Conv2d(fint, 1, 1), nn.BatchNorm2d(1), nn.Sigmoid())

    def forward(self, g, x):
        return x * self.psi(torch.relu(self.W_g(g) + self.W_x(x)))


class TDecoderBlock(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.basic_block = t_basic_block(cin, cout)
        ch = cin - cout
        self.up_sample = nn.ConvTranspose2d(ch, ch, 2, 2)

    def forward(self, down, skip):
        x = torch.cat([self.up_sample(down), skip], 1)
        return self.basic_block(x)


class TResNetUnet(nn.Module):
    def __init__(self):
        super().__init__()
        bb = TResNet(50, adapted_head=False)
        self.encoder1 = nn.Sequential(bb.conv1, bb.bn1, bb.relu)
        self.maxpool = bb.maxpool
        self.encoder2, self.encoder3 = bb.layer1, bb.layer2
        self.encoder4, self.encoder5 = bb.layer3, bb.layer4
        self.decoder5 = TDecoderBlock(2048 + 1024, 1024)
        self.decoder4 = TDecoderBlock(1024 + 512, 512)
        self.decoder3 = TDecoderBlock(512 + 256, 256)
        self.decoder2 = TDecoderBlock(256 + 64, 64)
        self.decoder1 = nn.Sequential(
            nn.ConvTranspose2d(64, 32, 2, 2), nn.Conv2d(32, 32, 3, padding=1),
            nn.BatchNorm2d(32), nn.ReLU())
        self.out = nn.Conv2d(32, 1, 1)

    def forward(self, x):
        e1 = self.encoder1(x)
        e2 = self.encoder2(self.maxpool(e1))
        e3, e4, e5 = self.encoder3(e2), None, None
        e4 = self.encoder4(e3)
        e5 = self.encoder5(e4)
        d5 = self.decoder5(e5, e4)
        d4 = self.decoder4(d5, e3)
        d3 = self.decoder3(d4, e2)
        d2 = self.decoder2(d3, e1)
        return self.out(self.decoder1(d2))


class TAttentionUNet(nn.Module):
    def __init__(self, widths=(64, 128, 256, 512, 1024)):
        super().__init__()
        self.max_pool = nn.MaxPool2d(2, 2)
        w = widths
        for i in range(5):
            setattr(self, f"conv{i + 1}", t_basic_block(3 if i == 0 else w[i - 1], w[i]))
        for i, idx in enumerate(range(5, 1, -1)):
            deep, skip = w[idx - 1], w[idx - 2]
            setattr(self, f"up{idx}", TUpConv(deep, skip))
            setattr(self, f"att{idx}", TAttGate(skip, skip, skip // 2))
            setattr(self, f"up_conv{idx}", t_basic_block(2 * skip, skip))
        self.out = nn.Conv2d(w[0], 1, 1)

    def forward(self, x):
        feats = []
        for i in range(5):
            if i > 0:
                x = self.max_pool(x)
            x = getattr(self, f"conv{i + 1}")(x)
            feats.append(x)
        d = feats[-1]
        for idx in range(5, 1, -1):
            d = getattr(self, f"up{idx}")(d)
            a = getattr(self, f"att{idx}")(d, feats[idx - 2])
            d = getattr(self, f"up_conv{idx}")(torch.cat([a, d], 1))
        return self.out(d)


class TRecurrent(nn.Module):
    def __init__(self, cout, t):
        super().__init__()
        self.t = t
        self.conv = nn.Sequential(nn.Conv2d(cout, cout, 3, padding=1),
                                  nn.BatchNorm2d(cout), nn.ReLU())

    def forward(self, x):
        x1 = self.conv(x)
        for _ in range(self.t):
            x1 = self.conv(x + x1)
        return x1


class TRRCNN(nn.Module):
    def __init__(self, cin, cout, t):
        super().__init__()
        self.RCNN = nn.Sequential(TRecurrent(cout, t), TRecurrent(cout, t))
        self.conv_1x1 = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        x = self.conv_1x1(x)
        return x + self.RCNN(x)


class TR2UNet(nn.Module):
    def __init__(self, t=2, attention=False, widths=(64, 128, 256, 512, 1024)):
        super().__init__()
        self.attention = attention
        self.max_pool = nn.MaxPool2d(2, 2)
        w = widths
        for i in range(5):
            setattr(self, f"RRCNN{i + 1}", TRRCNN(3 if i == 0 else w[i - 1], w[i], t))
        for idx in range(5, 1, -1):
            deep, skip = w[idx - 1], w[idx - 2]
            setattr(self, f"up{idx}", TUpConv(deep, skip))
            if attention:
                setattr(self, f"att{idx}", TAttGate(skip, skip, skip // 2))
            setattr(self, f"up_RRCNN{idx}", TRRCNN(2 * skip, skip, t))
        self.conv_1x1 = nn.Conv2d(w[0], 1, 1)

    def forward(self, x):
        feats = []
        for i in range(5):
            if i > 0:
                x = self.max_pool(x)
            x = getattr(self, f"RRCNN{i + 1}")(x)
            feats.append(x)
        d = feats[-1]
        for idx in range(5, 1, -1):
            d = getattr(self, f"up{idx}")(d)
            skip = feats[idx - 2]
            if self.attention:
                skip = getattr(self, f"att{idx}")(d, skip)
            d = getattr(self, f"up_RRCNN{idx}")(torch.cat([skip, d], 1))
        return self.conv_1x1(d)


def randomize_bn_stats(model, seed=0):
    """Non-trivial running stats so BN conversion mistakes surface."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    return model
