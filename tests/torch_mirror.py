"""A from-scratch PyTorch mirror of the STMask forward pass (test fixture).

Used ONLY by parity tests: we build the same architecture with stock torch
ops, export its ``state_dict`` through ``stmask_tpu.convert``, and require
the flax model to reproduce its outputs.  This validates the converter key
mapping, the NHWC/HWIO conventions, and the forward math against PyTorch
semantics (the reference's substrate) without copying reference code.

Covers the plain-conv path (no DCN) of STMask_resnet50: ResNet bottlenecks,
FPN P3-P7, ProtoNet, the shared multi-kernel FCA head, and TemporalNet.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class TBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.downsample = downsample

    def forward(self, x):
        r = x
        out = F.relu(self.bn1(self.conv1(x)))
        out = F.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            r = self.downsample(x)
        return F.relu(out + r)


class TResNet(nn.Module):
    def __init__(self, layers=(3, 4, 6, 3)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layers = nn.ModuleList()
        self.inplanes = 64
        for i, blocks in enumerate(layers):
            self.layers.append(self._make_layer(
                64 * 2 ** i, blocks, stride=1 if i == 0 else 2))

    def _make_layer(self, planes, blocks, stride):
        downsample = nn.Sequential(
            nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                      bias=False),
            nn.BatchNorm2d(planes * 4))
        mods = [TBottleneck(self.inplanes, planes, stride, downsample)]
        self.inplanes = planes * 4
        for _ in range(1, blocks):
            mods.append(TBottleneck(self.inplanes, planes))
        return nn.Sequential(*mods)

    def forward(self, x):
        x = self.maxpool(F.relu(self.bn1(self.conv1(x))))
        outs = []
        for layer in self.layers:
            x = layer(x)
            outs.append(x)
        return outs


class TFPN(nn.Module):
    def __init__(self, in_channels=(512, 1024, 2048), num_features=256,
                 num_downsample=2):
        super().__init__()
        self.lat_layers = nn.ModuleList(
            [nn.Conv2d(c, num_features, 1) for c in reversed(in_channels)])
        self.pred_layers = nn.ModuleList(
            [nn.Conv2d(num_features, num_features, 3, padding=1)
             for _ in in_channels])
        self.downsample_layers = nn.ModuleList(
            [nn.Conv2d(num_features, num_features, 3, padding=1, stride=2)
             for _ in range(num_downsample)])

    def forward(self, convouts):
        n = len(convouts)
        out = [None] * n
        x = None
        for i, lat in enumerate(self.lat_layers):
            j = n - 1 - i
            lat_out = lat(convouts[j])
            if x is not None:
                x = F.interpolate(x, size=convouts[j].shape[2:],
                                  mode='bilinear', align_corners=False) \
                    + lat_out
            else:
                x = lat_out
            out[j] = x
        for i, pred in enumerate(self.pred_layers):
            j = n - 1 - i
            out[j] = F.relu(pred(out[j]))
        for d in self.downsample_layers:
            out.append(d(out[-1]))
        return out


class TProtoNet(nn.Module):
    def __init__(self, in_ch=256):
        super().__init__()
        # mirrors _PROTO_SPEC; Sequential indices match the reference layout
        self.net = nn.Sequential(
            nn.Conv2d(in_ch, 256, 3, padding=1), nn.ReLU(),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
            nn.Upsample(scale_factor=2, mode='bilinear',
                        align_corners=False), nn.ReLU(),
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
            nn.Conv2d(256, 32, 1))

    def forward(self, x):
        return self.net(x)


class THead(nn.Module):
    """Shared multi-kernel FCA head, plain convs (no FCB)."""

    def __init__(self, in_ch=256, num_classes=41, embed_dim=128,
                 mask_dim=32,
                 kernels=((3, 3), (3, 5), (5, 3))):
        super().__init__()
        self.kernels = kernels
        self.upfeature = nn.Sequential(nn.Conv2d(in_ch, 256, 3, padding=1))

        def extra():
            return nn.Sequential(
                nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),
                nn.Conv2d(256, 256, 3, padding=1), nn.ReLU())

        self.conf_extra = extra()
        self.bbox_extra = extra()
        self.track_extra = extra()
        self.mask_extra = extra()

        def bank(out_ch):
            return nn.ModuleList([
                nn.Conv2d(256, out_ch, k,
                          padding=((k[0] - 1) // 2, (k[1] - 1) // 2))
                for k in kernels])

        self.bbox_layer = bank(4)
        self.centerness_layer = bank(1)
        self.conf_layer = bank(num_classes)
        self.track_layer = bank(embed_dim)
        self.mask_layer = bank(mask_dim)
        self.num_classes = num_classes
        self.embed_dim = embed_dim
        self.mask_dim = mask_dim

    def forward(self, x):
        x = F.relu(self.upfeature(x))
        t2s = x
        conf_x = self.conf_extra(x)
        bbox_x = self.bbox_extra(x)
        track_x = self.track_extra(x)
        mask_x = self.mask_extra(x)

        bbox, conf, center, track, maskc = [], [], [], [], []
        for k in range(len(self.kernels)):
            bbox.append(self.bbox_layer[k](bbox_x)
                        .permute(0, 2, 3, 1).contiguous())
            center.append(self.centerness_layer[k](bbox_x)
                          .permute(0, 2, 3, 1).contiguous())
            conf.append(self.conf_layer[k](conf_x)
                        .permute(0, 2, 3, 1).contiguous())
            track.append(self.track_layer[k](track_x)
                         .permute(0, 2, 3, 1).contiguous())
            maskc.append(self.mask_layer[k](mask_x)
                         .permute(0, 2, 3, 1).contiguous())

        b = x.size(0)
        out = {
            'loc': torch.cat(bbox, dim=-1).view(b, -1, 4),
            'conf': torch.cat(conf, dim=-1).view(b, -1, self.num_classes),
            'centerness': torch.tanh(
                torch.cat(center, dim=1).view(b, -1, 1)),
            'mask_coeff': torch.cat(maskc, dim=-1).view(b, -1,
                                                        self.mask_dim),
            'track': F.normalize(
                torch.cat(track, dim=-1).view(b, -1, self.embed_dim),
                dim=-1),
            'T2S_feat': t2s,
        }
        return out


class TTemporalNet(nn.Module):
    def __init__(self, corr_channels, mask_proto_n=32):
        super().__init__()
        self.conv1 = nn.Conv2d(corr_channels, 512, 3, padding=1)
        self.conv2 = nn.Conv2d(512, 512, 3, padding=1)
        self.conv3 = nn.Conv2d(512, 1024, 3, padding=1)
        self.fc = nn.Linear(1024, 4)
        self.fc_coeff = nn.Linear(1024, mask_proto_n)

    def forward(self, x):
        x = F.relu(self.conv1(x))
        x = F.relu(self.conv2(x))
        x = F.relu(self.conv3(x))
        x = F.avg_pool2d(x, 7).flatten(1)
        return self.fc(x), self.fc_coeff(x)


class TSTMask(nn.Module):
    """Full eval-forward mirror producing reference-style state_dict keys."""

    def __init__(self, num_classes=41):
        super().__init__()
        self.backbone = TResNet()
        self.fpn = TFPN()
        self.proto_net = TProtoNet().net
        self.prediction_layers = nn.ModuleList([THead(num_classes=num_classes)])
        self.TemporalNet = TTemporalNet(2 * 256 + 121)

    def forward(self, x):
        bb = self.backbone(x)
        fpn_outs = self.fpn(bb[1:4])
        proto = F.relu(self.proto_net(fpn_outs[0]))
        proto = proto.permute(0, 2, 3, 1).contiguous()

        head = self.prediction_layers[0]
        outs = {}
        t2s = []
        for f in fpn_outs:
            p = head(f)
            t2s.append(p.pop('T2S_feat'))
            for k, v in p.items():
                outs.setdefault(k, []).append(v)
        outs = {k: torch.cat(v, dim=1) for k, v in outs.items()}
        outs['conf'] = F.softmax(outs['conf'], dim=-1)
        outs['proto'] = proto
        outs['T2S_feat'] = t2s[1]
        outs['fpn_feat'] = fpn_outs[1]
        return outs

    def mirror_state_dict(self):
        """state_dict with reference-compatible key names."""
        sd = {}
        for k, v in self.state_dict().items():
            # THead submodule names already match (conf_extra, bbox_layer...)
            # but extras are Sequential((conv, relu)*2) -> indices 0, 2 ok;
            # upfeature Sequential -> upfeature.0 ok.
            sd[k] = v
        return sd
