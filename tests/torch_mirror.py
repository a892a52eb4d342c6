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


def _bilinear_zero(x, py, px):
    """Zero-padded bilinear sampling, the boundary semantics of the DCNv2 /
    mmcv deform-conv CUDA kernels (corners outside [0,H)x[0,W) contribute 0).

    x: [B, C, H, W]; py, px: [B, Ho, Wo] float -> [B, C, Ho, Wo].
    """
    b, c, h, w = x.shape
    y0 = torch.floor(py)
    x0 = torch.floor(px)
    out = 0
    flat = x.reshape(b, c, h * w)
    for dy in (0, 1):
        for dx in (0, 1):
            yi = y0 + dy
            xi = x0 + dx
            wgt = ((1 - (py - yi).abs()).clamp(min=0)
                   * (1 - (px - xi).abs()).clamp(min=0))
            valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
            yc = yi.clamp(0, h - 1).long()
            xc = xi.clamp(0, w - 1).long()
            idx = (yc * w + xc).reshape(b, 1, -1).expand(b, c, -1)
            g = flat.gather(2, idx).reshape(b, c, *py.shape[1:])
            out = out + g * (wgt * valid).unsqueeze(1)
    return out


def naive_deform_conv2d(x, offset, weight, mask=None, bias=None, stride=1,
                        dilation=1):
    """Deformable conv implementing the CUDA kernels' *exact* offset
    indexing: offset channel ``2*(i*kw+j)`` is dy and ``2*(i*kw+j)+1`` is dx
    of tap (i, j) (dcn_v2_im2col_cuda.cu ``data_offset_h_ptr`` /
    ``data_offset_w_ptr``; mmcv deform_im2col is identical).  Modulated (v2)
    when ``mask`` [B, K, Ho, Wo] is given.

    x: [B, Cin, H, W]; offset: [B, 2K, Ho, Wo]; weight: [Cout, Cin, kh, kw].
    """
    b, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    _, _, ho, wo = offset.shape
    pad_h = (kh - 1) // 2 * dilation
    pad_w = (kw - 1) // 2 * dilation
    oy = torch.arange(ho, dtype=x.dtype) * stride - pad_h
    ox = torch.arange(wo, dtype=x.dtype) * stride - pad_w
    out = torch.zeros(b, cout, ho, wo, dtype=x.dtype)
    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            py = (oy[None, :, None] + i * dilation + offset[:, 2 * t])
            px = (ox[None, None, :] + j * dilation + offset[:, 2 * t + 1])
            vals = _bilinear_zero(x, py, px)          # [B, Cin, Ho, Wo]
            if mask is not None:
                vals = vals * mask[:, t:t + 1]
            out = out + torch.einsum('bchw,oc->bohw', vals,
                                     weight[:, :, i, j])
    if bias is not None:
        out = out + bias.reshape(1, -1, 1, 1)
    return out


class NaiveDCNv2(nn.Module):
    """Modulated deformable conv with the CharlesShang DCN state_dict layout
    (parameters ``weight``/``bias`` + submodule ``conv_offset_mask``)."""

    def __init__(self, in_ch, out_ch, kernel_size=3, stride=1, dilation=1):
        super().__init__()
        k = kernel_size * kernel_size
        self.stride, self.dilation = stride, dilation
        self.weight = nn.Parameter(
            torch.randn(out_ch, in_ch, kernel_size, kernel_size) * 0.05)
        self.bias = nn.Parameter(torch.zeros(out_ch))
        self.conv_offset_mask = nn.Conv2d(
            in_ch, 3 * k, kernel_size, stride=stride, padding=dilation)

    def forward(self, x):
        k = self.weight.shape[2] * self.weight.shape[3]
        om = self.conv_offset_mask(x)
        # DCN.forward chunks (o1, o2, mask) and cats (o1, o2) — identity on
        # the first 2K channels; the kernel reads them (dy,dx)-interleaved.
        offset, mask = om[:, :2 * k], torch.sigmoid(om[:, 2 * k:])
        return naive_deform_conv2d(x, offset, self.weight, mask=mask,
                                   bias=self.bias, stride=self.stride,
                                   dilation=self.dilation)


def _torch_ali_offsets(shape, ks_h, ks_w):
    """Analytic 'ali' FCB offsets (reference Featurealign.py:46-69):
    box-delta-driven per-tap (dy, dx), interleaved -> [B, 2k, H, W]."""
    bs, _, h, w = shape.shape
    v0, v1 = 0.1, 0.2
    k = ks_h * ks_w
    dxy = shape[:, :2].reshape(bs, 2, -1) * v0                 # [B, 2, hw]
    dx = (dxy[:, 0] * ks_w).unsqueeze(1).expand(bs, k, h * w)
    dy = (dxy[:, 1] * ks_h).unsqueeze(1).expand(bs, k, h * w)
    dwh = torch.exp(shape[:, 2:].reshape(bs, 2, -1) * v1) - 1  # [B, 2, hw]

    dh_r = (torch.arange(ks_h, dtype=shape.dtype) - (ks_h - 1) / 2)
    dh_r = dh_r.reshape(-1, 1).expand(ks_h, ks_w).reshape(-1)  # [k] row-major
    dw_r = (torch.arange(ks_w, dtype=shape.dtype)
            - (ks_w - 1) / 2).repeat(ks_h)
    dh = dwh[:, 1].unsqueeze(1) * dh_r.reshape(1, -1, 1)       # [B, k, hw]
    dw = dwh[:, 0].unsqueeze(1) * dw_r.reshape(1, -1, 1)

    off = torch.stack([dy + dh, dx + dw], dim=1)               # [B, 2, k, hw]
    return off.permute(0, 2, 1, 3).reshape(bs, 2 * k, h, w)


class TFeatureAlign(nn.Module):
    """FCB (mmcv DeformConv2d v1) mirror — reference Featurealign.py:20-73
    with deform_groups=1 (STMask.py:95). ``ali=False`` is ada mode (1x1
    predicted offsets); ``ali=True`` computes offsets analytically from the
    box deltas (no conv_offset parameter)."""

    def __init__(self, in_ch, out_ch, kernel_size, ali=False):
        super().__init__()
        kh, kw = kernel_size
        self.kernel_size = kernel_size
        self.ali = ali
        if not ali:
            self.conv_offset = nn.Conv2d(4, 2 * kh * kw, 1, bias=False)
        # mmcv DeformConv2d exposes a bare ``weight`` parameter (no bias);
        # wrap in a module so the state_dict key is conv_adaption.weight.
        self.conv_adaption = nn.Module()
        self.conv_adaption.weight = nn.Parameter(
            torch.randn(in_ch, in_ch, kh, kw) * 0.01)
        self.conv = nn.Conv2d(in_ch, out_ch, kernel_size,
                              padding=((kh - 1) // 2, (kw - 1) // 2))

    def forward(self, x, shape):
        if self.ali:
            offset = _torch_ali_offsets(shape.detach(), *self.kernel_size)
        else:
            offset = self.conv_offset(shape.detach())
        x = F.relu(naive_deform_conv2d(x, offset, self.conv_adaption.weight))
        return self.conv(x)


class TBottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 use_dcn=False):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        if use_dcn:
            self.conv2 = NaiveDCNv2(planes, planes, 3, stride=stride)
        else:
            self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride,
                                   padding=1, bias=False)
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


def _dcn_flags(blocks, dcn_layers, dcn_interval):
    """Which blocks of a stage use DCN (reference backbone.py:124-131)."""
    flags = [dcn_layers >= blocks]
    for i in range(1, blocks):
        flags.append(((i + dcn_layers) >= blocks) and (i % dcn_interval == 0))
    return flags


class TResNet(nn.Module):
    def __init__(self, layers=(3, 4, 6, 3), dcn_layers=(0, 0, 0, 0),
                 dcn_interval=1):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layers = nn.ModuleList()
        self.inplanes = 64
        for i, blocks in enumerate(layers):
            flags = _dcn_flags(blocks, dcn_layers[i], dcn_interval)
            self.layers.append(self._make_layer(
                64 * 2 ** i, blocks, stride=1 if i == 0 else 2, flags=flags))

    def _make_layer(self, planes, blocks, stride, flags):
        downsample = nn.Sequential(
            nn.Conv2d(self.inplanes, planes * 4, 1, stride=stride,
                      bias=False),
            nn.BatchNorm2d(planes * 4))
        mods = [TBottleneck(self.inplanes, planes, stride, downsample,
                            use_dcn=flags[0])]
        self.inplanes = planes * 4
        for b in range(1, blocks):
            mods.append(TBottleneck(self.inplanes, planes,
                                    use_dcn=flags[b]))
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
                 kernels=((3, 3), (3, 5), (5, 3)), fcb_ada=False,
                 fcb_ali=False):
        super().__init__()
        self.kernels = kernels
        self.fcb = fcb_ada or fcb_ali
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
        if fcb_ada or fcb_ali:
            self.conf_layer = nn.ModuleList(
                [TFeatureAlign(256, num_classes, k, ali=fcb_ali)
                 for k in kernels])
        else:
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
            bbox_cur = self.bbox_layer[k](bbox_x)
            bbox.append(bbox_cur.permute(0, 2, 3, 1).contiguous())
            center.append(self.centerness_layer[k](bbox_x)
                          .permute(0, 2, 3, 1).contiguous())
            if self.fcb:
                conf_cur = self.conf_layer[k](conf_x, bbox_cur.detach())
            else:
                conf_cur = self.conf_layer[k](conf_x)
            conf.append(conf_cur.permute(0, 2, 3, 1).contiguous())
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


def correlate_torch(x1, x2, patch=11):
    """Local correlation cost volume (reference
    track_to_segment_head.py:40-62 semantics): channel dot products over a
    patch x patch displacement window, zero padded, /C, leaky_relu(0.1);
    output channel (dy+r)*patch + (dx+r).  x1, x2: [B, C, H, W]."""
    b, c, h, w = x1.shape
    r = (patch - 1) // 2
    x2p = F.pad(x2, (r, r, r, r))
    outs = []
    for dy in range(patch):
        for dx in range(patch):
            outs.append((x1 * x2p[:, :, dy:dy + h, dx:dx + w]).sum(1))
    return F.leaky_relu(torch.stack(outs, dim=1) / c, 0.1)


class TSTMask(nn.Module):
    """Full eval-forward mirror producing reference-style state_dict keys."""

    def __init__(self, num_classes=41, dcn_layers=(0, 0, 0, 0),
                 dcn_interval=1, fcb_ada=False, fcb_ali=False,
                 layers=(3, 4, 6, 3)):
        super().__init__()
        self.backbone = TResNet(layers=layers, dcn_layers=dcn_layers,
                                dcn_interval=dcn_interval)
        self.fpn = TFPN()
        self.proto_net = TProtoNet().net
        self.prediction_layers = nn.ModuleList(
            [THead(num_classes=num_classes, fcb_ada=fcb_ada,
                   fcb_ali=fcb_ali)])
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

    def forward_train(self, x):
        """Train-mode forward (reference STMask.py:284-301): [B,2,3,H,W]
        clips flattened to frames, raw conf (no softmax), plus the
        cross-frame correlation concat on FPN level 1.  Returns tensors in
        the JAX side's layouts (channel-last proto / T2S_concat_feat)."""
        b, nf, c, h, w = x.shape
        bb = self.backbone(x.reshape(b * nf, c, h, w))
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
        outs['proto'] = proto

        fsel = fpn_outs[1]
        corr = correlate_torch(fsel[0::2], fsel[1::2])
        tsel = t2s[1]
        concat = F.relu(torch.cat([corr, tsel[0::2], tsel[1::2]], dim=1))
        outs['T2S_concat_feat'] = concat.permute(0, 2, 3, 1)
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
