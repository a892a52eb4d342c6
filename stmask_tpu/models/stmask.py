"""STMask model assembly (reference ``STMask.py:19-330``), TPU-native.

backbone -> FPN(P3..P7) -> { ProtoNet on P3, shared FCA head per level,
TemporalNet for the TF branch }.  The module is purely functional: the
train path takes a [B, 2, H, W, 3] two-frame clip and returns flat
prediction tensors plus the cross-frame correlation features; the eval path
takes single frames and returns everything the detection/tracking pipeline
needs.  NMS and tracking live outside the module (``stmask_tpu.inference``)
so they can be fused into a single jitted video step.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import STMaskConfig
from ..ops.correlation import correlate
from .backbones_extra import construct_backbone
from .fpn import FPN
from .heads import PredictionHead
from .layers import MakeNet
from .legacy_head import PredictionModule
from .maskiou import FastMaskIoUNet
from .temporal import TemporalNet

# ProtoNet spec (reference config.py:667 'mask_proto_net'):
# 3x conv(256,3) -> bilinear x2 -> conv(256,3) -> conv(32,1), last relu
# stripped (STMask.py:60 include_last_relu=False); prototype activation
# (relu) applied after (STMask.py:233-234).
_PROTO_SPEC = ((256, 3, 1), (256, 3, 1), (256, 3, 1), (None, -2, 0),
               (256, 3, 1), (32, 1, 0))


class STMask(nn.Module):
    cfg: STMaskConfig

    def setup(self):
        c = self.cfg
        # dispatch on preset name: ResNet / ResNet-GN / DarkNet53 / VGG16
        # (reference construct_backbone, backbone.py:462)
        self.backbone = construct_backbone(c.backbone)
        self.fpn = FPN(c.fpn, name='fpn')
        self.proto_net = MakeNet(_PROTO_SPEC, include_last_relu=False,
                                 name='proto_net')
        if c.head_type == 'legacy':
            from .heads import _focal_conf_bias_init
            self.prediction_head = PredictionModule(
                c.num_classes, mask_dim=c.mask_proto_n,
                num_priors=len(c.pred_scales[0]) * 3,
                conf_bias_init=(
                    _focal_conf_bias_init(c, len(c.pred_scales[0]) * 3)
                    if c.use_sigmoid_focal_loss else None),
                name='prediction_head')
        else:
            self.prediction_head = PredictionHead(c, name='prediction_head')
        if c.temporal_fusion_module:
            self.temporal_net = TemporalNet(c.mask_proto_n,
                                            name='temporal_net')
        if c.use_semantic_segmentation_loss:
            self.semantic_seg_conv = nn.Conv(c.num_classes - 1, (1, 1),
                                             name='semantic_seg_conv')
        if c.use_class_existence_loss:
            # Linear on global-mean-pooled P7 (reference STMask.py:114-117)
            self.class_existence_fc = nn.Dense(c.num_classes - 1,
                                               name='class_existence_fc')
        if c.use_maskiou:
            self.maskiou_net = FastMaskIoUNet(c.num_classes,
                                              name='maskiou_net')

    def forward_single(self, x: jax.Array, train: bool = False):
        """One batch of frames [B, H, W, 3] -> (fpn_outs, pred dict).

        Mirrors reference STMask.py:205-282.
        """
        c = self.cfg
        bb_outs = self.backbone(x, train=train)
        sel = [bb_outs[i] for i in c.backbone.selected_layers]
        fpn_outs = self.fpn(sel)

        proto_x = fpn_outs[c.mask_proto_src]
        proto_out = nn.relu(self.proto_net(proto_x))      # [B, Hp, Wp, 32]

        preds: Dict[str, List[jax.Array]] = {}
        t2s_feats = []
        for lvl, f in enumerate(fpn_outs):
            if c.head_type == 'legacy':
                p = self.prediction_head(f)
            else:
                # train routes FCB alignment through the window-clamped
                # scatter-free adjoint (heads.FeatureAlign docstring)
                p = self.prediction_head(f, train=train)
            # the legacy YOLACT head carries no T2S feature; fall back to
            # the raw FPN level so the TF plumbing stays shape-stable
            t2s_feats.append(p.pop('T2S_feat', f))
            for k, v in p.items():
                preds.setdefault(k, []).append(v)

        pred_outs = {k: jnp.concatenate(v, axis=1) for k, v in preds.items()}
        pred_outs['proto'] = proto_out
        pred_outs['T2S_feat'] = t2s_feats[c.correlation_selected_layer]
        return fpn_outs, pred_outs

    def __call__(self, x: jax.Array, train: bool = False,
                 return_fpn_outs: bool = False):
        """``return_fpn_outs`` (eval only) adds the full P3..P7 pyramid to
        the outputs — the --display_fpn_outs debug surface (reference
        eval.py:65, output_utils.py:225-244)."""
        c = self.cfg
        if self.is_initializing():
            # touch path-dependent submodules so their params exist
            # regardless of which path initializes the model
            if c.temporal_fusion_module:
                corr_ch = (2 * c.fpn.num_features
                           + c.correlation_patch_size ** 2)
                self.temporal_net(jnp.zeros((1, 7, 7, corr_ch)))
            if c.use_maskiou:
                self.maskiou_net(jnp.zeros((1, c.pad_h // 4,
                                            c.pad_w // 4, 1)))
            if c.use_class_existence_loss:
                self.class_existence_fc(
                    jnp.zeros((1, c.fpn.num_features)))
        if train:
            b, nf, h, w, _ = x.shape
            fpn_outs, pred_outs = self.forward_single(
                x.reshape(b * nf, h, w, 3), train=True)

            if c.temporal_fusion_module:
                # cross-frame correlation on the selected FPN level
                # (reference STMask.py:289-297): even rows = ref frame,
                # odd rows = next frame of each clip.
                f = fpn_outs[c.correlation_selected_layer]
                fpn_ref, fpn_next = f[0::2], f[1::2]
                t2s = pred_outs.pop('T2S_feat')
                t2s_ref, t2s_next = t2s[0::2], t2s[1::2]
                x_corr = correlate(fpn_ref, fpn_next,
                                   patch_size=c.correlation_patch_size)
                pred_outs['T2S_concat_feat'] = nn.relu(
                    jnp.concatenate([x_corr, t2s_ref, t2s_next], axis=-1))

            if c.use_semantic_segmentation_loss:
                pred_outs['segm'] = self.semantic_seg_conv(fpn_outs[0])
            if c.use_class_existence_loss:
                # image-level class logits from mean-pooled P7
                # (reference STMask.py:300-301)
                pred_outs['classes'] = self.class_existence_fc(
                    jnp.mean(fpn_outs[-1], axis=(1, 2)))
            return pred_outs
        else:
            fpn_outs, pred_outs = self.forward_single(x)
            # the legacy head has no centerness/track branches; synthesize
            # neutral values so the detection/tracking pipeline is uniform
            n_anchor = pred_outs['loc'].shape[1]
            if 'centerness' not in pred_outs:
                pred_outs['centerness'] = jnp.ones(
                    (x.shape[0], n_anchor, 1), jnp.float32)
            if 'track' not in pred_outs:
                pred_outs['track'] = jnp.full(
                    (x.shape[0], n_anchor, c.embed_dim),
                    1.0 / c.embed_dim ** 0.5, jnp.float32)
            # decode-side tensors in fp32 regardless of compute dtype
            for k in ('loc', 'conf', 'mask_coeff', 'track', 'centerness',
                      'proto'):
                if k in pred_outs:
                    pred_outs[k] = pred_outs[k].astype(jnp.float32)
            pred_outs['conf'] = jax.nn.softmax(pred_outs['conf'], axis=-1)
            if c.temporal_fusion_module:
                pred_outs['fpn_feat'] = fpn_outs[c.correlation_selected_layer]
            if return_fpn_outs:
                pred_outs['fpn_outs'] = tuple(fpn_outs)
            return pred_outs

    def temporal_shift(self, bbox_feats: jax.Array):
        """Run TemporalNet on RoIAligned features (used by CandidateShift
        and by the train-time track-to-segment loss)."""
        return self.temporal_net(bbox_feats)

    def maskiou(self, masks: jax.Array):
        """Run FastMaskIoUNet on [N, H, W, 1] soft masks (maskiou loss and
        eval re-scoring; reference STMask.py:71-72)."""
        return self.maskiou_net(masks)
