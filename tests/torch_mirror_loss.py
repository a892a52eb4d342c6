"""From-scratch PyTorch mirror of the reference MultiBoxLoss (test fixture).

Implements the reference training criterion from its written equations
(citations per function refer to /root/reference) in the reference's own
style — dynamic shapes, per-image Python loops, torch autograd — so the
vectorized/padded JAX losses in ``stmask_tpu/train/losses.py`` can be
checked for VALUE and GRADIENT parity on identical inputs
(tests/test_train_parity.py).

Two conventions are shared with the JAX side so values compare exactly
(both are documented deviations of this repo, see losses.py docstring):
  * gt masks arrive at prototype resolution, so the reference's
    upsample-to-gt-resolution step (multibox_loss.py:598-604) is the
    identity and is omitted;
  * fixtures keep per-frame positives below ``masks_to_train`` and the
    shift cap, so the JAX side's fixed-capacity slots never truncate.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F

V0, V1 = 0.1, 0.2  # SSD variances (reference box_utils.py:223,274)


# ---------------------------------------------------------------- geometry

def point_form(b):
    return torch.cat([b[..., :2] - b[..., 2:] / 2,
                      b[..., :2] + b[..., 2:] / 2], dim=-1)


def center_size(b):
    return torch.cat([(b[..., 2:] + b[..., :2]) / 2,
                      b[..., 2:] - b[..., :2]], dim=-1)


def jaccard(a, b):
    """[A,4] x [B,4] pairwise IoU (reference box_utils.py:36-88)."""
    max_xy = torch.min(a[:, None, 2:], b[None, :, 2:])
    min_xy = torch.max(a[:, None, :2], b[None, :, :2])
    inter = (max_xy - min_xy).clamp(min=0)
    inter = inter[..., 0] * inter[..., 1]
    area_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1]))[:, None]
    area_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]))[None, :]
    return inter / (area_a + area_b - inter)


def encode(matched, priors):
    """Point-form gt vs [cx,cy,w,h] priors (reference box_utils.py:199-234)."""
    gcxcy = (matched[:, :2] + matched[:, 2:]) / 2 - priors[:, :2]
    gcxcy = gcxcy / (V0 * priors[:, 2:])
    gwh = torch.log((matched[:, 2:] - matched[:, :2]) / priors[:, 2:]) / V1
    return torch.cat([gcxcy, gwh], dim=1)


def decode(loc, priors):
    """(reference box_utils.py:237-283, non-yolo branch)."""
    cxcy = priors[:, :2] + loc[:, :2] * V0 * priors[:, 2:]
    wh = priors[:, 2:] * torch.exp(loc[:, 2:] * V1)
    return torch.cat([cxcy - wh / 2, cxcy + wh / 2], dim=1)


def sanitize_coordinates(x1, x2, size, padding=0):
    """Float path of reference box_utils.py:297-316."""
    x1, x2 = x1 * size, x2 * size
    lo = torch.min(x1, x2)
    hi = torch.max(x1, x2)
    return (lo - padding).clamp(min=0), (hi + padding).clamp(max=size)


def sanitize_coordinates_hw(box, h, w):
    x1, x2 = sanitize_coordinates(box[:, 0], box[:, 2], w)
    y1, y2 = sanitize_coordinates(box[:, 1], box[:, 3], h)
    return torch.stack([x1, y1, x2, y2], dim=-1)


def crop(masks, boxes, padding=1):
    """Zero outside each box; masks [h,w,n], boxes [n,4] normalized
    (reference box_utils.py:340-364)."""
    h, w, n = masks.shape
    x1, x2 = sanitize_coordinates(boxes[:, 0], boxes[:, 2], w, padding)
    y1, y2 = sanitize_coordinates(boxes[:, 1], boxes[:, 3], h, padding)
    rows = torch.arange(w, dtype=masks.dtype)[None, :, None]
    cols = torch.arange(h, dtype=masks.dtype)[:, None, None]
    keep = ((rows >= x1[None, None]) & (rows < x2[None, None]) &
            (cols >= y1[None, None]) & (cols < y2[None, None]))
    return masks * keep.to(masks.dtype)


def generate_mask(proto, coeff, box=None):
    """tanh(coeff) -> proto @ coeff.T -> sigmoid -> crop
    (reference mask_utils.py:111-128); proto [h,w,k] -> [n,h,w]."""
    m = proto.reshape(-1, proto.shape[-1]) @ torch.tanh(coeff).t()
    m = torch.sigmoid(m).reshape(proto.shape[0], proto.shape[1], -1)
    if box is not None:
        m = crop(m, box)
    return m.permute(2, 0, 1)


def roi_align_separable(feat, boxes, pool_size=7, sampling_ratio=2):
    """RoIAlign with mmcv aligned=True semantics, fixed sampling grid —
    the convention of stmask_tpu/ops/roi_align.py (documented deviation
    from mmcv's adaptive sampling_ratio=0), written independently in
    torch.  feat [h,w,c]; boxes [n,4] absolute feature coords."""
    h, w, _ = feat.shape
    p, s = pool_size, sampling_ratio

    def weights(lo, bin_sz, size):
        ii = torch.arange(p, dtype=feat.dtype)
        tt = (torch.arange(s, dtype=feat.dtype) + 0.5) / s
        coords = lo[:, None, None] - 0.5 \
            + (ii[None, :, None] + tt[None, None, :]) * bin_sz[:, None, None]
        grid = torch.arange(size, dtype=feat.dtype)
        wgt = (1.0 - (coords[..., None] - grid).abs()).clamp(min=0)
        return wgt.mean(dim=2)                       # [n, p, size]

    wy = weights(boxes[:, 1], (boxes[:, 3] - boxes[:, 1]) / p, h)
    wx = weights(boxes[:, 0], (boxes[:, 2] - boxes[:, 0]) / p, w)
    t = torch.einsum('nph,hwc->npwc', wy, feat)
    return torch.einsum('nqw,npwc->npqc', wx, t)     # [n, p, p, c]


# ---------------------------------------------------------------- matcher

def match(pos_thresh, neg_thresh, bbox, labels, ids, priors, conf_data):
    """Sequential reference matcher (box_utils.py:119-197): multi-instance
    veto, cla-score-adjusted thresholds, forced best-anchor-per-gt loop.
    Returns (loc_t, conf_t, idx_t, ids_t) for one frame; all detached."""
    with torch.no_grad():
        decoded_priors = point_form(priors)
        overlaps = jaccard(bbox, decoded_priors)            # [G, P]

        best_truth_overlap, best_truth_idx = overlaps.max(0)

        multi = (overlaps > pos_thresh - 0.1).sum(0) > 1
        best_truth_overlap[multi] = (pos_thresh + neg_thresh) / 2

        keep_cla = best_truth_overlap > pos_thresh
        if keep_cla.sum() > 0:
            cla = F.cross_entropy(conf_data[keep_cla],
                                  labels[best_truth_idx[keep_cla]],
                                  reduction='none')
            cla = 2 / (1 + cla.exp())
            best_truth_overlap[keep_cla] = \
                best_truth_overlap[keep_cla] + cla
            pos_thresh = pos_thresh + cla.mean()
            neg_thresh = neg_thresh + cla.mean()

        ov = overlaps.clone()
        for _ in range(ov.size(0)):
            best_prior_overlap, best_prior_idx = ov.max(1)
            j = best_prior_overlap.max(0)[1]
            i = best_prior_idx[j]
            ov[:, i] = -1
            ov[j, :] = -1
            best_truth_overlap[i] = 2
            best_truth_idx[i] = j

        matches = bbox[best_truth_idx]
        conf = labels[best_truth_idx].clone()
        conf[best_truth_overlap < pos_thresh] = -1
        conf[best_truth_overlap < neg_thresh] = 0
        id_cur = ids[best_truth_idx].clone()
        id_cur[best_truth_overlap < pos_thresh] = 0
        loc = encode(matches, priors)
    return loc, conf, best_truth_idx, id_cur


# ------------------------------------------------------------------ losses

def get_diou(pred, gt):
    """(reference multibox_loss.py:227-245)."""
    iou = jaccard(gt, pred).diag().view(-1)
    x = torch.cat([pred[:, ::2], gt[:, ::2]], dim=1)
    y = torch.cat([pred[:, 1::2], gt[:, 1::2]], dim=1)
    c2 = (x.max(1)[0] - x.min(1)[0]) ** 2 + (y.max(1)[0] - y.min(1)[0]) ** 2
    c2 = c2.clamp(min=1e-10)
    pc = pred[:, :2] / 2 + pred[:, 2:] / 2
    gc = gt[:, :2] / 2 + gt[:, 2:] / 2
    d2 = ((pc - gc) ** 2).sum(1)
    return iou - d2 / c2


class RefMultiBoxLoss:
    """Reference MultiBoxLoss semantics on padded preds + list-style gt.

    ``cfg`` is the stmask_tpu STMaskConfig (read-only constants only).
    gt_* args are per-frame lists of variable-length tensors, the
    reference's data layout (multibox_loss.py:55-118).
    """

    def __init__(self, cfg, ohem_pairing='aligned'):
        self.cfg = cfg
        assert ohem_pairing in ('aligned', 'reference')
        self.ohem_pairing = ohem_pairing

    # --- OHEM conf + centerness (multibox_loss.py:402-457) ---
    def ohem_conf_loss(self, pos_weights, conf_data, conf_t,
                       centerness_data, loc, priors, gt_boxes_t):
        cfg = self.cfg
        f = conf_t.size(0)
        conf_t = conf_t.reshape(-1)
        conf_data = conf_data.reshape(-1, cfg.num_classes)
        pos = conf_t > 0
        neu = conf_t < 0

        with torch.no_grad():
            loss_c = torch.logsumexp(conf_data, dim=-1) - conf_data[:, 0]
            loss_c[pos] = 0
            loss_c[neu] = 0
            num_pos = int(pos.sum())
            num_neg = min(cfg.ohem_negpos_ratio * num_pos,
                          conf_t.size(0) - 1)
            _, idx = loss_c.sort(descending=True)
            neg = torch.zeros_like(pos)
            neg[idx[:num_neg]] = True
            neg[pos] = False
            neg[neu] = False

        n_neg = int(neg.sum())
        neg_w = torch.ones(n_neg) / max(n_neg, 1) \
            * cfg.ohem_negpos_ratio * f
        w = torch.cat([pos_weights, neg_w])
        if self.ohem_pairing == 'reference':
            # The reference pairs loss_weights = cat([pos_weights,
            # neg_weights]) against cross_entropy(conf_data[keep]) in FLAT
            # anchor order (multibox_loss.py:444-448) — kept positives and
            # negatives interleave, so weight i does not belong to kept
            # anchor i.  The pairing is exactly neutral when every frame
            # has the same positive count (then all weights equal
            # 1/n_pos_per_frame); otherwise it mixes them slightly.
            keep = pos | neg
            use_t = conf_t[keep].clamp(min=0)
            use_d = conf_data[keep]
        else:
            # intent-correct pairing (what the JAX side implements):
            # positives first in flat order, then negatives
            order = torch.cat([torch.nonzero(pos).flatten(),
                               torch.nonzero(neg).flatten()])
            use_t = conf_t[order].clamp(min=0)
            use_d = conf_data[order]
        ce = F.cross_entropy(use_d, use_t, reduction='none')
        losses = {'C': cfg.conf_alpha * (w * ce).sum()
                  / (cfg.ohem_negpos_ratio + 1)}

        if centerness_data is not None:
            posm = pos
            # NOTE: the reference does NOT detach the DIoU target
            # (multibox_loss.py:450-455) — gradient flows through it into
            # the box branch
            dec = decode(loc.reshape(-1, 4)[posm], priors.repeat(f, 1)[posm])
            diou = get_diou(dec, gt_boxes_t.reshape(-1, 4)[posm])
            lcn = F.smooth_l1_loss(centerness_data.reshape(-1)[posm], diou,
                                   reduction='none')
            losses['center'] = cfg.center_alpha * (pos_weights * lcn).sum()
        return losses

    # --- sigmoid focal conf (multibox_loss.py:479-511) ---
    def focal_conf_sigmoid_loss(self, conf_data, conf_t):
        cfg = self.cfg
        f = conf_t.size(0)
        conf_t = conf_t.reshape(-1).clone()
        conf_data = conf_data.reshape(-1, cfg.num_classes)
        keep = (conf_t >= 0).float()
        conf_t[conf_t < 0] = 0
        one_t = torch.eye(cfg.num_classes)[conf_t]
        pm_t = one_t * 2 - 1
        logpt = F.logsigmoid(conf_data * pm_t)
        pt = logpt.exp()
        at = cfg.focal_loss_alpha * one_t \
            + (1 - cfg.focal_loss_alpha) * (1 - one_t)
        at[..., 0] = 0
        loss = -at * (1 - pt) ** cfg.focal_loss_gamma * logpt
        loss = keep * loss.sum(dim=-1)
        return {'C': cfg.conf_alpha * loss.sum() / keep.sum() * f}

    # --- track (multibox_loss.py:328-351) ---
    def track_loss(self, pos_weights_per_img, track_data, conf_t, ids_t):
        cfg = self.cfg
        pos = conf_t > 0
        emb = track_data[pos]
        pid = ids_t[pos]
        cos = emb @ emb.t()
        inst_eq = (pid.view(-1, 1) == pid.view(1, -1)).float()
        wts = torch.cat(pos_weights_per_img)
        lw = wts.view(-1, 1) @ wts.view(1, -1)
        lw = torch.triu(lw, diagonal=1)
        cos = (cos + 1) / 2
        cos = torch.triu(cos, diagonal=1)
        cos_diff = (1 - cos).clamp(min=1e-10)
        lm = -(inst_eq * cos.clamp(min=1e-10).log()
               + (1 - inst_eq) * cos_diff.log())
        lm = torch.triu(lm, diagonal=1)
        return (lm * lw).sum() * cfg.track_alpha / lw.sum()

    # --- lincomb mask (multibox_loss.py:544-655), proto-resolution ---
    def lincomb_mask_loss(self, pos_weights_per_img, pos, idx_t, loc_data,
                          mask_data, priors, proto_data, masks_gt):
        cfg = self.cfg
        loss_m = 0
        for i in range(mask_data.size(0)):
            cur = pos[i]
            if int(cur.sum()) == 0:
                continue
            pidx = idx_t[i, cur]
            with torch.no_grad():
                box = decode(loc_data[i, cur], priors[cur])
                box = center_size(box)
                box = torch.cat([box[:, :2], box[:, 2:] * 1.2], dim=1)
                box = point_form(box).clamp(min=1e-5, max=1)
            mask_t = masks_gt[i][pidx].float()           # [n, hp, wp]
            pred = generate_mask(proto_data[i], mask_data[i, cur], box)
            hp, wp = mask_t.shape[1:]
            pre = F.binary_cross_entropy(pred.clamp(0, 1), mask_t,
                                         reduction='none')
            cs = center_size(box)
            bw = (cs[:, 2] * wp).clamp(min=1)
            bh = (cs[:, 3] * hp).clamp(min=1)
            pre = pre.sum(dim=(1, 2)) / bw / bh
            loss_m = loss_m + (pos_weights_per_img[i] * pre).sum()
        return loss_m * cfg.mask_alpha

    # --- temporal shift (multibox_loss.py:247-326), proto-resolution ---
    def track_to_segment_loss(self, temporal_net, concat_feat, loc_ref,
                              ids_t_ref, coeff_ref, proto_next, priors,
                              gt_bboxes, gt_ids, gt_masks):
        """concat_feat: [B, H4, W4, C] (channel-last); gt_* are
        [clip][frame] lists; gt_masks at prototype resolution."""
        cfg = self.cfg
        h4, w4 = concat_feat.shape[1:3]
        loss_b = torch.zeros(())
        loss_m = torch.zeros(())
        bs = loc_ref.size(0)
        for i in range(bs):
            ids_cur = ids_t_ref[i].clone()
            ids_ref_gt = gt_ids[i][0]
            ids_next_gt = gt_ids[i][1]
            reg = torch.zeros_like(loc_ref[i])
            for j, gid in enumerate(ids_ref_gt.tolist()):
                if gid in ids_next_gt.tolist():
                    keep = ids_cur == gid
                    b_ref = gt_bboxes[i][0][j].view(1, 4)
                    b_next = gt_bboxes[i][1][ids_next_gt == gid].view(1, 4)
                    r = encode(b_next, center_size(b_ref))
                    reg[keep] = r.repeat(int(keep.sum()), 1)
                else:
                    ids_cur[ids_t_ref[i] == gid] = 0
            pos = ids_cur > 0
            if int(pos.sum()) == 0:
                continue
            with torch.no_grad():
                box_p = decode(loc_ref[i][pos], priors[pos])
            feat_boxes = sanitize_coordinates_hw(box_p, h4, w4)
            pooled = roi_align_separable(concat_feat[i], feat_boxes, 7)
            bbox_reg, shift_coeff = temporal_net(pooled)
            pre_b = F.smooth_l1_loss(bbox_reg, reg[pos],
                                     reduction='none').sum(1)
            loss_b = loss_b + pre_b.mean()

            if cfg.maskshift_loss:
                cur_ids = ids_cur[pos].tolist()
                nidx = [ids_next_gt.tolist().index(g) for g in cur_ids]
                b_t_next = gt_bboxes[i][1][nidx]
                m_t_next = gt_masks[i][1][nidx].float()
                tar = coeff_ref[i, pos] + shift_coeff
                pred = generate_mask(proto_next[i], tar, b_t_next)
                hp, wp = m_t_next.shape[1:]
                pre = F.binary_cross_entropy(pred.clamp(0, 1), m_t_next,
                                             reduction='none')
                cs = center_size(b_t_next)
                pre = pre.sum(dim=(1, 2)) / (cs[:, 2] * wp) / (cs[:, 3] * hp)
                loss_m = loss_m + pre.mean()
        out = {'B_shift': loss_b / bs * cfg.boxshift_alpha}
        if cfg.maskshift_loss:
            out['M_shift'] = loss_m / bs * cfg.maskshift_alpha
        return out

    # --- semantic seg (multibox_loss.py:677-702), binary gt given ---
    def semantic_segmentation_loss(self, segm, masks_p3, labels):
        """segm [F, H3, W3, C-1] channel-last; masks_p3/labels lists."""
        cfg = self.cfg
        f, h3, w3, ncls = segm.shape
        loss = 0
        for i in range(f):
            with torch.no_grad():
                seg_t = torch.zeros(h3, w3, ncls)
                for j in range(masks_p3[i].size(0)):
                    c = int(labels[i][j]) - 1
                    seg_t[:, :, c] = torch.max(seg_t[:, :, c],
                                               masks_p3[i][j].float())
            loss = loss + F.binary_cross_entropy_with_logits(
                segm[i], seg_t, reduction='sum')
        return loss / h3 / w3 * cfg.semantic_segmentation_alpha

    # --- coefficient diversity 'D' (multibox_loss.py:519-542,582-590) ---
    def coeff_diversity_loss(self, weights, coeffs, instance_t):
        cfg = self.cfg
        cn = F.normalize(coeffs, dim=1)
        cos = cn @ cn.t()
        inst_eq = (instance_t[:, None] == instance_t[None, :]).float()
        cos = (cos + 1) / 2
        cos_diff = (1 - cos).clamp(min=1e-10)
        loss = -(cos.clamp(min=1e-10).log() * inst_eq
                 + cos_diff.log() * (1 - inst_eq))
        w = weights.view(-1, 1) * weights.view(1, -1)
        return cfg.mask_proto_coeff_diversity_alpha * (w * loss).sum()

    # ------------------------------------------------------------- driver
    def __call__(self, preds, priors, gt_boxes, gt_labels, gt_ids,
                 gt_masks, temporal_net=None, gt_boxes_clip=None,
                 gt_ids_clip=None, gt_masks_clip=None):
        """preds: dict of torch tensors, frame-flattened like the JAX side
        (loc [F,P,4], conf [F,P,C], centerness [F,P,1], mask_coeff
        [F,P,32], track [F,P,E], proto [F,Hp,Wp,32], optional
        T2S_concat_feat [B,H4,W4,Cc], segm [F,H3,W3,C-1]).
        gt_*: per-frame lists; gt_*_clip: per-clip [ref, next] lists."""
        cfg = self.cfg
        f, p = preds['loc'].shape[:2]

        loc_t = torch.zeros(f, p, 4)
        conf_t = torch.zeros(f, p, dtype=torch.long)
        idx_t = torch.zeros(f, p, dtype=torch.long)
        ids_t = torch.zeros(f, p, dtype=torch.long)
        gt_boxes_t = torch.zeros(f, p, 4)
        for i in range(f):
            l, c, bi, pid = match(cfg.positive_iou_threshold,
                                  cfg.negative_iou_threshold,
                                  gt_boxes[i], gt_labels[i], gt_ids[i],
                                  priors, preds['conf'][i].detach())
            loc_t[i], conf_t[i], idx_t[i], ids_t[i] = l, c, bi, pid
            gt_boxes_t[i] = gt_boxes[i][bi]

        pos = conf_t > 0
        num_pos_per_img = [int(pos[i].sum()) for i in range(f)]
        pos_weights_per_img = [
            torch.ones(n) / max(n, 1) for n in num_pos_per_img]
        pos_weights = torch.cat(pos_weights_per_img)

        losses = {}
        if cfg.train_boxes:
            loc_p = preds['loc'][pos].view(-1, 4)
            pos_priors = priors.unsqueeze(0).expand(f, p, 4)[pos].view(-1, 4)
            if cfg.use_boxiou_loss:
                dec = decode(loc_p, pos_priors)
                diou = get_diou(dec, gt_boxes_t[pos].view(-1, 4))
                losses['BIoU'] = (pos_weights * (1 - diou)).sum() \
                    * cfg.bboxiou_alpha
            else:
                losses['B'] = (pos_weights.view(-1, 1) * F.smooth_l1_loss(
                    loc_p, loc_t[pos].view(-1, 4),
                    reduction='none')).sum() * cfg.bbox_alpha

        if cfg.train_masks:
            losses['M'] = self.lincomb_mask_loss(
                pos_weights_per_img, pos, idx_t, preds['loc'],
                preds['mask_coeff'], priors, preds['proto'], gt_masks)
            if cfg.mask_proto_coeff_diversity_loss:
                # per-clip accumulation (multibox_loss.py:582-590)
                loss_d = 0
                for b in range(f // 2):
                    co, pid, wt = [], [], []
                    for i in (2 * b, 2 * b + 1):
                        cur = pos[i]
                        co.append(preds['mask_coeff'][i, cur])
                        pid.append(ids_t[i, cur])
                        wt.append(pos_weights_per_img[i])
                    loss_d = loss_d + self.coeff_diversity_loss(
                        torch.cat(wt), torch.cat(co), torch.cat(pid))
                losses['D'] = loss_d
            if cfg.mask_proto_loss == 'l1':
                losses['P'] = torch.mean(torch.abs(preds['proto'])) \
                    / (20 * 20 / 70 / 70) * 0.1

        if cfg.train_class:
            if cfg.use_sigmoid_focal_loss:
                # centerness lives in the OHEM branch only
                # (multibox_loss.py:195-200 dispatch)
                losses.update(self.focal_conf_sigmoid_loss(
                    preds['conf'], conf_t))
            else:
                losses.update(self.ohem_conf_loss(
                    pos_weights, preds['conf'], conf_t,
                    preds['centerness'][..., 0] if cfg.train_centerness
                    else None, preds['loc'], priors, gt_boxes_t))

        if cfg.use_semantic_segmentation_loss and 'segm' in preds:
            losses['S'] = self.semantic_segmentation_loss(
                preds['segm'], gt_masks, gt_labels)

        # the global frame-count division (multibox_loss.py:214)
        for k in losses:
            losses[k] = losses[k] / f

        # T and the shift losses attach AFTER the division
        # (multibox_loss.py:107-118)
        if cfg.temporal_fusion_module and temporal_net is not None:
            losses.update(self.track_to_segment_loss(
                temporal_net, preds['T2S_concat_feat'],
                preds['loc'].reshape(f // 2, 2, p, 4)[:, 0].detach(),
                ids_t.reshape(f // 2, 2, p)[:, 0],
                preds['mask_coeff'].reshape(
                    f // 2, 2, p, -1)[:, 0].detach(),
                torch.stack([preds['proto'][2 * b + 1]
                             for b in range(f // 2)]).detach(),
                priors, gt_boxes_clip, gt_ids_clip, gt_masks_clip))

        if cfg.train_track:
            losses['T'] = self.track_loss(
                pos_weights_per_img, preds['track'], conf_t, ids_t)
        return losses
