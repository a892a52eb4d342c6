"""Gradient-level training parity vs a from-scratch torch mirror of the
reference MultiBoxLoss (VERDICT r4 #1).

Level A (this file's first half): identical prediction tensors + gt into
``stmask_tpu.train.losses.compute_losses`` and
``tests/torch_mirror_loss.RefMultiBoxLoss`` — assert per-key loss VALUES
and input GRADIENTS (d total / d every prediction tensor, plus TemporalNet
parameter gradients through the converter mapping) agree in fp32 on CPU.

The matcher outputs (conf_t / idx_t / ids_t) are also asserted equal —
this doubles as a randomized parity test of the vectorized matcher vs the
reference's sequential loop semantics (SURVEY §7.3 risk #4).

Known reference quirk NOT reproduced (documented): the reference's OHEM
pairs ``cat([pos_weights, neg_weights])`` with CE over kept anchors in
flat order, misaligning weights with anchors (multibox_loss.py:444-448);
we pair intent-correctly.  ``test_ohem_pairing_quirk_bounds`` shows the
quirk is exactly neutral when per-frame positive counts are equal and
quantifies it otherwise.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from stmask_tpu.config import get_config  # noqa: E402
from stmask_tpu.convert import convert_state_dict  # noqa: E402
from stmask_tpu.models.temporal import TemporalNet  # noqa: E402
from stmask_tpu.ops.anchors import make_priors  # noqa: E402
from stmask_tpu.train import losses as L  # noqa: E402

import torch_mirror_loss as R  # noqa: E402
from torch_mirror import TTemporalNet  # noqa: E402

CFG = get_config('STMask_plus_resnet50').replace(max_gt_per_frame=6)
F = 4            # 2 clips
G = 6
HP, WP = 16, 24  # prototype resolution
H4, W4 = 12, 20  # T2S feature resolution
CORR_CH = 37     # free parameter of the loss; small for CPU speed
PRIORS = make_priors(10, 10, CFG.head_kernel_sizes, [24.0])  # P = 300
NP_ = PRIORS.shape[0]


def _fixture(seed):
    """Random preds + a 2-clip gt set with persisting / vanishing / new
    instances (exercises the t2s gating)."""
    rng = np.random.RandomState(seed)
    # gt: clip c has ids (10c+1, 10c+2) in ref frame; next frame keeps
    # 10c+1, drops 10c+2, adds 10c+3
    boxes = np.zeros((F, G, 4), np.float32)
    labels = np.zeros((F, G), np.int32)
    ids = np.zeros((F, G), np.int32)
    valid = np.zeros((F, G), bool)
    masks = np.zeros((F, G, HP, WP), np.uint8)

    def rand_box():
        w, h = rng.uniform(0.25, 0.5, 2)
        x1 = rng.uniform(0, 1 - w)
        y1 = rng.uniform(0, 1 - h)
        return [x1, y1, x1 + w, y1 + h]

    for c in range(F // 2):
        frame_ids = [(10 * c + 1, 10 * c + 2), (10 * c + 1, 10 * c + 3)]
        for fo, fids in enumerate(frame_ids):
            f = 2 * c + fo
            for slot, gid in enumerate(fids):
                boxes[f, slot] = rand_box()
                labels[f, slot] = rng.randint(1, CFG.num_classes)
                ids[f, slot] = gid
                valid[f, slot] = True
                x1, y1, x2, y2 = boxes[f, slot]
                masks[f, slot, int(y1 * HP):max(int(y2 * HP), int(y1 * HP) + 2),
                      int(x1 * WP):max(int(x2 * WP), int(x1 * WP) + 2)] = 1

    track = rng.randn(F, NP_, 16).astype(np.float32)
    track /= np.linalg.norm(track, axis=-1, keepdims=True)
    preds = {
        'loc': (rng.randn(F, NP_, 4) * 0.2).astype(np.float32),
        'conf': rng.randn(F, NP_, CFG.num_classes).astype(np.float32),
        'centerness': np.tanh(rng.randn(F, NP_, 1)).astype(np.float32),
        'mask_coeff': (rng.randn(F, NP_, 32) * 0.2).astype(np.float32),
        'track': track,
        'proto': np.abs(rng.randn(F, HP, WP, 32) * 0.3).astype(np.float32),
        'T2S_concat_feat': np.abs(
            rng.randn(F // 2, H4, W4, CORR_CH) * 0.3).astype(np.float32),
    }
    gt = {'boxes': boxes, 'labels': labels, 'ids': ids, 'valid': valid,
          'masks_proto': masks}
    return preds, gt


def _torch_gt_lists(gt):
    """Padded arrays -> the reference's variable-length per-frame lists."""
    gb, gl, gi, gm = [], [], [], []
    for f in range(F):
        n = int(gt['valid'][f].sum())
        gb.append(torch.from_numpy(gt['boxes'][f, :n]))
        gl.append(torch.from_numpy(gt['labels'][f, :n]).long())
        gi.append(torch.from_numpy(gt['ids'][f, :n]).long())
        gm.append(torch.from_numpy(gt['masks_proto'][f, :n]))
    clips_b = [[gb[2 * c], gb[2 * c + 1]] for c in range(F // 2)]
    clips_i = [[gi[2 * c], gi[2 * c + 1]] for c in range(F // 2)]
    clips_m = [[gm[2 * c], gm[2 * c + 1]] for c in range(F // 2)]
    return gb, gl, gi, gm, clips_b, clips_i, clips_m


def _temporal_pair(seed):
    """A torch TemporalNet and the SAME weights as flax params (through
    the converter), plus callables for both sides."""
    torch.manual_seed(seed)
    tnet = TTemporalNet(CORR_CH)
    sd = {f'TemporalNet.{k}': v for k, v in tnet.state_dict().items()}
    converted = convert_state_dict(sd)
    tn_params = {'params': converted['params']['temporal_net']}
    fnet = TemporalNet(32)

    def torch_tn(pooled_nhwc):
        return tnet(pooled_nhwc.permute(0, 3, 1, 2))

    return tnet, fnet, tn_params, torch_tn


def _jax_losses_and_grads(cfg, preds_np, gt_np, tn_params, fnet,
                          extra_keys=()):
    priors = jnp.asarray(PRIORS)
    gt = {k: jnp.asarray(v) for k, v in gt_np.items()}

    def loss_fn(preds, tnp):
        def tn_fn(x):
            return fnet.apply(tnp, x)
        d = L.compute_losses(cfg, preds, gt, priors, temporal_net_fn=tn_fn)
        return sum(d.values()), d

    preds = {k: jnp.asarray(v) for k, v in preds_np.items()}
    (total, d), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(preds, tn_params)
    return ({k: float(v) for k, v in d.items()},
            jax.tree_util.tree_map(np.asarray, grads[0]),
            jax.tree_util.tree_map(np.asarray, grads[1]))


def _torch_losses_and_grads(cfg, preds_np, gt_np, tnet, torch_tn):
    preds_t = {k: torch.from_numpy(v.copy()).requires_grad_(True)
               for k, v in preds_np.items()}
    gb, gl, gi, gm, cb, ci, cm = _torch_gt_lists(gt_np)
    crit = R.RefMultiBoxLoss(cfg)
    d = crit(preds_t, torch.from_numpy(PRIORS), gb, gl, gi, gm,
             temporal_net=torch_tn, gt_boxes_clip=cb, gt_ids_clip=ci,
             gt_masks_clip=cm)
    total = sum(d.values())
    total.backward()
    grads = {k: v.grad.numpy() if v.grad is not None
             else np.zeros_like(preds_np[k]) for k, v in preds_t.items()}
    tn_grads = {f'TemporalNet.{k}': p.grad.numpy()
                for k, p in tnet.named_parameters()}
    return ({k: float(v.detach()) for k, v in d.items()}, grads, tn_grads)


def _assert_close(a, b, rtol, atol, msg):
    np.testing.assert_allclose(a, b, rtol=rtol, atol=atol, err_msg=msg)


@pytest.mark.slow
@pytest.mark.parametrize('seed', [0, 1, 2])
def test_loss_value_and_gradient_parity(seed):
    preds_np, gt_np = _fixture(seed)
    tnet, fnet, tn_params, torch_tn = _temporal_pair(seed)

    # matcher parity first (exact integer equality)
    priors = jnp.asarray(PRIORS)
    t = L.match_batch(CFG, priors, {k: jnp.asarray(v)
                                    for k, v in preds_np.items()},
                      {k: jnp.asarray(v) for k, v in gt_np.items()})
    gb, gl, gi, gm, *_ = _torch_gt_lists(gt_np)
    for f in range(F):
        _, conf_t, idx_t, ids_t = R.match(
            CFG.positive_iou_threshold, CFG.negative_iou_threshold,
            gb[f], gl[f], gi[f], torch.from_numpy(PRIORS),
            torch.from_numpy(preds_np['conf'][f]))
        np.testing.assert_array_equal(np.asarray(t.conf_t[f]),
                                      conf_t.numpy(), f'conf_t frame {f}')
        np.testing.assert_array_equal(np.asarray(t.ids_t[f]),
                                      ids_t.numpy(), f'ids_t frame {f}')
        pos = conf_t.numpy() > 0
        np.testing.assert_array_equal(np.asarray(t.idx_t[f])[pos],
                                      idx_t.numpy()[pos],
                                      f'idx_t frame {f} (positives)')

    jl, jg, jtg = _jax_losses_and_grads(CFG, preds_np, gt_np, tn_params,
                                        fnet)
    tl, tg, ttg = _torch_losses_and_grads(CFG, preds_np, gt_np, tnet,
                                          torch_tn)

    assert set(jl) == set(tl) == {'BIoU', 'C', 'center', 'M', 'T',
                                  'B_shift', 'M_shift'}
    for k in sorted(jl):
        _assert_close(jl[k], tl[k], 1e-4, 1e-6, f'loss value {k}')

    for k in sorted(tg):
        scale = max(np.abs(tg[k]).max(), 1e-3)
        _assert_close(jg[k], tg[k], 1e-3, 1e-4 * scale, f'grad d/d {k}')

    # TemporalNet parameter gradients through the converter mapping
    conv_tg = convert_state_dict(
        {k: torch.from_numpy(v) for k, v in ttg.items()})
    conv_tg = conv_tg['params']['temporal_net']
    flat_j = jax.tree_util.tree_leaves_with_path(jtg['params'])
    flat_t = dict(jax.tree_util.tree_leaves_with_path(conv_tg))
    assert flat_j, 'no TemporalNet grads on the JAX side'
    for path, leaf in flat_j:
        ref = flat_t[path]
        scale = max(np.abs(ref).max(), 1e-3)
        _assert_close(leaf, ref, 1e-3, 1e-4 * scale,
                      f'TemporalNet grad {path}')


@pytest.mark.slow
def test_loss_parity_smooth_l1_and_sigmoid_focal():
    """The alternate live branches: 'B' (smooth-L1 box,
    use_boxiou_loss=False) and sigmoid-focal 'C' (which suppresses the
    centerness loss per the reference dispatch, multibox_loss.py:195-200)
    — values + input grads."""
    cfg = CFG.replace(use_boxiou_loss=False, use_sigmoid_focal_loss=True)
    preds_np, gt_np = _fixture(11)
    tnet, fnet, tn_params, torch_tn = _temporal_pair(11)

    jl, jg, _ = _jax_losses_and_grads(cfg, preds_np, gt_np, tn_params, fnet)
    tl, tg, _ = _torch_losses_and_grads(cfg, preds_np, gt_np, tnet,
                                        torch_tn)
    assert 'B' in jl and 'C' in jl and 'center' not in jl
    assert set(jl) == set(tl)
    for k in sorted(jl):
        _assert_close(jl[k], tl[k], 1e-4, 1e-6, f'loss value {k}')
    for k in ('loc', 'conf'):
        scale = max(np.abs(tg[k]).max(), 1e-3)
        _assert_close(jg[k], tg[k], 1e-3, 1e-4 * scale, f'grad d/d {k}')


@pytest.mark.slow
def test_loss_parity_dormant_knobs():
    """D (coeff diversity), P (proto l1), MIoU, S — values + grads."""
    cfg = CFG.replace(mask_proto_coeff_diversity_loss=True,
                      mask_proto_loss='l1', use_maskiou_loss=True,
                      use_semantic_segmentation_loss=True)
    preds_np, gt_np = _fixture(7)
    rng = np.random.RandomState(99)
    preds_np['segm'] = rng.randn(F, HP, WP,
                                 CFG.num_classes - 1).astype(np.float32)
    gt_np = dict(gt_np, masks_p3=gt_np['masks_proto'])
    tnet, fnet, tn_params, torch_tn = _temporal_pair(7)

    jl, jg, _ = _jax_losses_and_grads(cfg, preds_np, gt_np, tn_params, fnet)
    tl, tg, _ = _torch_losses_and_grads(cfg, preds_np, gt_np, tnet,
                                        torch_tn)
    # torch mirror computes MIoU inside lincomb in the reference; here we
    # compute it standalone for comparison
    pos_list = []
    for k in ('D', 'P', 'S'):
        assert k in jl and k in tl, k
        _assert_close(jl[k], tl[k], 1e-4, 1e-6, f'loss value {k}')
    for k in ('segm', 'mask_coeff', 'proto'):
        scale = max(np.abs(tg[k]).max(), 1e-3)
        _assert_close(jg[k], tg[k], 1e-3, 1e-4 * scale, f'grad d/d {k}')
    # MIoU: detached in the reference (gt(0.5)) — value checked by its own
    # unit test (test_losses), gradient must be zero through mask_coeff
    # relative to the D/M/P contributions — covered by the detach test.
    assert 'MIoU' in jl


def test_matcher_fuzz_vs_reference_loop():
    """40 random frames with 1..6 gts (incl. heavily overlapping ones)
    through the vectorized matcher vs the sequential torch port — integer
    outputs identical (the SURVEY §7.3 #4 'matcher fidelity' risk)."""
    from stmask_tpu.ops.matcher import match as jmatch

    @jax.jit
    def run(gt_boxes, gt_labels, gt_ids, gt_valid, conf):
        return jmatch(CFG.positive_iou_threshold,
                      CFG.negative_iou_threshold,
                      gt_boxes, gt_labels, gt_ids, gt_valid,
                      jnp.asarray(PRIORS), conf)

    for trial in range(40):
        rng = np.random.RandomState(1000 + trial)
        n = rng.randint(1, G + 1)
        boxes = np.zeros((G, 4), np.float32)
        labels = np.zeros((G,), np.int32)
        ids = np.zeros((G,), np.int32)
        valid = np.zeros((G,), bool)
        base = None
        for j in range(n):
            if base is not None and rng.rand() < 0.4:
                # heavily overlapping with a previous gt (multi-instance
                # veto territory)
                jitter = rng.uniform(-0.05, 0.05, 4)
                b = np.clip(base + jitter, 0, 1)
                if b[2] - b[0] < 0.05:
                    b[2] = min(1.0, b[0] + 0.05)
                if b[3] - b[1] < 0.05:
                    b[3] = min(1.0, b[1] + 0.05)
            else:
                w, h = rng.uniform(0.1, 0.6, 2)
                x1 = rng.uniform(0, 1 - w)
                y1 = rng.uniform(0, 1 - h)
                b = np.array([x1, y1, x1 + w, y1 + h])
                base = b
            boxes[j] = b
            labels[j] = rng.randint(1, CFG.num_classes)
            ids[j] = j + 1
            valid[j] = True
        conf = rng.randn(NP_, CFG.num_classes).astype(np.float32)

        res = run(jnp.asarray(boxes), jnp.asarray(labels),
                  jnp.asarray(ids), jnp.asarray(valid), jnp.asarray(conf))
        _, conf_t, idx_t, ids_t = R.match(
            CFG.positive_iou_threshold, CFG.negative_iou_threshold,
            torch.from_numpy(boxes[:n]), torch.from_numpy(labels[:n]).long(),
            torch.from_numpy(ids[:n]).long(), torch.from_numpy(PRIORS),
            torch.from_numpy(conf))
        np.testing.assert_array_equal(np.asarray(res.conf_t),
                                      conf_t.numpy(), f'conf_t {trial}')
        np.testing.assert_array_equal(np.asarray(res.ids_t),
                                      ids_t.numpy(), f'ids_t {trial}')
        pos = conf_t.numpy() > 0
        np.testing.assert_array_equal(np.asarray(res.idx_t)[pos],
                                      idx_t.numpy()[pos], f'idx_t {trial}')


# --------------------------------------------------------------- Level B
# Full-model gradient parity: torch mirror model -> mirror loss ->
# autograd vs flax model (converted weights) -> compute_losses ->
# jax.grad, compared parameter-by-parameter through the converter.

def _full_fixture(cfg, seed):
    rng = np.random.RandomState(seed)
    b = 1
    hp, wp = cfg.pad_h // 4, cfg.pad_w // 4
    g = cfg.max_gt_per_frame
    images = rng.randn(b, 2, cfg.pad_h, cfg.pad_w, 3).astype(np.float32)
    boxes = np.zeros((2 * b, g, 4), np.float32)
    labels = np.zeros((2 * b, g), np.int32)
    ids = np.zeros((2 * b, g), np.int32)
    valid = np.zeros((2 * b, g), bool)
    masks = np.zeros((2 * b, g, hp, wp), np.uint8)
    frame_ids = [(1, 2), (1, 3)]
    for f in range(2):
        for slot, gid in enumerate(frame_ids[f]):
            w, h = rng.uniform(0.3, 0.5, 2)
            x1 = rng.uniform(0, 1 - w)
            y1 = rng.uniform(0, 1 - h)
            boxes[f, slot] = [x1, y1, x1 + w, y1 + h]
            labels[f, slot] = rng.randint(1, cfg.num_classes)
            ids[f, slot] = gid
            valid[f, slot] = True
            masks[f, slot, int(y1 * hp):int((y1 + h) * hp) + 1,
                  int(x1 * wp):int((x1 + w) * wp) + 1] = 1
    gt = {'boxes': boxes, 'labels': labels, 'ids': ids, 'valid': valid,
          'masks_proto': masks}
    return images, gt


def _randomize_for_grads(tmodel):
    """BN + small DCN offsets (stay inside the backbone's +-2 window so
    the window-formulation training path is mathematically exact)."""
    from torch_mirror import NaiveDCNv2, TFeatureAlign
    for m in tmodel.modules():
        with torch.no_grad():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(torch.rand_like(m.weight) + 0.5)
                m.bias.copy_(torch.randn_like(m.bias) * 0.1)
                m.running_mean.copy_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.copy_(torch.rand_like(m.running_var) + 0.5)
            if isinstance(m, NaiveDCNv2):
                m.conv_offset_mask.weight.normal_(std=0.005)
                m.conv_offset_mask.bias.normal_(std=0.2)
            if isinstance(m, TFeatureAlign) and hasattr(m, 'conv_offset'):
                m.conv_offset.weight.normal_(std=0.05)


@pytest.mark.slow
@pytest.mark.parametrize('cfg_name,mirror_kwargs', [
    ('STMask_plus_resnet50', dict(dcn_layers=(0, 4, 6, 3),
                                  dcn_interval=2)),
    ('STMask_plus_resnet50_ada', dict(dcn_layers=(0, 4, 6, 3),
                                      dcn_interval=2, fcb_ada=True)),
])
def test_full_model_gradient_parity(cfg_name, mirror_kwargs):
    """The whole training program — forward, eleven-loss criterion,
    backward — computes the same parameter gradients as the torch
    reference mirror (VERDICT r4 #1 'done' criterion)."""
    from stmask_tpu.convert import merge_params
    from stmask_tpu.models import STMask
    from stmask_tpu.ops.anchors import all_priors
    from torch_mirror import TSTMask

    cfg = get_config(cfg_name).replace(img_w=128, img_h=96,
                                       max_gt_per_frame=4)
    torch.manual_seed(3)
    tmodel = TSTMask(num_classes=cfg.num_classes, **mirror_kwargs).eval()
    _randomize_for_grads(tmodel)
    images, gt_np = _full_fixture(cfg, 5)

    # ---- torch: mirror forward_train + mirror loss + autograd ----
    xt = torch.from_numpy(
        images.transpose(0, 1, 4, 2, 3)).requires_grad_(False)
    preds_t = tmodel.forward_train(xt)
    gb, gl, gi, gm = [], [], [], []
    for f in range(2):
        n = int(gt_np['valid'][f].sum())
        gb.append(torch.from_numpy(gt_np['boxes'][f, :n]))
        gl.append(torch.from_numpy(gt_np['labels'][f, :n]).long())
        gi.append(torch.from_numpy(gt_np['ids'][f, :n]).long())
        gm.append(torch.from_numpy(gt_np['masks_proto'][f, :n]))
    priors_np = all_priors(cfg).astype(np.float32)
    crit = R.RefMultiBoxLoss(cfg)

    def torch_tn(pooled):
        return tmodel.TemporalNet(pooled.permute(0, 3, 1, 2))

    d_t = crit(preds_t, torch.from_numpy(priors_np), gb, gl, gi, gm,
               temporal_net=torch_tn,
               gt_boxes_clip=[[gb[0], gb[1]]],
               gt_ids_clip=[[gi[0], gi[1]]],
               gt_masks_clip=[[gm[0], gm[1]]])
    total_t = sum(d_t.values())
    total_t.backward()
    tgrads = {k: p.grad for k, p in tmodel.named_parameters()
              if p.grad is not None}
    conv_g = convert_state_dict(tgrads)['params']

    # ---- jax: flax model with converted weights + compute_losses ----
    from stmask_tpu.convert import convert_state_dict as _csd
    converted = _csd(tmodel.mirror_state_dict())
    model = STMask(cfg)
    xj = jnp.asarray(images)
    variables = model.init(jax.random.PRNGKey(0), xj, train=True)
    variables = merge_params(variables, converted['params'])
    priors = jnp.asarray(priors_np)
    gt = {k: jnp.asarray(v) for k, v in gt_np.items()}

    def loss_fn(params):
        preds = model.apply(params, xj, train=True)

        def tn_fn(x):
            return model.apply(params, x, method=STMask.temporal_shift)

        d = L.compute_losses(cfg, preds, gt, priors, temporal_net_fn=tn_fn)
        return sum(d.values()), d

    (total_j, d_j), gj = jax.value_and_grad(
        loss_fn, has_aux=True)(variables)

    # per-key loss values
    for k in sorted(d_t):
        np.testing.assert_allclose(
            float(d_j[k]), float(d_t[k].detach()), rtol=5e-3, atol=1e-4,
            err_msg=f'loss value {k}')

    # parameter gradients, compared through the converter mapping
    flat_t = dict(jax.tree_util.tree_leaves_with_path(conv_g))
    flat_j = dict(jax.tree_util.tree_leaves_with_path(gj['params']))
    compared = 0
    skipped_stats = 0
    for path, ref in flat_t.items():
        leaf = str(path[-1].key if hasattr(path[-1], 'key') else path[-1])
        if leaf in ('mean', 'var'):
            skipped_stats += 1
            continue  # frozen running stats: no torch grad counterpart
        mine = np.asarray(flat_j[path])
        scale = max(np.abs(ref).max(), 1e-4)
        names = [str(getattr(p, 'key', p)) for p in path]
        if 'conv_offset' in names or 'conv_offset_mask' in names:
            # d loss / d offset passes through the bilinear hat's kink at
            # integer offsets — the subgradient there is
            # convention-dependent (torch floor boundary vs ours), so a
            # few samples landing exactly on grid lines may disagree.
            # Require 98% elementwise agreement instead of allclose.
            bad = np.abs(mine - ref) > 2e-3 * scale + 2e-2 * np.abs(ref)
            assert bad.mean() < 0.02, (
                f'offset grad {path}: {bad.mean():.3%} outliers')
        else:
            np.testing.assert_allclose(
                mine, ref, rtol=2e-2, atol=2e-3 * scale,
                err_msg=f'param grad {path}')
        compared += 1
    assert compared > 150, (compared, skipped_stats)


def test_ohem_pairing_quirk_bounds():
    """The reference's misaligned OHEM weight pairing
    (multibox_loss.py:444-448) equals the intent-correct pairing exactly
    when every frame has the same positive count; with unbalanced frames
    the relative deviation stays small (the weights only differ across
    frames by 1/n_pos)."""
    preds_np, gt_np = _fixture(3)
    gb, gl, gi, gm, *_ = _torch_gt_lists(gt_np)
    preds_t = {k: torch.from_numpy(v.copy()) for k, v in preds_np.items()}

    # balanced fixture: every frame has 2 gts of identical geometry ->
    # (usually) equal positive counts; verify and compare exactly
    conf_ts = []
    for f in range(F):
        _, conf_t, _, _ = R.match(
            CFG.positive_iou_threshold, CFG.negative_iou_threshold,
            gb[f], gl[f], gi[f], torch.from_numpy(PRIORS),
            torch.from_numpy(preds_np['conf'][f]))
        conf_ts.append(conf_t)
    n_pos = [int((c > 0).sum()) for c in conf_ts]

    def c_loss(pairing):
        crit = R.RefMultiBoxLoss(CFG, ohem_pairing=pairing)
        pw = [torch.ones(n) / max(n, 1) for n in n_pos]
        out = crit.ohem_conf_loss(
            torch.cat(pw), preds_t['conf'], torch.stack(conf_ts),
            None, preds_t['loc'], torch.from_numpy(PRIORS),
            torch.zeros(F, NP_, 4))
        return float(out['C'])

    ref, ali = c_loss('reference'), c_loss('aligned')
    if len(set(n_pos)) == 1:
        np.testing.assert_allclose(ref, ali, rtol=1e-6)
    else:
        assert abs(ref - ali) / abs(ali) < 0.2, (ref, ali, n_pos)
