"""Loss numerical stability under saturated logits.

Round-2 TPU finding: the reference's eps-guarded BCE
``t*(-log(s+1e-9)) + (1-t)*(-log(1-s+1e-9))`` (model/losses.py:179-183,
221,351-352) breaks on the TPU XLA pipeline — with
--xla_allow_excess_precision the compiler reassociates ``1.0 - s + 1e-9``
into ``(1.0 + 1e-9) - s`` and folds the constants, so a sigmoid that rounds
to exactly 1.0f (logit >= ~17, routine at random init @608) produces
log(0) = -inf and 0*inf = NaN.  losses.py now computes BCE from logits via
capped softplus.  These tests certify (a) equivalence with the reference
form where it is well-behaved, (b) finiteness of every loss component and
its gradients under saturated logits — independent of any compiler's
reassociation choices, since no eps-sum remains to fold.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ppyolo_tpu.train.losses import (_bce_logits, _EPS_CAP, IouLoss,
                                     IouAwareLoss, YOLOv3Loss)


def _ref_bce(logit, t, eps=1e-9):
    s = 1.0 / (1.0 + np.exp(-logit))
    return t * -np.log(s + eps) + (1 - t) * -np.log(1 - s + eps)


def test_bce_logits_matches_reference_form_unsaturated():
    rng = np.random.RandomState(0)
    # |x| <= 9: the reference's own eps biases the log by <~2e-5 here (at
    # x = -14 the +1e-9 already shaves 1.2e-3 off the true BCE)
    x = rng.uniform(-9, 9, (4096,))
    t = rng.uniform(0, 1, (4096,))
    got = np.asarray(_bce_logits(jnp.asarray(x, jnp.float32),
                                 jnp.asarray(t, jnp.float32)))
    ref = _ref_bce(x, t)
    np.testing.assert_allclose(got, ref, rtol=5e-5, atol=5e-5)


def test_bce_logits_saturation_cap():
    # at +-40 the eps acts as a loss cap in the reference; softplus is capped
    # to the same -log(1e-9)
    for logit, t in ((40.0, 0.0), (-40.0, 1.0)):
        v = float(_bce_logits(jnp.float32(logit), jnp.float32(t)))
        assert abs(v - _EPS_CAP) < 1e-4
    # and the easy side is ~0, not NaN
    assert float(_bce_logits(jnp.float32(40.0), jnp.float32(1.0))) < 1e-6


def _saturated_level(rng, n, s, an, nc, iou_aware):
    c = an * (5 + nc) + (an if iou_aware else 0)
    out = rng.randn(n, s, s, c).astype(np.float32)
    # drive a block of logits deep into saturation (sigmoid == 1.0f / 0.0f)
    out[:, : s // 2] = 35.0
    out[:, s // 2:, : s // 3] = -35.0
    tgt = np.zeros((n, s, s, an, 6 + nc), np.float32)
    tgt[..., 0, 0:2] = 0.4           # tx, ty for anchor 0
    tgt[..., 0, 2:4] = 0.1           # tw, th
    tgt[..., 0, 4] = 1.5             # tscale
    tgt[:, ::3, ::3, 0, 5] = 1.0     # tobj sprinkled
    tgt[..., 0, 6] = 1.0             # class 0
    return out, tgt


@pytest.mark.slow
def test_full_loss_finite_and_differentiable_under_saturation():
    rng = np.random.RandomState(1)
    nc, an = 3, 3
    loss_obj = YOLOv3Loss(
        ignore_thresh=0.7, label_smooth=False,
        iou_loss=IouLoss(loss_weight=2.5, ciou_term=True),
        iou_aware_loss=IouAwareLoss(loss_weight=1.0),
        downsample=[32, 16], scale_x_y=1.05, match_score=True)
    outs_np, tgts_np = zip(_saturated_level(rng, 2, 8, an, nc, True),
                           _saturated_level(rng, 2, 16, an, nc, True))
    gt = np.zeros((2, 50, 4), np.float32)
    gt[:, 0] = [0.5, 0.5, 0.2, 0.3]
    mask_anchors = [[116, 90, 156, 198, 373, 326], [30, 61, 62, 45, 59, 119]]

    def total(outs):
        d = loss_obj(list(outs), [jnp.asarray(t) for t in tgts_np],
                     jnp.asarray(gt), mask_anchors, nc)
        return sum(jnp.asarray(v, jnp.float32) for v in d.values()), d

    (tot, d), grads = jax.value_and_grad(total, has_aux=True)(
        tuple(jnp.asarray(o) for o in outs_np))
    assert np.isfinite(float(tot)), {k: float(v) for k, v in d.items()}
    for k, v in d.items():
        assert np.isfinite(float(v)), k
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
