"""Op-level golden tests against independent numpy oracles.

Mirrors the reference's de-facto test strategy (SURVEY.md §4): numerical
parity of each op against a straightforward re-statement of the math.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ppyolo_tpu.ops import (
    ConvNormAct, Ctx, conv2d, coord_conv, spp, drop_block,
    max_pool2d, avg_pool2d, upsample_nearest_2x, deform_conv2d,
    yolo_box, iou_aware_score, de_sigmoid, matrix_nms, pairwise_iou,
)

rng = np.random.RandomState(0)


def test_conv2d_matches_numpy():
    x = rng.randn(2, 5, 7, 3).astype(np.float32)
    w = rng.randn(3, 3, 3, 4).astype(np.float32)
    y = np.asarray(conv2d(jnp.array(x), jnp.array(w), stride=1, padding=1))
    # naive conv oracle
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = np.zeros((2, 5, 7, 4), np.float32)
    for i in range(5):
        for j in range(7):
            patch = xp[:, i:i + 3, j:j + 3, :]            # [N,3,3,C]
            ref[:, i, j, :] = np.tensordot(patch, w, axes=([1, 2, 3], [0, 1, 2]))
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def test_coord_conv_ranges():
    x = jnp.zeros((2, 4, 6, 3))
    y = coord_conv(x)
    assert y.shape == (2, 4, 6, 5)
    np.testing.assert_allclose(y[0, 0, :, 3], np.linspace(-1, 1, 6), atol=1e-6)
    np.testing.assert_allclose(y[0, :, 0, 4], np.linspace(-1, 1, 4), atol=1e-6)


def test_spp_shapes_and_values():
    x = jnp.array(rng.randn(1, 8, 8, 2).astype(np.float32))
    y = spp(x)
    assert y.shape == (1, 8, 8, 8)
    np.testing.assert_allclose(y[..., :2], x)
    # mp5 at center equals max over 5x5 window
    v = np.asarray(x[0, 1:6, 1:6, 0]).max()
    assert np.isclose(np.asarray(y)[0, 3, 3, 2], v)


def test_pooling_upsample():
    x = jnp.array(rng.randn(1, 4, 4, 2).astype(np.float32))
    mp = max_pool2d(x, 3, 2, 1)
    assert mp.shape == (1, 2, 2, 2)
    ap = avg_pool2d(x, 2, 2)
    np.testing.assert_allclose(
        np.asarray(ap)[0, 0, 0, 0], np.asarray(x)[0, :2, :2, 0].mean(), rtol=1e-6
    )
    up = upsample_nearest_2x(x)
    assert up.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(up)[0, :2, :2, 0], np.asarray(x)[0, 0, 0, 0])


def test_dropblock_statistics():
    key = jax.random.PRNGKey(0)
    x = jnp.ones((2, 16, 16, 8))
    y = drop_block(x, key, block_size=3, keep_prob=0.9)
    y = np.asarray(y)
    assert ((y == 0).sum()) > 0
    # renormalization preserves the mean of kept mask exactly for constant input
    np.testing.assert_allclose(y.mean(), 1.0, rtol=1e-5)
    # test mode: identity
    np.testing.assert_allclose(
        np.asarray(drop_block(x, key, is_test=True)), np.asarray(x)
    )


def test_deform_conv_zero_offset_equals_conv():
    """DCN with zero offset/mask-logit==0 (sigmoid=0.5) equals 0.5*conv
    (reference external/DCNv2/test.py check_zero_offset, SURVEY.md §4)."""
    x = jnp.array(rng.randn(2, 9, 9, 4).astype(np.float32))
    w = jnp.array(rng.randn(3, 3, 4, 6).astype(np.float32))
    off = jnp.zeros((2, 9, 9, 18))
    msk = jnp.zeros((2, 9, 9, 9))
    y = deform_conv2d(x, w, off, msk, stride=1, padding=1)
    ref = 0.5 * conv2d(x, w, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_deform_conv_stride2():
    x = jnp.array(rng.randn(1, 8, 8, 3).astype(np.float32))
    w = jnp.array(rng.randn(3, 3, 3, 5).astype(np.float32))
    off = jnp.zeros((1, 4, 4, 18))
    msk = jnp.full((1, 4, 4, 9), 80.0)  # sigmoid ~ 1
    y = deform_conv2d(x, w, off, msk, stride=2, padding=1)
    ref = conv2d(x, w, stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-3, atol=1e-3)


def test_deform_conv_integer_offset_shift():
    """An integer offset of (0, +1) for every tap shifts sampling one pixel
    right: equals conv on the left-shifted image (interior columns)."""
    x = rng.randn(1, 7, 7, 2).astype(np.float32)
    w = rng.randn(3, 3, 2, 4).astype(np.float32)
    off = np.zeros((1, 7, 7, 18), np.float32)
    off[..., 1::2] = 1.0  # x-offsets
    msk = np.full((1, 7, 7, 9), 80.0, np.float32)
    y = np.asarray(deform_conv2d(jnp.array(x), jnp.array(w), jnp.array(off), jnp.array(msk), padding=1))
    xs = np.roll(x, -1, axis=2)  # shift left
    ref = np.asarray(conv2d(jnp.array(xs), jnp.array(w), stride=1, padding=1))
    np.testing.assert_allclose(y[:, 1:-1, 1:-2], ref[:, 1:-1, 1:-2], rtol=1e-3, atol=1e-3)


def test_deform_conv_grads_exist():
    x = jnp.array(rng.randn(1, 5, 5, 2).astype(np.float32))
    w = jnp.array(rng.randn(3, 3, 2, 3).astype(np.float32))
    off = jnp.array(0.1 * rng.randn(1, 5, 5, 18).astype(np.float32))
    msk = jnp.array(rng.randn(1, 5, 5, 9).astype(np.float32))

    def f(x, w, off, msk):
        return jnp.sum(deform_conv2d(x, w, off, msk, padding=1) ** 2)

    grads = jax.grad(f, argnums=(0, 1, 2, 3))(x, w, off, msk)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0


def _numpy_yolo_box(out_nhwc, anchors, stride, num_classes, scale_x_y, im_size, clip):
    """Independent numpy oracle of head.py:21-80 decode."""
    n, s, _, _ = out_nhwc.shape
    an = len(anchors)
    o = out_nhwc.reshape(n, s, s, an, 5 + num_classes)

    def sig(v):
        return 1 / (1 + np.exp(-v))

    gx, gy = np.meshgrid(np.arange(s), np.arange(s))  # gx varies along W
    px = (scale_x_y * sig(o[..., 0]) + gx[None, :, :, None] - (scale_x_y - 1) / 2) * stride
    py = (scale_x_y * sig(o[..., 1]) + gy[None, :, :, None] - (scale_x_y - 1) / 2) * stride
    pw = np.exp(o[..., 2]) * np.array(anchors)[:, 0]
    ph = np.exp(o[..., 3]) * np.array(anchors)[:, 1]
    x0, x1 = px - pw / 2, px + pw / 2
    y0, y1 = py - ph / 2, py + ph / 2
    scores = sig(o[..., 4:5]) * sig(o[..., 5:])
    boxes = np.stack([x0, y0, x1, y1], -1).reshape(n, -1, 4)
    scores = scores.reshape(n, -1, num_classes)
    net = s * stride
    for b in range(n):
        h_, w_ = im_size[b]
        boxes[b, :, 0::2] *= w_ / net
        boxes[b, :, 1::2] *= h_ / net
        if clip:
            boxes[b, :, 0] = boxes[b, :, 0].clip(0, None)
            boxes[b, :, 1] = boxes[b, :, 1].clip(0, None)
            boxes[b, :, 2] = boxes[b, :, 2].clip(None, w_)
            boxes[b, :, 3] = boxes[b, :, 3].clip(None, h_)
    return boxes, scores


def test_yolo_box_matches_oracle():
    anchors = np.array([[116, 90], [156, 198], [373, 326]], np.float32)
    out = rng.randn(2, 5, 5, 3 * 85).astype(np.float32)
    im_size = np.array([[480, 640], [320, 320]], np.float32)
    b, s = yolo_box(jnp.array(out), jnp.array(anchors), 32, 80, 1.05, jnp.array(im_size), True)
    rb, rs = _numpy_yolo_box(out, anchors, 32, 80, 1.05, im_size, True)
    np.testing.assert_allclose(np.asarray(b), rb, rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(s), rs, rtol=1e-4, atol=1e-5)


def test_de_sigmoid_inverts():
    p = jnp.array([0.01, 0.3, 0.9, 0.999])
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(de_sigmoid(p))), np.asarray(p), rtol=1e-5
    )


def test_iou_aware_score():
    an, c = 3, 4
    out = rng.randn(1, 3, 3, an + an * (5 + c)).astype(np.float32)
    y = np.asarray(iou_aware_score(jnp.array(out), an, c, 0.4))
    assert y.shape == (1, 3, 3, an * (5 + c))

    def sig(v):
        return 1 / (1 + np.exp(-v))

    rest = out[..., an:].reshape(1, 3, 3, an, 5 + c)
    ioup = sig(out[..., :an])
    obj = sig(rest[..., 4])
    fused = sig(y.reshape(1, 3, 3, an, 5 + c)[..., 4])
    np.testing.assert_allclose(fused, obj ** 0.6 * ioup ** 0.4, rtol=1e-4)


def test_yolo_box_serving_bitwise_matches_composed_path():
    """The layout-friendly serving decode must reproduce
    iou_aware_score -> yolo_box bit-for-bit in both dtypes."""
    from ppyolo_tpu.ops.yolo_box import yolo_box_serving

    an, c = 3, 80
    anchors = jnp.array([[116, 90], [156, 198], [373, 326]], jnp.float32)
    im_size = jnp.array([[480, 640], [333, 471]], jnp.float32)
    for dt in (jnp.float32, jnp.bfloat16):
        out = jnp.asarray(rng.randn(2, 5, 5, an + an * (5 + c)) * 2, dt)
        fused = iou_aware_score(out, an, c, 0.4)
        b0, s0 = yolo_box(fused, anchors, 32, c, 1.05, im_size, True)
        b1, s1 = yolo_box_serving(out, anchors, 32, c, 1.05, im_size, True,
                                  iou_aware_factor=0.4)
        np.testing.assert_array_equal(np.asarray(b0, np.float32),
                                      np.asarray(b1, np.float32))
        np.testing.assert_array_equal(np.asarray(s0, np.float32),
                                      np.asarray(s1, np.float32))
        # no-iou-aware path (r18vd)
        out2 = jnp.asarray(rng.randn(2, 5, 5, an * (5 + c)), dt)
        b0, s0 = yolo_box(out2, anchors, 32, c, 1.05, im_size, True)
        b1, s1 = yolo_box_serving(out2, anchors, 32, c, 1.05, im_size, True)
        np.testing.assert_array_equal(np.asarray(b0, np.float32),
                                      np.asarray(b1, np.float32))
        np.testing.assert_array_equal(np.asarray(s0, np.float32),
                                      np.asarray(s1, np.float32))


def _numpy_matrix_nms(boxes, scores, cfg):
    """Oracle: dynamic-shape numpy restatement of matrix_nms.py:51-151."""
    flat = scores.flatten()
    c = scores.shape[1]
    keep = flat > cfg["score_threshold"]
    if keep.sum() == 0:
        return np.zeros((0, 6), np.float32)
    idx = np.nonzero(keep)[0]
    vals = flat[idx]
    labels = idx % c
    bx = boxes[idx // c]
    order = np.argsort(-vals, kind="stable")[: cfg["nms_top_k"]]
    vals, labels, bx = vals[order], labels[order], bx[order]
    n = len(vals)
    iou = np.zeros((n, n), np.float32)
    for i in range(n):
        for j in range(n):
            xa = max(bx[i, 0], bx[j, 0]); ya = max(bx[i, 1], bx[j, 1])
            xb = min(bx[i, 2], bx[j, 2]); yb = min(bx[i, 3], bx[j, 3])
            inter = max(xb - xa, 0) * max(yb - ya, 0)
            ai = (bx[i, 2] - bx[i, 0]) * (bx[i, 3] - bx[i, 1])
            aj = (bx[j, 2] - bx[j, 0]) * (bx[j, 3] - bx[j, 1])
            iou[i, j] = inter / (ai + aj - inter + 1e-12)
    tri = np.triu(np.ones((n, n), bool), 1)
    same = labels[:, None] == labels[None, :]
    d = np.where(tri & same, iou, 0)
    comp = d.max(0)
    if cfg.get("use_gaussian"):
        ratio = np.exp(-cfg["gaussian_sigma"] * (d ** 2 - comp[:, None] ** 2))
    else:
        ratio = (1 - d) / (1 - comp[:, None])
    decay = ratio.min(0)
    new = vals * decay
    m = new >= cfg["post_threshold"]
    if m.sum() == 0:
        return np.zeros((0, 6), np.float32)
    new, labels, bx = new[m], labels[m], bx[m]
    order = np.argsort(-new, kind="stable")[: cfg["keep_top_k"]]
    return np.concatenate(
        [labels[order, None].astype(np.float32), new[order, None], bx[order]], 1
    )


def test_matrix_nms_matches_oracle():
    cfg = dict(score_threshold=0.1, post_threshold=0.1, nms_top_k=16,
               keep_top_k=8, use_gaussian=False, gaussian_sigma=2.0)
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30], [21, 21, 31, 31],
         [50, 50, 60, 60]], np.float32)
    scores = np.zeros((5, 3), np.float32)
    scores[0, 0] = 0.9
    scores[1, 0] = 0.8   # suppressed-ish by 0
    scores[2, 1] = 0.7
    scores[3, 1] = 0.6
    scores[4, 2] = 0.5
    scores[4, 0] = 0.3   # second class on same box
    out = np.asarray(matrix_nms(jnp.array(boxes[None]), jnp.array(scores[None]),
                                dict(cfg, nms_type="matrix_nms")))[0]
    ref = _numpy_matrix_nms(boxes, scores, cfg)
    got = out[out[:, 0] >= 0]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_matrix_nms_multilevel_matches_concat():
    """List-of-levels input (the head's serving path) == concat input,
    bitwise, on both the two-stage (A > 2*kanch) and flat paths, fp32 and
    bf16 (the bf16 two-stage additionally exercises the packed u32 sort)."""
    cfg = dict(score_threshold=0.01, post_threshold=0.01, nms_top_k=500,
               keep_top_k=100, use_gaussian=False, gaussian_sigma=2.0)
    r = np.random.RandomState(3)
    for a_levels, dtype in [((768, 384, 256), np.float32),   # two-stage
                            ((768, 384, 256), jnp.bfloat16),
                            ((40, 24), np.float32)]:         # flat path
        boxes_l, scores_l = [], []
        for al in a_levels:
            xy = r.rand(2, al, 2).astype(np.float32) * 300
            wh = r.rand(2, al, 2).astype(np.float32) * 60 + 1
            boxes_l.append(jnp.asarray(
                np.concatenate([xy, xy + wh], -1), jnp.float32))
            # **4 sharpens so some scores clear the threshold; bf16 cast
            # makes ties common (exercises packed-key tie breaking)
            scores_l.append(jnp.asarray(
                r.rand(2, al, 6).astype(np.float32) ** 4, dtype))
        out_list = np.asarray(matrix_nms(boxes_l, scores_l, cfg), np.float32)
        out_cat = np.asarray(matrix_nms(jnp.concatenate(boxes_l, 1),
                                        jnp.concatenate(scores_l, 1), cfg),
                             np.float32)
        np.testing.assert_array_equal(out_list, out_cat)


def test_topk_pairs_packed_matches_lax():
    """The packed u32 single-key sort == lax.top_k bitwise, including tie
    order (lowest index first), on tie-heavy bf16 data."""
    from ppyolo_tpu.ops.matrix_nms import _topk_pairs
    r = np.random.RandomState(0)
    # draw from a tiny value set so duplicates dominate; include zeros
    vals = np.array([0.0, 0.125, 0.25, 0.25390625, 0.5, 0.8984375],
                    np.float32)
    x = jnp.asarray(vals[r.randint(0, len(vals), 3000)], jnp.bfloat16)
    pv, pi = jax.jit(lambda v: _topk_pairs(v, 500, True))(x)
    lv, li = jax.jit(lambda v: jax.lax.top_k(v, 500))(x)
    np.testing.assert_array_equal(np.asarray(pv, np.float32),
                                  np.asarray(lv, np.float32))
    np.testing.assert_array_equal(np.asarray(pi), np.asarray(li))


def test_topk_pairs_branch_boundary():
    """Both _topk_pairs branches agree bitwise at the u32-packing size
    boundary (n=65535 packed / n=65536 fallback — VERDICT r3 #9), so a
    future anchor-count or config change cannot silently change NMS
    semantics.  n=65535 also stresses the index packing edge: slot 0
    encodes as 65535, saturating all 16 low key bits."""
    from ppyolo_tpu.ops.matrix_nms import _topk_pairs
    r = np.random.RandomState(1)
    vals = np.array([0.0, 0.125, 0.25, 0.5, 0.8984375], np.float32)
    for n in (65535, 65536):
        x = jnp.asarray(vals[r.randint(0, len(vals), n)], jnp.bfloat16)
        pv, pi = jax.jit(lambda v: _topk_pairs(v, 500, True))(x)
        lv, li = jax.jit(lambda v: jax.lax.top_k(v, 500))(x)
        np.testing.assert_array_equal(np.asarray(pv, np.float32),
                                      np.asarray(lv, np.float32))
        np.testing.assert_array_equal(np.asarray(pi), np.asarray(li))


def test_matrix_nms_packed_branch_selection_and_parity():
    """Branch SELECTION is part of the contract: bf16 + nonnegative
    threshold takes the packed-u32 sort, score_threshold<0 must take the
    lax.top_k fallback (negative bf16 bit patterns do not order as u32);
    and forcing the fallback on the same bf16 inputs leaves the full
    matrix_nms output bitwise unchanged."""
    import sys

    import ppyolo_tpu.ops.matrix_nms  # noqa: F401
    mnms = sys.modules["ppyolo_tpu.ops.matrix_nms"]

    r = np.random.RandomState(2)
    a, c = 1200, 4  # a > 2*kanch(=512*?) -> two-stage path feeds _topk_pairs
    boxes = np.abs(r.randn(1, a, 4)).astype(np.float32) * 50
    boxes[..., 2:] += boxes[..., :2] + 1
    scores = r.rand(1, a, c).astype(np.float32)
    cfg = dict(score_threshold=0.01, post_threshold=0.05, nms_top_k=100,
               keep_top_k=50, use_gaussian=False, nms_type="matrix_nms")

    seen = []
    orig = mnms._topk_pairs

    def spy(sub, k, nonneg):
        seen.append((sub.dtype, bool(nonneg)))
        return orig(sub, k, nonneg)

    mnms._topk_pairs = spy
    try:
        sb = jnp.asarray(scores, jnp.bfloat16)
        out_packed = np.asarray(
            mnms.matrix_nms(jnp.asarray(boxes), sb, cfg), np.float32)
        assert seen and seen[-1] == (jnp.bfloat16, True)
        mnms.matrix_nms(jnp.asarray(boxes), sb,
                        dict(cfg, score_threshold=-0.5))
        assert seen[-1] == (jnp.bfloat16, False)  # fallback branch selected

        # force the lax.top_k fallback on identical bf16 inputs
        mnms._topk_pairs = lambda sub, k, nonneg: jax.lax.top_k(sub, k)
        out_forced = np.asarray(
            mnms.matrix_nms(jnp.asarray(boxes), sb, cfg), np.float32)
    finally:
        mnms._topk_pairs = orig
    np.testing.assert_array_equal(out_packed, out_forced)


def test_matrix_nms_negative_threshold_matches_oracle():
    """score_threshold<0 (fallback branch end-to-end) still matches the
    dynamic-shape numpy oracle, incl. reference tie semantics
    (matrix_nms.py:120-125)."""
    r = np.random.RandomState(3)
    a, c = 40, 3
    boxes = np.abs(r.randn(a, 4)).astype(np.float32) * 40
    boxes[:, 2:] += boxes[:, :2] + 1
    scores = (r.rand(a, c).astype(np.float32) - 0.3)  # some negative scores
    cfg = dict(score_threshold=-0.1, post_threshold=0.1, nms_top_k=24,
               keep_top_k=12, use_gaussian=False, nms_type="matrix_nms")
    out = np.asarray(matrix_nms(jnp.array(boxes[None]),
                                jnp.array(scores[None]), cfg))[0]
    ref = _numpy_matrix_nms(boxes, scores, cfg)
    np.testing.assert_allclose(out[:len(ref)], ref, rtol=1e-5, atol=1e-5)
    assert (out[len(ref):] == -1).all()


def test_matrix_nms_negative_post_threshold_keeps_nonpositive_scores():
    """A negative post_threshold must keep detections whose (decayed) score
    is <= 0 — the r4 -1.0/'>0' pad-sentinel silently dropped them (ADVICE
    r4); validity now rides an explicit mask through the final top-k."""
    r = np.random.RandomState(7)
    a, c = 32, 2
    boxes = np.abs(r.randn(a, 4)).astype(np.float32) * 40
    boxes[:, 2:] += boxes[:, :2] + 1
    scores = (r.rand(a, c).astype(np.float32) * 0.5 - 0.45)  # ~90% negative
    cfg = dict(score_threshold=-1.0, post_threshold=-0.5, nms_top_k=24,
               keep_top_k=16, use_gaussian=False, nms_type="matrix_nms")
    out = np.asarray(matrix_nms(jnp.array(boxes[None]),
                                jnp.array(scores[None]), cfg))[0]
    ref = _numpy_matrix_nms(boxes, scores, cfg)
    # the oracle keeps rows with new >= post_threshold regardless of sign
    assert (ref[:, 1] <= 0).any(), "fixture must exercise non-positive keeps"
    np.testing.assert_allclose(out[:len(ref)], ref, rtol=1e-5, atol=1e-5)
    assert (out[len(ref):] == -1).all()


def test_matrix_nms_gaussian_and_empty():
    cfg = dict(score_threshold=0.5, post_threshold=0.5, nms_top_k=8,
               keep_top_k=4, use_gaussian=True, gaussian_sigma=2.0,
               nms_type="matrix_nms")
    boxes = jnp.zeros((1, 6, 4))
    scores = jnp.full((1, 6, 2), 0.01)
    out = np.asarray(matrix_nms(boxes, scores, cfg))[0]
    assert (out == -1).all()


def test_conv_norm_act_cell():
    cell = ConvNormAct(3, 8, 3, stride=2, norm="bn", act="leaky", name="c")
    params = cell.init(jax.random.PRNGKey(0))
    x = jnp.array(rng.randn(2, 8, 8, 3).astype(np.float32))
    y = cell.apply(params, x, Ctx(train=False))
    assert y.shape == (2, 4, 4, 8)
    # train mode records running-stat updates
    upd = {}
    y2 = cell.apply(params, x, Ctx(train=True, updates=upd))
    assert "c.bn.running_mean" in upd and "c.bn.running_var" in upd
    assert np.isfinite(np.asarray(y2)).all()


def test_matrix_nms_two_stage_topk_exact():
    """Large-A path (two-stage anchor-prefiltered top-k) must equal the flat
    exact top-k selection, and the full NMS must match the numpy oracle."""
    rng2 = np.random.RandomState(7)
    a, c = 3000, 20
    scores = (rng2.rand(a, c).astype(np.float32) ** 6)
    boxes = np.abs(rng2.rand(a, 4).astype(np.float32)) * 100
    boxes[:, 2:] = boxes[:, :2] + 5 + 20 * rng2.rand(a, 2).astype(np.float32)
    cfg = dict(score_threshold=0.1, post_threshold=0.1, nms_top_k=500,
               keep_top_k=100, use_gaussian=False, gaussian_sigma=2.0,
               nms_type="matrix_nms")
    out = np.asarray(matrix_nms(jnp.array(boxes[None]),
                                jnp.array(scores[None]), cfg))[0]
    ref = _numpy_matrix_nms(boxes, scores, cfg)
    got = out[out[:, 0] >= 0]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got[:, 1], ref[:, 1], rtol=1e-4)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("use_gaussian", [False, True])
@pytest.mark.parametrize("seed", [1, 2, 3])
def test_matrix_nms_randomized_oracle(use_gaussian, seed):
    """Randomized property test of the padded static-shape NMS vs the
    dynamic-shape oracle (both kernels, several regimes)."""
    r = np.random.RandomState(seed)
    a, c = 60, 5
    boxes = r.rand(a, 4).astype(np.float32) * 80
    boxes[:, 2:] = boxes[:, :2] + 2 + 30 * r.rand(a, 2).astype(np.float32)
    scores = (r.rand(a, c).astype(np.float32) ** 3)
    cfg = dict(score_threshold=0.05, post_threshold=0.08, nms_top_k=40,
               keep_top_k=25, use_gaussian=use_gaussian, gaussian_sigma=2.0,
               nms_type="matrix_nms")
    out = np.asarray(matrix_nms(jnp.array(boxes[None]),
                                jnp.array(scores[None]), cfg))[0]
    ref = _numpy_matrix_nms(boxes, scores, cfg)
    got = out[out[:, 0] >= 0]
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_multiclass_nms_matches_greedy_oracle():
    from ppyolo_tpu.ops.matrix_nms import multiclass_nms

    r = np.random.RandomState(11)
    a, c = 40, 4
    boxes = r.rand(a, 4).astype(np.float32) * 60
    boxes[:, 2:] = boxes[:, :2] + 3 + 25 * r.rand(a, 2).astype(np.float32)
    scores = (r.rand(a, c).astype(np.float32) ** 2)
    cfg = dict(score_threshold=0.1, nms_threshold=0.45, nms_top_k=60,
               keep_top_k=30, nms_type="multiclass_nms")
    out = np.asarray(multiclass_nms(jnp.array(boxes[None]),
                                    jnp.array(scores[None]), cfg))[0]
    got = out[out[:, 0] >= 0]

    # greedy oracle
    flat = scores.flatten()
    order = np.argsort(-flat, kind="stable")
    keep_rows = []
    for f in order:
        s = flat[f]
        if s <= cfg["score_threshold"]:
            break
        lbl, b = f % c, boxes[f // c]
        sup = False
        for (l2, _, bx) in keep_rows:
            if l2 != lbl:
                continue
            xa, ya = max(b[0], bx[0]), max(b[1], bx[1])
            xb, yb = min(b[2], bx[2]), min(b[3], bx[3])
            inter = max(xb - xa, 0) * max(yb - ya, 0)
            u = ((b[2]-b[0])*(b[3]-b[1]) + (bx[2]-bx[0])*(bx[3]-bx[1]) - inter)
            if inter / u > cfg["nms_threshold"]:
                sup = True
                break
        if not sup:
            keep_rows.append((lbl, s, b))
    keep_rows = keep_rows[:cfg["keep_top_k"]]
    assert len(got) == len(keep_rows)
    for row, (lbl, s, b) in zip(got, keep_rows):
        assert row[0] == lbl
        np.testing.assert_allclose(row[1], s, rtol=1e-5)
        np.testing.assert_allclose(row[2:], b, rtol=1e-5)



def test_strided_conv_variants_match_lax():
    """conv_s2_phase / conv_s2_pallas (both dot modes) == the baseline
    strided lax conv, tap-for-tap (r4 VERDICT #4 attempt; the probe
    tools/probe_strided_conv.py measures them on TPU)."""
    from ppyolo_tpu.ops.strided_conv_pallas import (
        conv_s2_xla, conv_s2_phase, conv_s2_pallas)

    r = np.random.RandomState(2)
    x = jnp.asarray(r.randn(2, 24, 24, 16), jnp.float32)
    w = jnp.asarray(r.randn(3, 3, 16, 32) * 0.1, jnp.float32)
    ref = np.asarray(conv_s2_xla(x, w))
    assert ref.shape == (2, 12, 12, 32)
    for got in (conv_s2_phase(x, w),
                conv_s2_pallas(x, w, use_3d_dot=True),
                conv_s2_pallas(x, w, use_3d_dot=False, block_rows=4)):
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-5,
                                   atol=2e-5)
