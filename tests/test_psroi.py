"""Deformable PSROI pooling vs a direct numpy transliteration of the CUDA
kernel semantics (dcn_v2_psroi_pooling_cuda.cu:59-148)."""
import numpy as np
import jax.numpy as jnp
import pytest

from ppyolo_tpu.ops.deform_psroi_pool import deform_psroi_pool


def _oracle(x_nhwc, rois, trans, spatial_scale, output_dim, group_size,
            pooled, part_size, sample_per_part, trans_std):
    n, H, W, C = x_nhwc.shape
    R = len(rois)
    num_classes = 1 if trans is None else trans.shape[-1] // 2
    cec = output_dim // num_classes
    out = np.zeros((R, pooled, pooled, output_dim), np.float32)
    for r in range(R):
        b = int(rois[r, 0])
        sw = round(rois[r, 1]) * spatial_scale - 0.5
        sh = round(rois[r, 2]) * spatial_scale - 0.5
        ew = (round(rois[r, 3]) + 1.0) * spatial_scale - 0.5
        eh = (round(rois[r, 4]) + 1.0) * spatial_scale - 0.5
        rw = max(ew - sw, 0.1)
        rh = max(eh - sh, 0.1)
        bw, bh = rw / pooled, rh / pooled
        subw, subh = bw / sample_per_part, bh / sample_per_part
        for ph in range(pooled):
            for pw in range(pooled):
                p_h = int(np.floor(ph / pooled * part_size))
                p_w = int(np.floor(pw / pooled * part_size))
                gw = min(max(int(np.floor(pw * group_size / pooled)), 0), group_size - 1)
                gh = min(max(int(np.floor(ph * group_size / pooled)), 0), group_size - 1)
                for ct in range(output_dim):
                    cid = ct // cec
                    tx = 0.0 if trans is None else trans[r, p_h, p_w, 2 * cid] * trans_std
                    ty = 0.0 if trans is None else trans[r, p_h, p_w, 2 * cid + 1] * trans_std
                    ws = pw * bw + sw + tx * rw
                    hs = ph * bh + sh + ty * rh
                    c = (ct * group_size + gh) * group_size + gw
                    s, cnt = 0.0, 0
                    for ih in range(sample_per_part):
                        for iw in range(sample_per_part):
                            w = ws + iw * subw
                            h = hs + ih * subh
                            if w < -0.5 or w > W - 0.5 or h < -0.5 or h > H - 0.5:
                                continue
                            w = min(max(w, 0.0), W - 1.0)
                            h = min(max(h, 0.0), H - 1.0)
                            w0, h0 = int(np.floor(w)), int(np.floor(h))
                            w1, h1 = min(w0 + 1, W - 1), min(h0 + 1, H - 1)
                            lw, lh = w - w0, h - h0
                            v = ((1 - lh) * (1 - lw) * x_nhwc[b, h0, w0, c]
                                 + (1 - lh) * lw * x_nhwc[b, h0, w1, c]
                                 + lh * (1 - lw) * x_nhwc[b, h1, w0, c]
                                 + lh * lw * x_nhwc[b, h1, w1, c])
                            s += v
                            cnt += 1
                    out[r, ph, pw, ct] = 0.0 if cnt == 0 else s / cnt
    return out


@pytest.mark.parametrize("with_trans", [False, True])
def test_psroi_matches_oracle(with_trans):
    rng = np.random.RandomState(0)
    output_dim, group, pooled = 4, 2, 3
    C = output_dim * group * group
    x = rng.randn(2, 12, 14, C).astype(np.float32)
    rois = np.array([[0, 2, 3, 9, 10], [1, 0, 0, 13, 11]], np.float32)
    trans = (rng.randn(2, pooled, pooled, 2).astype(np.float32) * 0.5
             if with_trans else None)
    got = np.asarray(deform_psroi_pool(
        jnp.asarray(x), jnp.asarray(rois),
        None if trans is None else jnp.asarray(trans),
        spatial_scale=0.5, output_dim=output_dim, group_size=group,
        pooled_size=pooled, part_size=pooled, sample_per_part=2,
        trans_std=0.1))
    ref = _oracle(x, rois, trans, 0.5, output_dim, group, pooled, pooled,
                  2, 0.1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
