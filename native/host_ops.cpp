// Native host-side ops for the ppyolo_tpu runtime.
//
// The reference framework's native layer is CUDA kernels for DCNv2
// (external/DCNv2/src/*); on TPU that role is played by the Pallas kernel.
// The host-side hot loops that remain — COCO evaluation IoU matrices and
// greedy detection matching (the part pycocotools implements in C), plus the
// Gt2YoloTarget scatter — live here as a small C++ library bound via ctypes
// (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC host_ops.cpp -o libhost_ops.so
// (done automatically by ppyolo_tpu/native.py on first use).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

extern "C" {

// Pairwise IoU of xywh boxes; crowd gt uses union = dt area
// (pycocotools maskApi bbIou semantics).  out is [nd, ng] row-major.
void bbox_iou_xywh(const double* dt, int64_t nd, const double* gt, int64_t ng,
                   const uint8_t* iscrowd, double* out) {
  for (int64_t j = 0; j < ng; ++j) {
    const double gx1 = gt[j * 4 + 0], gy1 = gt[j * 4 + 1];
    const double gw = gt[j * 4 + 2], gh = gt[j * 4 + 3];
    const double gx2 = gx1 + gw, gy2 = gy1 + gh, ga = gw * gh;
    const bool crowd = iscrowd[j] != 0;
    for (int64_t i = 0; i < nd; ++i) {
      const double dx1 = dt[i * 4 + 0], dy1 = dt[i * 4 + 1];
      const double dw = dt[i * 4 + 2], dh = dt[i * 4 + 3];
      const double dx2 = dx1 + dw, dy2 = dy1 + dh, da = dw * dh;
      const double iw = std::min(dx2, gx2) - std::max(dx1, gx1);
      const double ih = std::min(dy2, gy2) - std::max(dy1, gy1);
      double v = 0.0;
      if (iw > 0 && ih > 0) {
        const double inter = iw * ih;
        const double uni = crowd ? da : da + ga - inter;
        v = inter / uni;
      }
      out[i * ng + j] = v;
    }
  }
}

// Greedy per-threshold matching (pycocotools cocoeval.evaluateImg inner
// loop).  ious [nd, ng] row-major; g_ignore [ng] with non-ignored gts FIRST
// (caller sorts); g_crowd [ng] is the iscrowd flag in the SAME order —
// pycocotools lets only CROWD gts be matched by multiple dts
// (`if gtm>0 and not iscrowd: continue`); an area-ignored non-crowd gt is
// taken by its first match like a regular gt.  thrs [nt].  Outputs
// dt_m/gt_m [nt, nd] / [nt, ng] with -1 for unmatched.
void match_greedy(const double* ious, int64_t nd, int64_t ng,
                  const uint8_t* g_ignore, const uint8_t* g_crowd,
                  const double* thrs, int64_t nt,
                  int64_t* dt_m, int64_t* gt_m) {
  for (int64_t t = 0; t < nt; ++t) {
    int64_t* dm = dt_m + t * nd;
    int64_t* gm = gt_m + t * ng;
    for (int64_t i = 0; i < nd; ++i) dm[i] = -1;
    for (int64_t j = 0; j < ng; ++j) gm[j] = -1;
    for (int64_t di = 0; di < nd; ++di) {
      double best = std::min(thrs[t], 1.0 - 1e-10);
      int64_t m = -1;
      for (int64_t gi = 0; gi < ng; ++gi) {
        if (gm[gi] >= 0 && !g_crowd[gi]) continue;
        if (m > -1 && !g_ignore[m] && g_ignore[gi]) break;
        const double v = ious[di * ng + gi];
        if (v < best) continue;
        best = v;
        m = gi;
      }
      if (m >= 0) {
        dm[di] = m;
        gm[m] = di;
      }
    }
  }
}

// Gt2YoloTarget scatter for one level (transform.py:1348-1419 semantics,
// NHWC layout [B, gh, gw, an, 6+C]).  mask maps slot->global anchor id.
void gt2yolo_scatter(const float* gt_bbox,   // [B, M, 4] normalized xywh
                     const int32_t* gt_cls,  // [B, M]
                     const float* gt_score,  // [B, M]
                     const int32_t* best,    // [B, M] best global anchor id
                     int64_t B, int64_t M, const int32_t* mask, int64_t an,
                     const float* tw_tab,    // [B, M] log(gw*w/anchor_w),
                     const float* th_tab,    // [B, M] precomputed in numpy
                                             // (libm logf differs from
                                             // numpy's f32 log by 1 ulp)
                     int64_t grid_h, int64_t grid_w,
                     int64_t num_ch,         // 6 + num_classes
                     float* target) {        // [B, gh, gw, an, num_ch]
  const int64_t stride_b = grid_h * grid_w * an * num_ch;
  for (int64_t b = 0; b < B; ++b) {
    for (int64_t m = 0; m < M; ++m) {
      const float gx = gt_bbox[(b * M + m) * 4 + 0];
      const float gy = gt_bbox[(b * M + m) * 4 + 1];
      const float gw = gt_bbox[(b * M + m) * 4 + 2];
      const float gh = gt_bbox[(b * M + m) * 4 + 3];
      const float sc = gt_score[b * M + m];
      if (gw <= 0.f || gh <= 0.f || sc <= 0.f) continue;
      int64_t slot = -1;
      for (int64_t s = 0; s < an; ++s)
        if (mask[s] == best[b * M + m]) slot = s;
      if (slot < 0) continue;
      int64_t gi = (int64_t)(gx * grid_w);
      int64_t gj = (int64_t)(gy * grid_h);
      gi = std::max<int64_t>(0, std::min<int64_t>(gi, grid_w - 1));
      gj = std::max<int64_t>(0, std::min<int64_t>(gj, grid_h - 1));
      float* cell = target + b * stride_b +
                    ((gj * grid_w + gi) * an + slot) * num_ch;
      cell[0] = gx * grid_w - gi;
      cell[1] = gy * grid_h - gj;
      cell[2] = tw_tab[b * M + m];
      cell[3] = th_tab[b * M + m];
      cell[4] = 2.0f - gw * gh;
      cell[5] = sc;
      const int32_t cls = gt_cls[b * M + m];
      if (cls >= 0 && cls < num_ch - 6) cell[6 + cls] = 1.0f;
    }
  }
}

// Single-pass float32 -> uint8 image pack: round-half-to-even (np.rint
// semantics; nearbyintf under the default FE_TONEAREST mode) then clamp to
// [0, 255].  Replaces numpy's clip(rint(x)).astype(uint8) + stack in the
// loader's assemble_batch — that chain materializes three full-image
// temporaries per sample; this writes straight into the caller's
// preallocated batch slot (tools/bench_loader.py quantifies the win).
void f32_to_u8_rint(const float* src, int64_t n, uint8_t* dst) {
  for (int64_t i = 0; i < n; ++i) {
    float r = nearbyintf(src[i]);
    r = r < 0.0f ? 0.0f : (r > 255.0f ? 255.0f : r);
    dst[i] = (uint8_t)r;
  }
}

}  // extern "C"

// Fused ColorDistort chain (transforms.py ColorDistort, reference
// transform.py:479-612 random_apply path).  All four sub-ops are per-PIXEL
// maps, so the whole drawn chain applies in ONE pass with zero temporaries
// and bitwise-identical results to the numpy per-op path: fusion cannot
// change per-element f32 arithmetic, and each step reproduces numpy's exact
// semantics —
//   * scalar deltas arrive pre-cast to f32 (numpy casts weak python-float
//     scalars to the array dtype under NEP 50);
//   * saturation's gray is numpy's sequential length-3 axis sum
//     ((r*w0 + g*w1) + b*w2 in f32) and gray*(1-delta) is rounded ONCE per
//     pixel then reused for all 3 channels (numpy materializes the
//     broadcast [H,W,1] product before the add);
//   * hue reproduces np.dot(img3d, t3x3)'s strided FLOAT_dot: each product
//     rounded to f32, accumulated in DOUBLE ascending k, rounded once at
//     the end (verified element-exhaustively vs numpy 2.0 — NOT the same
//     bits as cblas_sgemm, which the 2-D reshape would hit);
//   * the build carries no -march/-mfma, so no FMA contraction can fuse a
//     mul+add and change rounding (tests/test_native.py pins all of this
//     bitwise against the pure-numpy path).
// ops[o] in {0 brightness, 1 contrast, 2 saturation, 3 hue}; params is
// [n_ops, 12] row-major: brightness/contrast use p[0]=delta; saturation
// p[0]=delta, p[1]=f32(1.0-delta), p[2..4]=gray weights; hue p[0..8] =
// t[k*3+j] (np.dot's rhs, row-major).
template <typename SrcT>
static void color_distort_impl(const SrcT* src, int64_t n_px,
                               const int32_t* ops, const float* params,
                               int64_t n_ops, float* out) {
  for (int64_t i = 0; i < n_px; ++i) {
    float r = (float)src[i * 3 + 0];
    float g = (float)src[i * 3 + 1];
    float b = (float)src[i * 3 + 2];
    for (int64_t o = 0; o < n_ops; ++o) {
      const float* p = params + o * 12;
      switch (ops[o]) {
        case 0: r += p[0]; g += p[0]; b += p[0]; break;
        case 1: r *= p[0]; g *= p[0]; b *= p[0]; break;
        case 2: {
          const float gray = (r * p[2] + g * p[3]) + b * p[4];
          const float gs = gray * p[1];
          r = r * p[0] + gs;
          g = g * p[0] + gs;
          b = b * p[0] + gs;
          break;
        }
        case 3: {
          const float nr = (float)(((double)(r * p[0]) + (double)(g * p[3])) +
                                   (double)(b * p[6]));
          const float ng = (float)(((double)(r * p[1]) + (double)(g * p[4])) +
                                   (double)(b * p[7]));
          const float nb = (float)(((double)(r * p[2]) + (double)(g * p[5])) +
                                   (double)(b * p[8]));
          r = nr;
          g = ng;
          b = nb;
          break;
        }
      }
    }
    out[i * 3 + 0] = r;
    out[i * 3 + 1] = g;
    out[i * 3 + 2] = b;
  }
}

extern "C" {

// Fused MixupImage blend (transforms.py MixupImage, reference
// transform.py:131-191): out[H,W,C] = u8(f32(im1)*f1 [over im1's region]
// + f32(im2)*f2 [over im2's region]), zero-filled elsewhere, H/W = max of
// the two shapes, both anchored at the origin.  One pass, zero
// temporaries — the numpy chain materializes a zeros canvas, two astype
// copies, two scaled products and a final cast (4 full-image temporaries).
// Bitwise-identical: products round f32 (f1/f2 pre-cast from the weak
// python-float factors), the overlap add is f32 canvas+product in the
// same order, and the final (uint8_t) cast is C truncation == astype's.
void mixup_u8(const uint8_t* im1, int64_t h1, int64_t w1,
              const uint8_t* im2, int64_t h2, int64_t w2,
              float f1, float f2, int64_t ch, uint8_t* out) {
  const int64_t H = h1 > h2 ? h1 : h2;
  const int64_t W = w1 > w2 ? w1 : w2;
  for (int64_t y = 0; y < H; ++y) {
    const bool in1y = y < h1, in2y = y < h2;
    for (int64_t x = 0; x < W; ++x) {
      const bool in1 = in1y && x < w1, in2 = in2y && x < w2;
      for (int64_t c = 0; c < ch; ++c) {
        float v = 0.0f;
        if (in1) v = (float)im1[(y * w1 + x) * ch + c] * f1;
        if (in2) v += (float)im2[(y * w2 + x) * ch + c] * f2;
        out[(y * W + x) * ch + c] = (uint8_t)v;
      }
    }
  }
}

void color_distort_u8(const uint8_t* src, int64_t n_px, const int32_t* ops,
                      const float* params, int64_t n_ops, float* out) {
  color_distort_impl(src, n_px, ops, params, n_ops, out);
}

void color_distort_f32(const float* src, int64_t n_px, const int32_t* ops,
                       const float* params, int64_t n_ops, float* out) {
  color_distort_impl(src, n_px, ops, params, n_ops, out);
}

}  // extern "C"
