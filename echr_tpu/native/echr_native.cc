// Native host-side kernels for echr_tpu.
//
// These replace the input pipeline's hottest host loops with C++:
//   * iou_grid     — dense anchor/GT IoU label grid, the O(T*K*n_gt)
//                    computation the reference runs as a Python triple loop
//                    per video per epoch (reference: dataloader.py:350-357);
//                    semantics identical incl. the +-0.01 GT nudges and the
//                    `>=` running-max (last-argmax) tie-break.
//   * nms_temporal — greedy temporal NMS over all anchors (reference:
//                    eval_utils.py:290-331) with +1 area padding.
//   * nms_external — external-proposal NMS picking the best-sentence-score
//                    representative per cluster (reference: eval_utils.py:
//                    230-256) with +1e-3 area padding.
//
// Built with `make -C echr_tpu/native` (or auto-built on first import by
// echr_tpu.native.ensure_built) into echr_native.so; loaded via ctypes.

#include <algorithm>
#include <cstdint>
#include <cmath>
#include <numeric>
#include <vector>

extern "C" {

// iou_out/gts_out: [T, K] float32; mask_out: [T, K] float32.
// gt: [n_gt, 2] int64 featstamps.
void iou_grid(const int64_t* gt, int n_gt, int T, int K,
              float* iou_out, float* gts_out, float* mask_out) {
  std::vector<double> gs(n_gt), ge(n_gt), glen(n_gt);
  for (int g = 0; g < n_gt; ++g) {
    gs[g] = static_cast<double>(gt[2 * g]) - 0.01;
    ge[g] = static_cast<double>(gt[2 * g + 1]) + 0.01;
    glen[g] = ge[g] - gs[g];
  }
  for (int t = 0; t < T; ++t) {
    const int kmax = std::min(K, t);  // anchor (t-k-1, t] valid iff t >= k+1
    float* iou_row = iou_out + static_cast<size_t>(t) * K;
    float* gts_row = gts_out + static_cast<size_t>(t) * K;
    float* msk_row = mask_out + static_cast<size_t>(t) * K;
    for (int k = 0; k < K; ++k) {
      iou_row[k] = 0.f;
      gts_row[k] = 0.f;
      msk_row[k] = (k < kmax) ? 1.f : 0.f;
    }
    const double end_i = static_cast<double>(t);
    for (int k = 0; k < kmax; ++k) {
      const double start_i = static_cast<double>(t - k - 1);
      const double alen = end_i - start_i;
      double best = 0.0;
      int best_g = -1;
      for (int g = 0; g < n_gt; ++g) {
        const double inter =
            std::max(0.0, std::min(ge[g], end_i) - std::max(gs[g], start_i));
        const double uni = std::min(std::max(ge[g], end_i) - std::min(gs[g], start_i),
                                    glen[g] + alen);
        const double ov = inter / (uni + 1e-8);
        if (ov >= best) {  // `>=`: last GT achieving the max wins
          best = ov;
          best_g = g;
        }
      }
      iou_row[k] = static_cast<float>(best);
      gts_row[k] = static_cast<float>(best_g < 0 ? 0 : best_g);
    }
  }
}

// Greedy temporal NMS (descending score). props [n,2] int64 [start,end);
// scores [n] float64. pick_out must hold topN ints. Returns #picked.
// area/overlap use the reference's +pad widening (1.0 for grid NMS).
int nms_temporal(const int64_t* props, const double* scores, int n,
                 double overlap, int topN, double pad, int* pick_out) {
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return scores[a] < scores[b]; });
  std::vector<char> alive(n, 1);
  int n_pick = 0;
  int top = n - 1;
  while (n_pick < topN) {
    while (top >= 0 && !alive[order[top]]) --top;
    if (top < 0) break;
    const int i = order[top];
    alive[i] = 0;
    --top;
    pick_out[n_pick++] = i;
    const double t1i = static_cast<double>(props[2 * i]);
    const double t2i = static_cast<double>(props[2 * i + 1]);
    const double area_i = t2i - t1i + pad;
    for (int jo = 0; jo <= top; ++jo) {
      const int j = order[jo];
      if (!alive[j]) continue;
      const double t1 = std::max(t1i, static_cast<double>(props[2 * j]));
      const double t2 = std::min(t2i, static_cast<double>(props[2 * j + 1]));
      const double wh = std::max(0.0, t2 - t1 + pad);
      const double area_j =
          static_cast<double>(props[2 * j + 1]) - static_cast<double>(props[2 * j]) + pad;
      const double o = wh / (area_i + area_j - wh);
      if (o > overlap) alive[j] = 0;
    }
  }
  return n_pick;
}

// External-proposal NMS: among each >=overlap cluster of the current top
// proposal, pick the one with the best sentence score; remove the cluster.
// props [n,2] float64 here (timestamps in seconds).
int nms_external(const double* props, const double* prop_scores,
                 const double* sent_scores, int n, double overlap, int topN,
                 int* pick_out) {
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(),
                   [&](int a, int b) { return prop_scores[a] < prop_scores[b]; });
  std::vector<char> alive(n, 1);
  int n_pick = 0;
  int top = n - 1;
  const double pad = 1e-3;
  while (n_pick < topN) {
    while (top >= 0 && !alive[order[top]]) --top;
    if (top < 0) break;
    const int i = order[top];
    const double t1i = props[2 * i], t2i = props[2 * i + 1];
    const double area_i = t2i - t1i + pad;
    int best_j = -1;
    double best_s = -1e300;
    // cluster = alive proposals with o >= overlap (incl. i itself, o == 1)
    for (int jo = 0; jo <= top; ++jo) {
      const int j = order[jo];
      if (!alive[j]) continue;
      const double t1 = std::max(t1i, props[2 * j]);
      const double t2 = std::min(t2i, props[2 * j + 1]);
      const double wh = std::max(0.0, t2 - t1 + pad);
      const double area_j = props[2 * j + 1] - props[2 * j] + pad;
      const double o = wh / (area_i + area_j - wh);
      if (o >= overlap && sent_scores[j] > best_s) {
        best_s = sent_scores[j];
        best_j = j;
      }
      if (o > overlap) alive[j] = 0;
    }
    alive[i] = 0;
    if (best_j >= 0) pick_out[n_pick++] = best_j;
  }
  return n_pick;
}

// render_captions — ids -> space-joined sentences, the eval pipelines' host
// assembly hot loop (echr_tpu/utils/text.decode_sequence; the reference
// does this per token in Python, misc/utils.py:24-38).  Runs GIL-free via
// ctypes so caption assembly overlaps the prefetch workers.
//
// words:   packed UTF-8 bytes of all vocabulary words, concatenated
// offsets: [V + 1] int32 — word i is words[offsets[i] : offsets[i+1]];
//          id 0 (END) and any id >= V render as "" (id 0 stops the row)
// seq:     [N, L] int32 token ids
// out:     caller buffer of capacity `cap` bytes
// out_off: [N + 1] int64 — sentence i is out[out_off[i] : out_off[i+1]]
// returns total bytes written, or -1 if `cap` is insufficient (caller
// retries with a bigger buffer).
int64_t render_captions(const char* words, const int32_t* offsets, int V,
                        const int32_t* seq, int N, int L,
                        char* out, int64_t cap, int64_t* out_off) {
  int64_t w = 0;
  for (int i = 0; i < N; ++i) {
    out_off[i] = w;
    const int32_t* row = seq + static_cast<int64_t>(i) * L;
    bool first = true;
    for (int t = 0; t < L; ++t) {
      const int32_t ix = row[t];
      if (ix <= 0) break;  // END stops the row
      if (ix >= V) continue;  // out-of-vocab guard: render as nothing
      const int32_t a = offsets[ix], b = offsets[ix + 1];
      const int32_t len = b - a;
      if (w + len + 1 > cap) return -1;
      if (!first) out[w++] = ' ';
      std::copy(words + a, words + b, out + w);
      w += len;
      first = false;
    }
  }
  out_off[N] = w;
  return w;
}

}  // extern "C"
