// Reference-shaped CPU anchor for the full tracking-step benchmark.
//
// Measures the steady-state WORKING-frame cost a single CPU thread pays
// with the reference's own components and ORB-SLAM's algorithms:
//   1. ORB extraction with the reference's ORBextractor (compiled from
//      /root/reference sources in place — same harness pattern as
//      tests/test_reference_parity.py),
//   2. grid-accelerated projection matching of an 8192-point map into the
//      frame (Frame.cpp:71-77 64x48 grid; SearchByProjection semantics:
//      radius 15 * scale^octave window, best Hamming <= TH_HIGH=100),
//   3. pose-only optimization: 4 rounds x 10 LM iterations on Huber-
//      weighted reprojection error with analytic Jacobians (the ORB-SLAM
//      PoseOptimization budget the vendored g2o stack implements).
//
// Build:  make anchor   (see Makefile; needs OpenCV + the reference tree)
// Output: one JSON line {"metric": "tracking_step_cpu_anchor", ...}

#include <algorithm>
#include <chrono>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <random>
#include <vector>

#include <opencv2/core.hpp>

#include "Features/ORBextractor.hpp"

namespace {

constexpr int kWidth = 640, kHeight = 480;
constexpr float kFx = 450.f, kFy = 450.f, kCx = 320.f, kCy = 240.f;
constexpr int kMapPoints = 8192;
constexpr int kThHigh = 100;        // ORBmatcher TH_HIGH
constexpr float kRadius = 15.f;     // projection window (px, octave-scaled)
constexpr int kGridCols = 64, kGridRows = 48;  // Frame.hpp:15-16

inline int hamming(const uint64_t* a, const uint64_t* b) {
  int d = 0;
  for (int i = 0; i < 4; ++i) d += __builtin_popcountll(a[i] ^ b[i]);
  return d;
}

struct Map {
  std::vector<cv::Point3f> pts;
  std::vector<std::array<uint64_t, 4>> desc;
};

// 6x6 Cholesky solve (H x = b), in-place on copies.
bool solve66(double H[6][6], double b[6], double x[6]) {
  double L[6][6] = {};
  for (int i = 0; i < 6; ++i) {
    for (int j = 0; j <= i; ++j) {
      double s = H[i][j];
      for (int k = 0; k < j; ++k) s -= L[i][k] * L[j][k];
      if (i == j) {
        if (s <= 1e-12) return false;
        L[i][i] = std::sqrt(s);
      } else {
        L[i][j] = s / L[j][j];
      }
    }
  }
  double y[6];
  for (int i = 0; i < 6; ++i) {
    double s = b[i];
    for (int k = 0; k < i; ++k) s -= L[i][k] * y[k];
    y[i] = s / L[i][i];
  }
  for (int i = 5; i >= 0; --i) {
    double s = y[i];
    for (int k = i + 1; k < 6; ++k) s -= L[k][i] * x[k];
    x[i] = s / L[i][i];
  }
  return true;
}

void rodrigues(const double w[3], double R[3][3]) {
  double th = std::sqrt(w[0] * w[0] + w[1] * w[1] + w[2] * w[2]);
  double c = std::cos(th), s = std::sin(th);
  double a0 = 0, a1 = 0, a2 = 0;
  if (th > 1e-12) { a0 = w[0] / th; a1 = w[1] / th; a2 = w[2] / th; }
  double C = 1 - c;
  R[0][0] = c + a0 * a0 * C;       R[0][1] = a0 * a1 * C - a2 * s; R[0][2] = a0 * a2 * C + a1 * s;
  R[1][0] = a1 * a0 * C + a2 * s;  R[1][1] = c + a1 * a1 * C;      R[1][2] = a1 * a2 * C - a0 * s;
  R[2][0] = a2 * a0 * C - a1 * s;  R[2][1] = a2 * a1 * C + a0 * s; R[2][2] = c + a2 * a2 * C;
}

struct Pose {
  double R[3][3] = {{1, 0, 0}, {0, 1, 0}, {0, 0, 1}};
  double t[3] = {0, 0, 0};
};

}  // namespace

int main() {
  // deterministic synthetic texture, like the device bench
  std::mt19937 rng(0);
  std::uniform_int_distribution<int> u8(0, 255);
  cv::Mat img(kHeight, kWidth, CV_8UC1);
  for (int y = 0; y < kHeight; ++y)
    for (int x = 0; x < kWidth; ++x) img.at<uint8_t>(y, x) = (uint8_t)u8(rng);

  ORB_SLAM_Tracking::ORBextractor extractor(1000, 1.2f, 8, 20, 7);
  std::vector<float> scale_f;
  for (int i = 0; i < 8; ++i) scale_f.push_back(std::pow(1.2f, i));

  // one extraction to seed the map: back-project keypoints at random
  // depths and replicate (with descriptor jitter) to kMapPoints
  std::vector<cv::KeyPoint> kps;
  cv::Mat desc;
  std::vector<int> lapping = {0, 0};
  extractor(img, cv::Mat(), kps, desc, lapping);
  std::uniform_real_distribution<float> zdist(4.f, 9.f);
  Map map;
  std::uniform_int_distribution<int> pick(0, (int)kps.size() - 1);
  std::uniform_int_distribution<int> bitpick(0, 255);
  for (int i = 0; i < kMapPoints; ++i) {
    int j = (i < (int)kps.size()) ? i : pick(rng);
    float z = zdist(rng);
    float X = (kps[j].pt.x - kCx) / kFx * z;
    float Y = (kps[j].pt.y - kCy) / kFy * z;
    map.pts.push_back({X, Y, z});
    std::array<uint64_t, 4> d;
    std::memcpy(d.data(), desc.ptr(j), 32);
    if (i >= (int)kps.size()) {  // jitter a few bits on the replicas
      for (int bflip = 0; bflip < 5; ++bflip) {
        int b = bitpick(rng);
        d[b >> 6] ^= (uint64_t(1) << (b & 63));
      }
    }
    map.desc.push_back(d);
  }

  auto run_frame = [&](Pose& pose) {
    // 1. extraction
    std::vector<cv::KeyPoint> fk;
    cv::Mat fd;
    std::vector<int> lap = {0, 0};
    extractor(img, cv::Mat(), fk, fd, lap);
    const int N = (int)fk.size();

    // 2. grid binning (Frame.cpp:71-77)
    std::vector<std::vector<int>> grid(kGridCols * kGridRows);
    const float inv_cw = (float)kGridCols / kWidth;
    const float inv_ch = (float)kGridRows / kHeight;
    for (int i = 0; i < N; ++i) {
      int cx = (int)(fk[i].pt.x * inv_cw), cy = (int)(fk[i].pt.y * inv_ch);
      if (cx >= 0 && cx < kGridCols && cy >= 0 && cy < kGridRows)
        grid[cy * kGridCols + cx].push_back(i);
    }

    // 3. SearchByProjection: per map point, window search + best Hamming
    std::vector<int> match_kp;   // matched keypoint per obs
    std::vector<int> match_pt;
    match_kp.reserve(1024);
    for (int p = 0; p < kMapPoints; ++p) {
      const auto& P = map.pts[p];
      double pc[3] = {
          pose.R[0][0] * P.x + pose.R[0][1] * P.y + pose.R[0][2] * P.z + pose.t[0],
          pose.R[1][0] * P.x + pose.R[1][1] * P.y + pose.R[1][2] * P.z + pose.t[1],
          pose.R[2][0] * P.x + pose.R[2][1] * P.y + pose.R[2][2] * P.z + pose.t[2]};
      if (pc[2] < 0.1) continue;
      float u = (float)(kFx * pc[0] / pc[2] + kCx);
      float v = (float)(kFy * pc[1] / pc[2] + kCy);
      if (u < 0 || u >= kWidth || v < 0 || v >= kHeight) continue;
      int best = 256, best_i = -1;
      int cx0 = std::max(0, (int)((u - kRadius * 2) * inv_cw));
      int cx1 = std::min(kGridCols - 1, (int)((u + kRadius * 2) * inv_cw));
      int cy0 = std::max(0, (int)((v - kRadius * 2) * inv_ch));
      int cy1 = std::min(kGridRows - 1, (int)((v + kRadius * 2) * inv_ch));
      for (int cy = cy0; cy <= cy1; ++cy)
        for (int cx = cx0; cx <= cx1; ++cx)
          for (int i : grid[cy * kGridCols + cx]) {
            float r_eff = kRadius * scale_f[fk[i].octave];
            if (std::abs(fk[i].pt.x - u) > r_eff ||
                std::abs(fk[i].pt.y - v) > r_eff)
              continue;
            int d = hamming(map.desc[p].data(),
                            reinterpret_cast<const uint64_t*>(fd.ptr(i)));
            if (d < best) { best = d; best_i = i; }
          }
      if (best_i >= 0 && best <= kThHigh) {
        match_pt.push_back(p);
        match_kp.push_back(best_i);
      }
    }

    // 4. pose-only LM: ORB-SLAM budget 4 rounds x 10 iterations,
    //    Huber delta^2 = 5.991, per-octave information
    const double chi2_th = 5.991;
    double lambda = 1e-4;
    for (int round = 0; round < 4; ++round) {
      for (int it = 0; it < 10; ++it) {
        double H[6][6] = {}, b[6] = {};
        double cost = 0;
        for (size_t m2 = 0; m2 < match_pt.size(); ++m2) {
          const auto& P = map.pts[match_pt[m2]];
          const auto& kp = fk[match_kp[m2]];
          double inv_s2 = 1.0 / (scale_f[kp.octave] * scale_f[kp.octave]);
          double pc[3] = {
              pose.R[0][0] * P.x + pose.R[0][1] * P.y + pose.R[0][2] * P.z + pose.t[0],
              pose.R[1][0] * P.x + pose.R[1][1] * P.y + pose.R[1][2] * P.z + pose.t[1],
              pose.R[2][0] * P.x + pose.R[2][1] * P.y + pose.R[2][2] * P.z + pose.t[2]};
          double zi = 1.0 / std::max(pc[2], 1e-9);
          double ru = kFx * pc[0] * zi + kCx - kp.pt.x;
          double rv = kFy * pc[1] * zi + kCy - kp.pt.y;
          double chi2 = (ru * ru + rv * rv) * inv_s2;
          double w = inv_s2;
          if (chi2 > chi2_th) w *= std::sqrt(chi2_th / chi2);  // Huber IRLS
          cost += std::min(chi2, 2 * std::sqrt(chi2_th * chi2) - chi2_th);
          // J = dproj/dpc * [ -[pc]x | I ]: the standard pose-only
          // reprojection Jacobian (g2o EdgeSE3ProjectXYZOnlyPose form)
          double Ju[6], Jv[6];
          double fxzi = kFx * zi, fyzi = kFy * zi;
          double uxz = kFx * pc[0] * zi * zi, vyz = kFy * pc[1] * zi * zi;
          // translation block
          Ju[3] = fxzi; Ju[4] = 0;    Ju[5] = -uxz;
          Jv[3] = 0;    Jv[4] = fyzi; Jv[5] = -vyz;
          {
            double x = pc[0], y = pc[1];
            Ju[0] = -kFx * x * y * zi * zi;
            Ju[1] = kFx * (1.0 + x * x * zi * zi);
            Ju[2] = -kFx * y * zi;
            Jv[0] = -kFy * (1.0 + y * y * zi * zi);
            Jv[1] = kFy * x * y * zi * zi;
            Jv[2] = kFy * x * zi;
          }
          for (int i = 0; i < 6; ++i) {
            for (int j = 0; j < 6; ++j) H[i][j] += w * (Ju[i] * Ju[j] + Jv[i] * Jv[j]);
            b[i] += w * (Ju[i] * ru + Jv[i] * rv);
          }
        }
        for (int i = 0; i < 6; ++i) H[i][i] *= (1.0 + lambda);
        double dx[6];
        for (int i = 0; i < 6; ++i) b[i] = -b[i];
        if (!solve66(H, b, dx)) break;
        // left-multiplied update: R <- dR R, t <- dR t + dt
        double w3[3] = {dx[0], dx[1], dx[2]};
        double dR[3][3];
        rodrigues(w3, dR);
        double Rn[3][3], tn[3];
        for (int i = 0; i < 3; ++i) {
          for (int j = 0; j < 3; ++j)
            Rn[i][j] = dR[i][0] * pose.R[0][j] + dR[i][1] * pose.R[1][j] + dR[i][2] * pose.R[2][j];
          tn[i] = dR[i][0] * pose.t[0] + dR[i][1] * pose.t[1] + dR[i][2] * pose.t[2] + dx[3 + i];
        }
        std::memcpy(pose.R, Rn, sizeof(Rn));
        std::memcpy(pose.t, tn, sizeof(tn));
      }
      // outlier reclassification between rounds: drop chi2 > threshold
      std::vector<int> keep_pt, keep_kp;
      for (size_t m2 = 0; m2 < match_pt.size(); ++m2) {
        const auto& P = map.pts[match_pt[m2]];
        const auto& kp = fk[match_kp[m2]];
        double inv_s2 = 1.0 / (scale_f[kp.octave] * scale_f[kp.octave]);
        double pc2 =
            pose.R[2][0] * P.x + pose.R[2][1] * P.y + pose.R[2][2] * P.z + pose.t[2];
        double pc0 =
            pose.R[0][0] * P.x + pose.R[0][1] * P.y + pose.R[0][2] * P.z + pose.t[0];
        double pc1 =
            pose.R[1][0] * P.x + pose.R[1][1] * P.y + pose.R[1][2] * P.z + pose.t[1];
        double zi = 1.0 / std::max(pc2, 1e-9);
        double ru = kFx * pc0 * zi + kCx - kp.pt.x;
        double rv = kFy * pc1 * zi + kCy - kp.pt.y;
        if ((ru * ru + rv * rv) * inv_s2 <= chi2_th * 1.2) {
          keep_pt.push_back(match_pt[m2]);
          keep_kp.push_back(match_kp[m2]);
        }
      }
      match_pt.swap(keep_pt);
      match_kp.swap(keep_kp);
    }
    return (int)match_pt.size();
  };

  // warmup
  Pose pose;
  int n_assoc = run_frame(pose);

  const int frames = 40;
  auto t0 = std::chrono::steady_clock::now();
  for (int f = 0; f < frames; ++f) {
    Pose p2;  // fresh pose each frame (steady-state tracking shape)
    n_assoc = run_frame(p2);
  }
  auto t1 = std::chrono::steady_clock::now();
  double dt = std::chrono::duration<double>(t1 - t0).count();
  std::printf(
      "{\"metric\": \"tracking_step_cpu_anchor\", \"frames_per_s\": %.2f, "
      "\"ms_per_frame\": %.3f, \"associations\": %d}\n",
      frames / dt, dt / frames * 1e3, n_assoc);
  return 0;
}
