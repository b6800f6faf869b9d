// wmd_native — native host-side runtime for wavelet_monodepth_tpu.
//
// The TPU compute path is JAX/XLA/Pallas; this library is the native
// equivalent of the reference's host-side runtime, which lives in
// external C libraries (pillow-SIMD JPEG decode + DataLoader worker
// processes, `KITTI/datasets/mono_dataset.py:14`; OpenCV resize;
// velodyne projection in numpy, `KITTI/kitti_utils.py:52-104`).
//
// Exposed as a plain C ABI consumed via ctypes
// (wavelet_monodepth_tpu/data/native_loader.py):
//   wmd_decode_resize_batch  multithreaded image decode + Lanczos resize
//                            + multi-scale pyramid, float32 NHWC [0,1]
//   wmd_velodyne_to_depth    velodyne point projection -> sparse depth
//                            (min-depth duplicate resolution)
//   wmd_haar_dwt2 / idwt2    orthonormal Haar transform, CPU reference
//
// Build: native/build.sh (g++ -O3 -shared, links OpenCV imgcodecs/imgproc).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <limits>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>

extern "C" {

// Decode n images and write a float32 NHWC batch in [0,1].
// paths: array of n C strings. out: n * height * width * 3 floats.
// flip[i] != 0 mirrors image i horizontally. Returns 0 on success,
// else the index+1 of the first image that failed to load.
int wmd_decode_resize_batch(const char** paths, int n, int height,
                            int width, const int* flip, float* out,
                            int num_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) return;
      cv::Mat img = cv::imread(paths[i], cv::IMREAD_COLOR);
      if (img.empty()) {
        failed.store(i + 1);
        return;
      }
      cv::cvtColor(img, img, cv::COLOR_BGR2RGB);
      cv::Mat resized;
      cv::resize(img, resized, cv::Size(width, height), 0, 0,
                 cv::INTER_LANCZOS4);
      if (flip && flip[i]) {
        cv::flip(resized, resized, 1);
      }
      cv::Mat f32;
      resized.convertTo(f32, CV_32FC3, 1.0 / 255.0);
      std::memcpy(out + static_cast<size_t>(i) * height * width * 3,
                  f32.ptr<float>(),
                  sizeof(float) * height * width * 3);
    }
  };
  int t = std::max(1, num_threads);
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int k = 0; k < t; ++k) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return failed.load();
}

// Same decode+resize, but emits the resized uint8 NHWC batch directly
// (no float conversion): the uint8 eval/serving feed ships 4x fewer
// bytes and the device casts to [0,1] float itself. The float variant
// above equals this output * (1/255) exactly (convertTo happens after
// the uint8 resize).
int wmd_decode_resize_batch_u8(const char** paths, int n, int height,
                               int width, const int* flip,
                               unsigned char* out, int num_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failed(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n || failed.load() != 0) return;
      cv::Mat img = cv::imread(paths[i], cv::IMREAD_COLOR);
      if (img.empty()) {
        failed.store(i + 1);
        return;
      }
      cv::cvtColor(img, img, cv::COLOR_BGR2RGB);
      cv::Mat resized;
      cv::resize(img, resized, cv::Size(width, height), 0, 0,
                 cv::INTER_LANCZOS4);
      if (flip && flip[i]) {
        cv::flip(resized, resized, 1);
      }
      std::memcpy(out + static_cast<size_t>(i) * height * width * 3,
                  resized.ptr<unsigned char>(),
                  static_cast<size_t>(height) * width * 3);
    }
  };
  int t = std::max(1, num_threads);
  std::vector<std::thread> threads;
  threads.reserve(t);
  for (int k = 0; k < t; ++k) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
  return failed.load();
}

// Antialiased (Lanczos, matching mono_dataset.py's Resize)
// half-scale pyramid from a float32 NHW3 image:
// writes `levels` downscaled copies (each half the previous) into outs,
// mirroring the multi-scale pyramid of `mono_dataset.py:111-116` but
// computed natively.
void wmd_build_pyramid(const float* img, int height, int width,
                       int levels, float** outs) {
  std::vector<float> cur(img, img + static_cast<size_t>(height) * width * 3);
  int h = height, w = width;
  for (int l = 0; l < levels; ++l) {
    int nh = h / 2, nw = w / 2;
    cv::Mat src(h, w, CV_32FC3, cur.data());
    cv::Mat dst;
    cv::resize(src, dst, cv::Size(nw, nh), 0, 0, cv::INTER_LANCZOS4);
    std::memcpy(outs[l], dst.ptr<float>(),
                sizeof(float) * nh * nw * 3);
    cur.assign(dst.ptr<float>(),
               dst.ptr<float>() + static_cast<size_t>(nh) * nw * 3);
    h = nh;
    w = nw;
  }
}

// Velodyne -> sparse depth map (the projection of
// `kitti_utils.py:52-104`). P_velo2im is the 3x4 row-major projection
// (P_rect @ R_rect @ Tr_velo_to_cam). Duplicate pixels keep the
// minimum depth. points: n x 4 (x, y, z, reflectance).
void wmd_velodyne_to_depth(const float* points, int n,
                           const double* P_velo2im, int im_h, int im_w,
                           float* depth_out) {
  const float f_nan = std::numeric_limits<float>::quiet_NaN();
  std::fill(depth_out, depth_out + static_cast<size_t>(im_h) * im_w, f_nan);
  for (int i = 0; i < n; ++i) {
    const float* p = points + i * 4;
    if (p[0] < 0) continue;  // velo x filter (kitti_utils.py:54)
    double u = P_velo2im[0] * p[0] + P_velo2im[1] * p[1] +
               P_velo2im[2] * p[2] + P_velo2im[3];
    double v = P_velo2im[4] * p[0] + P_velo2im[5] * p[1] +
               P_velo2im[6] * p[2] + P_velo2im[7];
    double z = P_velo2im[8] * p[0] + P_velo2im[9] * p[1] +
               P_velo2im[10] * p[2] + P_velo2im[11];
    // NO z<=0 skip: the numpy path projects negative-z points too and
    // lets min-resolution + the final depth[depth<0]=0 zero them — a
    // pixel seen by a negative-z AND a positive-z point must come out 0
    double ud = u / z, vd = v / z;
    if (!std::isfinite(ud) || !std::isfinite(vd)) continue;
    // rint = round-half-even like np.round (lround's half-away-from-
    // zero shifts .5-exact hits by one pixel vs the devkit convention);
    // round-minus-one matches the KITTI matlab devkit indexing
    long x = static_cast<long>(std::rint(ud)) - 1;
    long y = static_cast<long>(std::rint(vd)) - 1;
    if (x < 0 || y < 0 || x >= im_w || y >= im_h) continue;
    float* cell = depth_out + y * im_w + x;
    float d = static_cast<float>(z);
    if (std::isnan(*cell) || d < *cell) *cell = d;
  }
  for (size_t i = 0; i < static_cast<size_t>(im_h) * im_w; ++i) {
    if (std::isnan(depth_out[i]) || depth_out[i] < 0) depth_out[i] = 0;
  }
}

// Orthonormal 2-D Haar forward transform, single level.
// x: (h, w) float32 with even h, w -> four (h/2, w/2) bands.
void wmd_haar_dwt2(const float* x, int h, int w, float* ll, float* lh,
                   float* hl, float* hh) {
  int oh = h / 2, ow = w / 2;
  for (int i = 0; i < oh; ++i) {
    for (int j = 0; j < ow; ++j) {
      float a = x[(2 * i) * w + 2 * j];
      float b = x[(2 * i) * w + 2 * j + 1];
      float c = x[(2 * i + 1) * w + 2 * j];
      float d = x[(2 * i + 1) * w + 2 * j + 1];
      ll[i * ow + j] = 0.5f * (a + b + c + d);
      lh[i * ow + j] = 0.5f * (a + b - c - d);
      hl[i * ow + j] = 0.5f * (a - b + c - d);
      hh[i * ow + j] = 0.5f * (a - b - c + d);
    }
  }
}

// Inverse of wmd_haar_dwt2.
void wmd_haar_idwt2(const float* ll, const float* lh, const float* hl,
                    const float* hh, int oh, int ow, float* x) {
  int h = oh * 2, w = ow * 2;
  for (int i = 0; i < oh; ++i) {
    for (int j = 0; j < ow; ++j) {
      float l = ll[i * ow + j];
      float a = lh[i * ow + j];
      float b = hl[i * ow + j];
      float c = hh[i * ow + j];
      x[(2 * i) * w + 2 * j] = 0.5f * (l + a + b + c);
      x[(2 * i) * w + 2 * j + 1] = 0.5f * (l + a - b - c);
      x[(2 * i + 1) * w + 2 * j] = 0.5f * (l - a + b - c);
      x[(2 * i + 1) * w + 2 * j + 1] = 0.5f * (l - a - b + c);
    }
  }
}

}  // extern "C"
