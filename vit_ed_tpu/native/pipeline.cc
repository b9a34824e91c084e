// Native input-pipeline runtime: crop -> resample -> normalize, plus a
// persistent worker pool that prepares whole batches off the Python thread.
//
// This is the TPU-host equivalent of the reference's torch DataLoader worker
// processes (torch.utils.data in /root/reference/data/build.py): instead of
// pickling samples across process boundaries, image preparation runs in
// C++ threads that share the batch output buffer with numpy (zero copies,
// GIL released for the whole batch).
//
// Resampling reimplements the standard separable-convolution scheme that
// Pillow uses (triangle / Catmull-Rom kernels evaluated in 22-bit fixed
// point), so outputs are BIT-EXACT against PIL's Image.resize for both
// BILINEAR and BICUBIC on uint8 images — verified exhaustively-ish in
// tests/test_native_pipeline.py. Grayscale conversion matches PIL "L"
// (ITU-R 601-2: (R*19595 + G*38470 + B*7471 + 0x8000) >> 16).
//
// Normalization is the fused single pass for
//   (np.asarray(img, float32) / 255.0 - mean) / std
// with identical f32 op order, so it is bit-exact vs the numpy chain in
// data/transforms.py (to_tensor + normalize) while touching memory once.

#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow's 8bpc fixed point

inline uint8_t clip8(int in) {
  if (in >= (1 << (kPrecisionBits + 8))) return 255;
  if (in <= 0) return 0;
  return static_cast<uint8_t>(in >> kPrecisionBits);
}

struct Filter {
  double (*fn)(double);
  double support;
};

double bilinear_filter(double x) {
  if (x < 0.0) x = -x;
  if (x < 1.0) return 1.0 - x;
  return 0.0;
}

double bicubic_filter(double x) {
  // Catmull-Rom spline, a = -0.5 (Pillow's BICUBIC)
  constexpr double a = -0.5;
  if (x < 0.0) x = -x;
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

const Filter kBilinear = {bilinear_filter, 1.0};
const Filter kBicubic = {bicubic_filter, 2.0};

// Coefficients for one resampled axis: for each output position, the input
// window [bounds[2i], bounds[2i]+bounds[2i+1]) and ksize fixed-point weights.
int precompute_coeffs(int in_size, int out_size, const Filter& filter,
                      std::vector<int>& bounds, std::vector<int>& kk) {
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = filter.support * filterscale;
  int ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  bounds.assign(out_size * 2, 0);
  std::vector<double> w(out_size * ksize, 0.0);
  double ss = 1.0 / filterscale;
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &w[xx * ksize];
    double ww = 0.0;
    for (int x = 0; x < xmax; ++x) {
      double v = filter.fn((x + xmin - center + 0.5) * ss);
      k[x] = v;
      ww += v;
    }
    if (ww != 0.0) {
      for (int x = 0; x < xmax; ++x) k[x] /= ww;
    }
    bounds[xx * 2] = xmin;
    bounds[xx * 2 + 1] = xmax;
  }
  kk.assign(out_size * ksize, 0);
  for (size_t i = 0; i < w.size(); ++i) {
    kk[i] = w[i] < 0.0
                ? static_cast<int>(-0.5 + w[i] * (1 << kPrecisionBits))
                : static_cast<int>(0.5 + w[i] * (1 << kPrecisionBits));
  }
  return ksize;
}

// Horizontal pass: [h, w_in, c] u8 -> [h, w_out, c] u8 (row stride given so
// the source can be a crop view into a larger image).
void resample_horizontal(const uint8_t* src, int64_t src_stride, int h,
                         int w_out, int c, const std::vector<int>& bounds,
                         const std::vector<int>& kk, int ksize, uint8_t* dst) {
  for (int yy = 0; yy < h; ++yy) {
    const uint8_t* row = src + yy * src_stride;
    uint8_t* orow = dst + static_cast<int64_t>(yy) * w_out * c;
    for (int xx = 0; xx < w_out; ++xx) {
      int xmin = bounds[xx * 2];
      int xmax = bounds[xx * 2 + 1];
      const int* k = &kk[xx * ksize];
      for (int ch = 0; ch < c; ++ch) {
        int ss = 1 << (kPrecisionBits - 1);
        const uint8_t* p = row + static_cast<int64_t>(xmin) * c + ch;
        for (int x = 0; x < xmax; ++x) ss += p[static_cast<int64_t>(x) * c] * k[x];
        orow[xx * c + ch] = clip8(ss);
      }
    }
  }
}

// Vertical pass: [h_in, w, c] u8 (contiguous) -> [h_out, w, c] u8.
void resample_vertical(const uint8_t* src, int w, int h_out, int c,
                       const std::vector<int>& bounds, const std::vector<int>& kk,
                       int ksize, uint8_t* dst) {
  int64_t row = static_cast<int64_t>(w) * c;
  for (int yy = 0; yy < h_out; ++yy) {
    int ymin = bounds[yy * 2];
    int ymax = bounds[yy * 2 + 1];
    const int* k = &kk[yy * ksize];
    uint8_t* orow = dst + yy * row;
    for (int64_t i = 0; i < row; ++i) {
      int ss = 1 << (kPrecisionBits - 1);
      const uint8_t* p = src + ymin * row + i;
      for (int y = 0; y < ymax; ++y) ss += p[y * row] * k[y];
      orow[i] = clip8(ss);
    }
  }
}

// Full resample of a crop view: src[y0:y0+ch_, x0:x0+cw_] -> dst [oh, ow, c].
// Returns 0 on success.
int resample(const uint8_t* src, int h, int w, int c, int y0, int x0, int ch_,
             int cw_, uint8_t* dst, int oh, int ow, const Filter& filter) {
  if (y0 < 0 || x0 < 0 || ch_ <= 0 || cw_ <= 0 || y0 + ch_ > h || x0 + cw_ > w)
    return 1;
  if (oh <= 0 || ow <= 0 || c <= 0) return 1;
  const uint8_t* view = src + (static_cast<int64_t>(y0) * w + x0) * c;
  int64_t stride = static_cast<int64_t>(w) * c;

  if (cw_ == ow && ch_ == oh) {  // pure crop
    for (int yy = 0; yy < oh; ++yy)
      std::memcpy(dst + static_cast<int64_t>(yy) * ow * c, view + yy * stride,
                  static_cast<size_t>(ow) * c);
    return 0;
  }

  std::vector<int> bounds, kk;
  if (cw_ != ow && ch_ != oh) {
    // horizontal into temp (full crop height), then vertical
    std::vector<uint8_t> tmp(static_cast<size_t>(ch_) * ow * c);
    int ks = precompute_coeffs(cw_, ow, filter, bounds, kk);
    resample_horizontal(view, stride, ch_, ow, c, bounds, kk, ks, tmp.data());
    ks = precompute_coeffs(ch_, oh, filter, bounds, kk);
    resample_vertical(tmp.data(), ow, oh, c, bounds, kk, ks, dst);
  } else if (cw_ != ow) {
    int ks = precompute_coeffs(cw_, ow, filter, bounds, kk);
    resample_horizontal(view, stride, ch_, ow, c, bounds, kk, ks, dst);
  } else {
    // vertical only; source view may be strided — copy rows if needed
    if (stride == static_cast<int64_t>(cw_) * c) {
      int ks = precompute_coeffs(ch_, oh, filter, bounds, kk);
      resample_vertical(view, cw_, oh, c, bounds, kk, ks, dst);
    } else {
      std::vector<uint8_t> tmp(static_cast<size_t>(ch_) * cw_ * c);
      for (int yy = 0; yy < ch_; ++yy)
        std::memcpy(tmp.data() + static_cast<int64_t>(yy) * cw_ * c,
                    view + yy * stride, static_cast<size_t>(cw_) * c);
      int ks = precompute_coeffs(ch_, oh, filter, bounds, kk);
      resample_vertical(tmp.data(), cw_, oh, c, bounds, kk, ks, dst);
    }
  }
  return 0;
}

const Filter& filter_by_id(int id) { return id == 1 ? kBicubic : kBilinear; }

// ---------------------------------------------------------------------------
// Worker pool
// ---------------------------------------------------------------------------

class Pool {
 public:
  explicit Pool(int n) : stop_(false) {
    if (n < 1) n = 1;
    for (int i = 0; i < n; ++i)
      threads_.emplace_back([this] { worker(); });
  }
  ~Pool() {
    {
      std::unique_lock<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }
  // Run fn(i) for i in [0, n) across the pool; blocks until all done.
  void parallel_for(int n, const std::function<void(int)>& fn) {
    if (n <= 0) return;
    std::atomic<int> next(0), done(0);
    std::mutex done_mu;
    std::condition_variable done_cv;
    auto task = [&] {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
      {
        // notify while holding the lock: the waiting caller cannot pass the
        // predicate and destroy done_cv/done_mu between our unlock and notify
        std::lock_guard<std::mutex> lk(done_mu);
        ++done;
        done_cv.notify_one();
      }
    };
    int workers = static_cast<int>(threads_.size());
    int launched = workers < n ? workers : n;
    {
      std::unique_lock<std::mutex> lk(mu_);
      for (int i = 0; i < launched - 1; ++i) queue_.push(task);
    }
    cv_.notify_all();
    task();  // caller participates
    std::unique_lock<std::mutex> lk(done_mu);
    done_cv.wait(lk, [&] { return done.load() >= launched; });
  }

 private:
  void worker() {
    for (;;) {
      std::function<void()> job;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        job = std::move(queue_.front());
        queue_.pop();
      }
      job();
    }
  }
  std::vector<std::thread> threads_;
  std::queue<std::function<void()>> queue_;
  std::mutex mu_;
  std::condition_variable cv_;
  bool stop_;
};

void normalize_into(const uint8_t* src, int64_t n_px, int c, const float* mean,
                    const float* std_, float* out) {
  // exact op order of transforms.to_tensor + transforms.normalize:
  // f32(x) / 255.0f, - mean, / std  (single memory pass)
  for (int64_t i = 0; i < n_px; ++i) {
    const uint8_t* p = src + i * c;
    float* o = out + i * c;
    for (int ch = 0; ch < c; ++ch) {
      float t = static_cast<float>(p[ch]) / 255.0f;
      o[ch] = (t - mean[ch]) / std_[ch];
    }
  }
}

int prep_one(const uint8_t* src, int h, int w, int c, int y0, int x0, int ch_,
             int cw_, int oh, int ow, int filter_id, const float* mean,
             const float* std_, float* out, uint8_t* scratch) {
  // scratch must hold oh*ow*c bytes (resized u8 before normalize)
  int rc = resample(src, h, w, c, y0, x0, ch_, cw_, scratch, oh, ow,
                    filter_by_id(filter_id));
  if (rc != 0) return rc;
  normalize_into(scratch, static_cast<int64_t>(oh) * ow, c, mean, std_, out);
  return 0;
}

}  // namespace

extern "C" {

// u8 HWC crop+resize: dst [oh, ow, c]. filter: 0 = bilinear, 1 = bicubic.
int vt_resize_u8(const uint8_t* src, int h, int w, int c, int y0, int x0,
                 int ch_, int cw_, uint8_t* dst, int oh, int ow, int filter) {
  return resample(src, h, w, c, y0, x0, ch_, cw_, dst, oh, ow,
                  filter_by_id(filter));
}

// Fused (x/255 - mean)/std, u8 HWC -> f32 HWC.
void vt_normalize_u8(const uint8_t* src, int64_t n_px, int c, const float* mean,
                     const float* std_, float* out) {
  normalize_into(src, n_px, c, mean, std_, out);
}

// PIL "L" conversion: (R*19595 + G*38470 + B*7471 + 0x8000) >> 16.
// stride = channel count of the source (>= 3; extra channels ignored,
// matching PIL convert("L") on RGBA).
void vt_rgb_to_gray(const uint8_t* src, int64_t n_px, int stride,
                    uint8_t* out) {
  for (int64_t i = 0; i < n_px; ++i) {
    const uint8_t* p = src + i * stride;
    out[i] = static_cast<uint8_t>(
        (p[0] * 19595 + p[1] * 38470 + p[2] * 7471 + 0x8000) >> 16);
  }
}

// compute_white_percentage (data/transforms.py): gray-convert, resize to
// (ref, ref) with BICUBIC when width > ref, fraction of pixels > 250.
float vt_white_percentage(const uint8_t* src, int h, int w, int c,
                          int ref_size) {
  std::vector<uint8_t> gray(static_cast<size_t>(h) * w);
  if (c >= 3) {
    vt_rgb_to_gray(src, static_cast<int64_t>(h) * w, c, gray.data());
  } else {
    for (int64_t i = 0; i < static_cast<int64_t>(h) * w; ++i)
      gray[i] = src[i * c];
  }
  const uint8_t* g = gray.data();
  int gh = h, gw = w;
  std::vector<uint8_t> small;
  if (w > ref_size) {
    small.resize(static_cast<size_t>(ref_size) * ref_size);
    resample(gray.data(), h, w, 1, 0, 0, h, w, small.data(), ref_size,
             ref_size, kBicubic);
    g = small.data();
    gh = gw = ref_size;
  }
  int64_t count = 0;
  for (int64_t i = 0; i < static_cast<int64_t>(gh) * gw; ++i)
    if (g[i] > 250) ++count;
  return static_cast<float>(count) / (static_cast<float>(gh) * gw);
}

// Crop -> resize -> normalize for one image, u8 HWC in, f32 HWC out.
int vt_prep_one(const uint8_t* src, int h, int w, int c, int y0, int x0,
                int ch_, int cw_, int oh, int ow, int filter, const float* mean,
                const float* std_, float* out) {
  std::vector<uint8_t> scratch(static_cast<size_t>(oh) * ow * c);
  return prep_one(src, h, w, c, y0, x0, ch_, cw_, oh, ow, filter, mean, std_,
                  out, scratch.data());
}

void* vt_pool_create(int n_threads) { return new Pool(n_threads); }

void vt_pool_destroy(void* pool) { delete static_cast<Pool*>(pool); }

// Prepare a batch: n images, each with its own dims [h, w] (shared channel
// count), crop rect [y0, x0, ch, cw], into out[n, oh, ow, c] f32.
// Returns 0 iff every image succeeded.
int vt_pool_prep_batch(void* pool, const uint8_t** srcs, const int32_t* dims,
                       const int32_t* crops, int n, int c, int oh, int ow,
                       int filter, const float* mean, const float* std_,
                       float* out) {
  std::atomic<int> rc(0);
  int64_t px = static_cast<int64_t>(oh) * ow;
  auto work = [&](int i) {
    std::vector<uint8_t> scratch(static_cast<size_t>(px) * c);
    int r = prep_one(srcs[i], dims[i * 2], dims[i * 2 + 1], c, crops[i * 4],
                     crops[i * 4 + 1], crops[i * 4 + 2], crops[i * 4 + 3], oh,
                     ow, filter, mean, std_, out + i * px * c, scratch.data());
    if (r != 0) rc.store(r);
  };
  if (pool != nullptr) {
    static_cast<Pool*>(pool)->parallel_for(n, work);
  } else {
    for (int i = 0; i < n; ++i) work(i);
  }
  return rc.load();
}

}  // extern "C"
