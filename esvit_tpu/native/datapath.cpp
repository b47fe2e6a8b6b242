// Native host data-path kernels: JPEG decode, fused crop+bicubic resize,
// multi-crop batch fan-out, lineidx parsing.
//
// Why native: the TPU chip consumes ~2.6k img/s/chip (BENCH r4) while the
// Python/PIL host path costs ~7.8 ms/sample/core for decode + 10-crop RRC
// (PERF.md round-2 host-datapath table). This library removes the PIL
// object layer, fuses crop+resize into a single pass that writes straight
// into the assembled view-major batch buffer, and fans decode out across
// std::thread workers with the GIL released (ctypes releases the GIL for
// the duration of the call). It plays the role the reference fills with
// torch DataLoader worker *processes* + accimage/cv2
// (/root/reference/datasets/build.py:72-79) — but in-process, so the
// decoded crops land in the exact numpy buffers the jitted train step
// consumes, with no IPC or pickling.
//
// Resampling matches PIL's convolution resampler (bicubic a=-0.5,
// support 2, antialias widening on downscale — the algorithm behind
// Image.resize(..., BICUBIC, box=...)) with float32 accumulation instead
// of PIL's fixed-point uint8 intermediate; parity is within +/-3 LSB
// (tests/test_native_datapath.py pins it).
//
// C ABI only — consumed via ctypes (esvit_tpu/native/__init__.py); no
// Python.h dependency so the .so builds with a bare `g++ -shared`.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>

extern "C" {

// ---------------------------------------------------------------------------
// version / error codes
// ---------------------------------------------------------------------------

#define DP_OK 0
#define DP_ERR_JPEG 1         // libjpeg raised (corrupt stream, ...)
#define DP_ERR_COLORSPACE 2   // source colorspace we don't convert (CMYK/YCCK)
#define DP_ERR_BOUNDS 3       // output buffer too small / bad box
#define DP_ERR_ARG 4          // bad argument

int dp_version(void) { return 10500; }  // round 5, v1

// ---------------------------------------------------------------------------
// lineidx: parse newline-separated decimal byte offsets (TSV sidecar).
// A 1.28M-line .lineidx takes ~1.5 s through Python int(); this does it in
// one pass. Returns the number of offsets written, or -1 on overflow of
// `cap`. Tolerates \r\n and blank lines (same as the Python reader).
// ---------------------------------------------------------------------------

int64_t dp_lineidx_parse(const char* buf, int64_t len, int64_t* out,
                         int64_t cap) {
  int64_t n = 0;
  int64_t i = 0;
  while (i < len) {
    // skip whitespace/newlines between numbers
    while (i < len && (buf[i] == '\n' || buf[i] == '\r' || buf[i] == ' ' ||
                       buf[i] == '\t'))
      i++;
    if (i >= len) break;
    int64_t v = 0;
    bool any = false;
    while (i < len && buf[i] >= '0' && buf[i] <= '9') {
      v = v * 10 + (buf[i] - '0');
      i++;
      any = true;
    }
    if (!any) return -2;  // non-numeric garbage
    if (n >= cap) return -1;
    out[n++] = v;
  }
  return n;
}

// ---------------------------------------------------------------------------
// base64 decode (standard alphabet, '=' padding, whitespace tolerated) —
// the TSV image column. Returns decoded length or -1 on bad input.
// ---------------------------------------------------------------------------

static int8_t* b64_lut() {
  static int8_t lut[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; i++) lut[i] = -1;
    const char* al =
        "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/";
    for (int i = 0; i < 64; i++) lut[(unsigned char)al[i]] = (int8_t)i;
    init = true;
  }
  return lut;
}

int64_t dp_b64_decode(const uint8_t* in, int64_t n, uint8_t* out) {
  const int8_t* lut = b64_lut();
  int64_t o = 0;
  uint32_t acc = 0;
  int bits = 0;
  for (int64_t i = 0; i < n; i++) {
    uint8_t c = in[i];
    if (c == '=' || c == '\n' || c == '\r' || c == ' ' || c == '\t') continue;
    int8_t v = lut[c];
    if (v < 0) return -1;
    acc = (acc << 6) | (uint32_t)v;
    bits += 6;
    if (bits >= 8) {
      bits -= 8;
      out[o++] = (uint8_t)((acc >> bits) & 0xFF);
    }
  }
  return o;
}

// ---------------------------------------------------------------------------
// JPEG decode via libjpeg(-turbo). Always emits RGB8 (grayscale sources are
// expanded by libjpeg; CMYK/YCCK are refused -> caller falls back to PIL).
// ---------------------------------------------------------------------------

struct DpErrMgr {
  struct jpeg_error_mgr pub;
  jmp_buf jb;
};

static void dp_error_exit(j_common_ptr cinfo) {
  DpErrMgr* e = (DpErrMgr*)cinfo->err;
  longjmp(e->jb, 1);
}

static void dp_emit_nothing(j_common_ptr, int) {}

// Header-only probe: full-resolution dimensions without decoding.
int dp_jpeg_dims(const uint8_t* buf, int64_t len, int32_t* w, int32_t* h) {
  struct jpeg_decompress_struct cinfo;
  DpErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = dp_error_exit;
  jerr.pub.emit_message = dp_emit_nothing;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return DP_ERR_JPEG;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf), (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  *w = (int32_t)cinfo.image_width;
  *h = (int32_t)cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return DP_OK;
}

// Decode into caller-provided buffer (cap bytes). scale_denom in {1,2,4,8}
// uses libjpeg's DCT-domain downscale: output dims = ceil(dim/denom).
static int decode_rgb(const uint8_t* buf, int64_t len, int denom,
                      std::vector<uint8_t>& out, int32_t* w, int32_t* h) {
  struct jpeg_decompress_struct cinfo;
  DpErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = dp_error_exit;
  jerr.pub.emit_message = dp_emit_nothing;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return DP_ERR_JPEG;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf), (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  if (cinfo.jpeg_color_space == JCS_CMYK ||
      cinfo.jpeg_color_space == JCS_YCCK) {
    jpeg_destroy_decompress(&cinfo);
    return DP_ERR_COLORSPACE;
  }
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  jpeg_start_decompress(&cinfo);
  if (cinfo.output_components != 3) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    return DP_ERR_COLORSPACE;
  }
  const int W = (int)cinfo.output_width, H = (int)cinfo.output_height;
  const size_t stride = (size_t)W * 3;
  out.resize((size_t)H * stride);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out.data() + (size_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *w = W;
  *h = H;
  return DP_OK;
}

int dp_jpeg_decode(const uint8_t* buf, int64_t len, int32_t scale_denom,
                   uint8_t* out, int64_t cap, int32_t* w, int32_t* h) {
  if (scale_denom != 1 && scale_denom != 2 && scale_denom != 4 &&
      scale_denom != 8)
    return DP_ERR_ARG;
  std::vector<uint8_t> tmp;
  int rc = decode_rgb(buf, len, scale_denom, tmp, w, h);
  if (rc != DP_OK) return rc;
  if ((int64_t)tmp.size() > cap) return DP_ERR_BOUNDS;
  std::memcpy(out, tmp.data(), tmp.size());
  return DP_OK;
}

// ---------------------------------------------------------------------------
// PIL-style convolution resampling (bicubic a=-0.5, support 2, antialias on
// downscale), fused with a fractional crop box: exactly the work of
// Image.resize((ow, oh), BICUBIC, box=(x0, y0, x1, y1)) but accumulating in
// float32 and writing RGB8 straight into a strided output row.
// ---------------------------------------------------------------------------

static inline double bicubic_filter(double x) {
  const double a = -0.5;
  x = std::fabs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// PIL precompute_coeffs (libImaging/Resample.c) for one axis.
static void precompute_coeffs(int in_size, double in0, double in1,
                              int out_size, std::vector<double>& kk,
                              std::vector<int>& bounds, int* ksize_out) {
  const double support0 = 2.0;  // bicubic
  double scale = (in1 - in0) / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = support0 * filterscale;
  int ksize = (int)std::ceil(support) * 2 + 1;
  kk.assign((size_t)out_size * ksize, 0.0);
  bounds.assign((size_t)out_size * 2, 0);
  for (int xx = 0; xx < out_size; xx++) {
    double center = in0 + (xx + 0.5) * scale;
    double ww = 0.0;
    double ss = 1.0 / filterscale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    double* k = &kk[(size_t)xx * ksize];
    int x = 0;
    for (; x < xmax; x++) {
      double w = bicubic_filter((x + xmin - center + 0.5) * ss);
      k[x] = w;
      ww += w;
    }
    if (ww != 0.0)
      for (int j = 0; j < xmax; j++) k[j] /= ww;
    bounds[(size_t)xx * 2] = xmin;
    bounds[(size_t)xx * 2 + 1] = xmax;
  }
  *ksize_out = ksize;
}

static inline uint8_t clip8(double v) {
  // PIL's fixed-point pipeline rounds half away from zero and clamps.
  int iv = (int)std::floor(v + 0.5);
  return (uint8_t)(iv < 0 ? 0 : (iv > 255 ? 255 : iv));
}

// Crop+resize src (ih, iw, 3) RGB8 with float box [y0,y1)x[x0,x1) to
// (oh, ow, 3) written at `out` with row stride `out_stride` bytes.
static int crop_resize_bicubic(const uint8_t* src, int ih, int iw, double y0,
                               double x0, double y1, double x1, uint8_t* out,
                               int oh, int ow, int64_t out_stride) {
  if (!(x1 > x0) || !(y1 > y0) || ow <= 0 || oh <= 0) return DP_ERR_BOUNDS;
  if (x0 < 0 || y0 < 0 || x1 > iw || y1 > ih) return DP_ERR_BOUNDS;

  std::vector<double> kx, ky;
  std::vector<int> bx, by;
  int ksx, ksy;
  precompute_coeffs(iw, x0, x1, ow, kx, bx, &ksx);
  precompute_coeffs(ih, y0, y1, oh, ky, by, &ksy);

  // Row window actually needed by the vertical pass.
  int ymin_all = by[0];
  int ymax_all = 0;
  for (int yy = 0; yy < oh; yy++) {
    ymin_all = std::min(ymin_all, by[(size_t)yy * 2]);
    ymax_all = std::max(ymax_all, by[(size_t)yy * 2] + by[(size_t)yy * 2 + 1]);
  }
  const int nrows = ymax_all - ymin_all;

  // Horizontal pass into a uint8 intermediate — same clip+round PIL's
  // 8bpc pipeline applies between passes (parity: bicubic overshoot must
  // clamp here, or outputs drift by up to ~12 LSB on noisy images).
  std::vector<uint8_t> tmp((size_t)nrows * ow * 3);
  for (int y = 0; y < nrows; y++) {
    const uint8_t* srow = src + (size_t)(y + ymin_all) * iw * 3;
    uint8_t* trow = &tmp[(size_t)y * ow * 3];
    for (int xx = 0; xx < ow; xx++) {
      const int xmin = bx[(size_t)xx * 2], xmax = bx[(size_t)xx * 2 + 1];
      const double* k = &kx[(size_t)xx * ksx];
      double s0 = 0, s1 = 0, s2 = 0;
      const uint8_t* p = srow + (size_t)xmin * 3;
      for (int x = 0; x < xmax; x++) {
        const double w = k[x];
        s0 += w * p[0];
        s1 += w * p[1];
        s2 += w * p[2];
        p += 3;
      }
      trow[xx * 3 + 0] = clip8(s0);
      trow[xx * 3 + 1] = clip8(s1);
      trow[xx * 3 + 2] = clip8(s2);
    }
  }

  // Vertical pass straight into the strided uint8 output.
  for (int yy = 0; yy < oh; yy++) {
    const int ymin = by[(size_t)yy * 2] - ymin_all,
              ymax = by[(size_t)yy * 2 + 1];
    const double* k = &ky[(size_t)yy * ksy];
    uint8_t* orow = out + (size_t)yy * out_stride;
    for (int xx = 0; xx < ow * 3; xx += 3) {
      double s0 = 0, s1 = 0, s2 = 0;
      const uint8_t* p = &tmp[(size_t)ymin * ow * 3 + xx];
      for (int y = 0; y < ymax; y++) {
        const double w = k[y];
        s0 += w * p[0];
        s1 += w * p[1];
        s2 += w * p[2];
        p += (size_t)ow * 3;
      }
      orow[xx + 0] = clip8(s0);
      orow[xx + 1] = clip8(s1);
      orow[xx + 2] = clip8(s2);
    }
  }
  return DP_OK;
}

int dp_crop_resize(const uint8_t* src, int32_t ih, int32_t iw, double y0,
                   double x0, double y1, double x1, uint8_t* out, int32_t oh,
                   int32_t ow) {
  return crop_resize_bicubic(src, ih, iw, y0, x0, y1, x1, out, oh, ow,
                             (int64_t)ow * 3);
}

// ---------------------------------------------------------------------------
// Multi-crop batch: decode each JPEG once, then emit every view with a fused
// crop+resize directly into per-view batch tensors (view-major layout that
// MultiCropIterator._assemble produces: view v of image i lands at row
// `img_rows[i]` of view_outs[v], a (n_rows, S_v, S_v, 3) C-contiguous array).
//
// boxes: (n_imgs, n_views, 4) float64 (top, left, h, w) in FULL-RES pixel
// coordinates (the RRC parameters sampled on the Python side so the RNG
// stream matches the PIL path bit-for-bit).
//
// allow_scaled: when nonzero, images whose every view is downscaled by >=2x
// decode at the largest DCT-domain denom in {2,4,8} that keeps every crop
// at least 2*S_v wide — quality-neutral (the bicubic antialias low-pass
// subsumes the DCT low-pass) and up to ~8x cheaper on large sources.
//
// status[i]: DP_OK or an error code; failed images are left untouched for
// the caller to fill via the PIL fallback.
// ---------------------------------------------------------------------------

struct McJob {
  const uint8_t* const* jpegs;
  const int64_t* jlens;
  int n_imgs;
  const double* boxes;
  const int32_t* view_sizes;
  uint8_t* const* view_outs;
  const int64_t* img_rows;
  int n_views;
  int allow_scaled;
  int32_t* status;
  std::atomic<int>* next;
};

static void mc_worker(McJob* job) {
  for (;;) {
    int i = job->next->fetch_add(1);
    if (i >= job->n_imgs) return;
    const double* ib = job->boxes + (size_t)i * job->n_views * 4;

    int denom = 1;
    if (job->allow_scaled) {
      // Largest denom keeping every view's crop >= 2*S after prescale.
      double max_d = 8.0;
      for (int v = 0; v < job->n_views; v++) {
        const double h = ib[v * 4 + 2], w = ib[v * 4 + 3];
        const double s = (double)job->view_sizes[v];
        max_d = std::min(max_d, std::min(h, w) / (2.0 * s));
      }
      while (denom * 2 <= (int)max_d && denom < 8) denom *= 2;
    }

    std::vector<uint8_t> img;
    int32_t W, H;
    int rc = decode_rgb(job->jpegs[i], job->jlens[i], denom, img, &W, &H);
    if (rc != DP_OK && denom != 1) {  // retry unscaled before giving up
      denom = 1;
      rc = decode_rgb(job->jpegs[i], job->jlens[i], 1, img, &W, &H);
    }
    if (rc != DP_OK) {
      job->status[i] = rc;
      continue;
    }
    const double inv = 1.0 / denom;
    int ok = DP_OK;
    for (int v = 0; v < job->n_views; v++) {
      const double top = ib[v * 4 + 0] * inv, left = ib[v * 4 + 1] * inv;
      const double h = ib[v * 4 + 2] * inv, w = ib[v * 4 + 3] * inv;
      const int S = job->view_sizes[v];
      // Scaled decode rounds dims up (ceil); clamp the box to the actual
      // decoded extent to stay in bounds.
      const double y1 = std::min(top + h, (double)H);
      const double x1 = std::min(left + w, (double)W);
      uint8_t* out = job->view_outs[v] +
                     (size_t)job->img_rows[i] * S * S * 3;
      int rc2 = crop_resize_bicubic(img.data(), H, W, top, left, y1, x1, out,
                                    S, S, (int64_t)S * 3);
      if (rc2 != DP_OK) ok = rc2;
    }
    job->status[i] = ok;
  }
}

int dp_multicrop_batch(const uint8_t* const* jpegs, const int64_t* jlens,
                       int32_t n_imgs, const double* boxes,
                       const int32_t* view_sizes, uint8_t* const* view_outs,
                       const int64_t* img_rows, int32_t n_views,
                       int32_t allow_scaled, int32_t nthreads,
                       int32_t* status) {
  if (n_imgs <= 0 || n_views <= 0) return DP_ERR_ARG;
  std::atomic<int> next(0);
  McJob job{jpegs,    jlens,    n_imgs,  boxes,        view_sizes,
            view_outs, img_rows, n_views, allow_scaled, status,
            &next};
  int T = std::max(1, std::min((int)nthreads, (int)n_imgs));
  if (T == 1) {
    mc_worker(&job);
  } else {
    std::vector<std::thread> ts;
    ts.reserve(T);
    for (int t = 0; t < T; t++) ts.emplace_back(mc_worker, &job);
    for (auto& th : ts) th.join();
  }
  return DP_OK;
}

}  // extern "C"
