// bdvs_native: C++ data-pipeline kernels for the host-side hot path.
//
// The reference's loader burns 20 worker processes on cv2.warpPerspective
// part crops and cv2.line stickman rasterization per sample
// (/root/reference/data/base_dataset.py:416-489, lib/utils.py:325-512).
// These kernels replace that per-sample python work with vectorized C++,
// exposed via ctypes (no pybind11 in this image):
//
//   warp_perspective_batch : N x (3x3 homography) bilinear warps
//   render_stickman_batch  : N skeletons -> 3-channel stickman rasters
//   assemble_part_stack    : per-sample 10-part warp + channel concat
//   decode_jpeg[_batch]    : libjpeg-turbo RGB decode with DCT-domain
//                            downscaling (scale 1/1..1/8) — the training
//                            loader decodes 1000px camera frames only to
//                            crop+resize them to 256px, so decoding at a
//                            reduced DCT scale skips most of the IDCT
//                            work (the single-thread decode bottleneck
//                            in HOST_PIPELINE.json)
//
// All buffers are caller-allocated numpy arrays (uint8 HWC / float32).
// OpenMP-free; parallelism via a simple std::thread pool so the library
// has zero dependencies beyond libstdc++ and the system libjpeg-turbo.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

inline float clampf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// Bilinear sample with border replicate (matches cv2 BORDER_REPLICATE).
inline void sample_bilinear(const uint8_t* src, int h, int w, int c,
                            float x, float y, uint8_t* out) {
  x = clampf(x, 0.f, (float)(w - 1));
  y = clampf(y, 0.f, (float)(h - 1));
  int x0 = (int)x, y0 = (int)y;
  int x1 = std::min(x0 + 1, w - 1), y1 = std::min(y0 + 1, h - 1);
  float fx = x - x0, fy = y - y0;
  for (int ch = 0; ch < c; ++ch) {
    float v00 = src[(y0 * w + x0) * c + ch];
    float v01 = src[(y0 * w + x1) * c + ch];
    float v10 = src[(y1 * w + x0) * c + ch];
    float v11 = src[(y1 * w + x1) * c + ch];
    float v = v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy) +
              v10 * (1 - fx) * fy + v11 * fx * fy;
    out[ch] = (uint8_t)clampf(v + 0.5f, 0.f, 255.f);
  }
}

// Warp one image with homography T mapping SRC->DST (cv2 convention:
// dst(x,y) = src(Tinv * (x,y))); we receive the INVERSE map directly.
// The numerators/denominator are linear in x, so each row is computed
// with incremental adds and an autovectorizable coordinate pass, then a
// gather-style bilinear sampling pass.
void warp_one(const uint8_t* src, int sh, int sw, int c,
              const double* t_inv, uint8_t* dst, int dh, int dw) {
  std::vector<float> sxs(dw), sys(dw);
  for (int y = 0; y < dh; ++y) {
    double nx = t_inv[1] * y + t_inv[2];
    double ny = t_inv[4] * y + t_inv[5];
    double dn = t_inv[7] * y + t_inv[8];
    const double ax = t_inv[0], bx = t_inv[3], gx = t_inv[6];
    // coordinate pass (vectorizes: mul/add + div)
    for (int x = 0; x < dw; ++x) {
      double denom = gx * x + dn;
      double r = 1.0 / (std::abs(denom) < 1e-12 ? 1e-12 : denom);
      sxs[x] = (float)((ax * x + nx) * r);
      sys[x] = (float)((bx * x + ny) * r);
    }
    // sampling pass
    uint8_t* drow = dst + (size_t)y * dw * c;
    for (int x = 0; x < dw; ++x) {
      sample_bilinear(src, sh, sw, c, sxs[x], sys[x], drow + x * c);
    }
  }
}

void invert3x3(const double* m, double* inv) {
  double a = m[0], b = m[1], c = m[2], d = m[3], e = m[4], f = m[5],
         g = m[6], h = m[7], i = m[8];
  double A = e * i - f * h, B = -(d * i - f * g), C = d * h - e * g;
  double det = a * A + b * B + c * C;
  if (std::abs(det) < 1e-12) det = 1e-12;
  double s = 1.0 / det;
  inv[0] = A * s;
  inv[1] = -(b * i - c * h) * s;
  inv[2] = (b * f - c * e) * s;
  inv[3] = B * s;
  inv[4] = (a * i - c * g) * s;
  inv[5] = -(a * f - c * d) * s;
  inv[6] = C * s;
  inv[7] = -(a * h - b * g) * s;
  inv[8] = (a * e - b * d) * s;
}

void parallel_for(int n, int n_threads, const std::function<void(int)>& fn) {
  if (n_threads <= 1 || n <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int> next(0);
  std::vector<std::thread> pool;
  int workers = std::min(n_threads, n);
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    pool.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < n) fn(i);
    });
  }
  for (auto& th : pool) th.join();
}

// Draw a thick line into a single-channel uint8 image.
void draw_line(uint8_t* img, int h, int w, float x0, float y0, float x1,
               float y1, uint8_t color, int thickness) {
  float dx = x1 - x0, dy = y1 - y0;
  float len = std::sqrt(dx * dx + dy * dy);
  int steps = std::max(1, (int)(len * 2));
  float r = thickness * 0.5f;
  int ri = std::max(0, (int)std::ceil(r));
  for (int s = 0; s <= steps; ++s) {
    float t = (float)s / steps;
    int cx = (int)(x0 + t * dx), cy = (int)(y0 + t * dy);
    for (int oy = -ri; oy <= ri; ++oy) {
      for (int ox = -ri; ox <= ri; ++ox) {
        if (ox * ox + oy * oy > r * r + 0.25f && thickness > 1) continue;
        int px = cx + ox, py = cy + oy;
        if (px >= 0 && px < w && py >= 0 && py < h) img[py * w + px] = color;
      }
    }
  }
}

// Scanline polygon fill.
void fill_poly(uint8_t* img, int h, int w, const float* verts, int n,
               uint8_t color) {
  for (int y = 0; y < h; ++y) {
    std::vector<float> xs;
    for (int i = 0; i < n; ++i) {
      int j = (i + n - 1) % n;
      float yi = verts[i * 2 + 1], yj = verts[j * 2 + 1];
      float xi = verts[i * 2], xj = verts[j * 2];
      float yc = y + 0.5f;
      if ((yi <= yc && yj > yc) || (yj <= yc && yi > yc)) {
        xs.push_back(xi + (yc - yi) / (yj - yi) * (xj - xi));
      }
    }
    std::sort(xs.begin(), xs.end());
    for (size_t k = 0; k + 1 < xs.size(); k += 2) {
      int x0 = std::max(0, (int)std::ceil(xs[k] - 0.5f));
      int x1 = std::min(w - 1, (int)std::floor(xs[k + 1] - 0.5f));
      for (int x = x0; x <= x1; ++x) img[y * w + x] = color;
    }
  }
}

// ---- jpeg decode (libjpeg-turbo, mem source, DCT-domain scaling) ----

struct JpegErrCtx {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_error_trap(j_common_ptr cinfo) {
  JpegErrCtx* ctx = reinterpret_cast<JpegErrCtx*>(cinfo->err);
  longjmp(ctx->jb, 1);
}

void jpeg_silence(j_common_ptr, int) {}

// Decode one jpeg into caller memory as tightly-packed RGB (or grayscale
// replicated to 3 channels by libjpeg's color conversion).  scale_denom in
// {1,2,4,8} selects libjpeg's DCT-domain downscale: output dims are
// ceil(dim/scale_denom) and the IDCT does proportionally less work.
// Returns 0 ok, -1 decode error, -2 output capacity too small.
int decode_one_jpeg(const uint8_t* buf, size_t len, int scale_denom,
                    uint8_t* out, size_t cap, int* oh, int* ow) {
  jpeg_decompress_struct cinfo;
  JpegErrCtx jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_trap;
  jerr.mgr.emit_message = jpeg_silence;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, (unsigned long)len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = 1;
  cinfo.scale_denom = scale_denom;
  jpeg_calc_output_dimensions(&cinfo);
  const int h = (int)cinfo.output_height, w = (int)cinfo.output_width;
  if ((size_t)h * w * 3 > cap) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_start_decompress(&cinfo);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out + (size_t)cinfo.output_scanline * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *oh = h;
  *ow = w;
  return 0;
}

}  // namespace

extern "C" {

// Single-image decode; see decode_one_jpeg.  out must hold
// ceil(h/scale)*ceil(w/scale)*3 bytes; dims written to *oh/*ow.
int decode_jpeg(const uint8_t* buf, long long len, int scale_denom,
                uint8_t* out, long long cap, int* oh, int* ow) {
  return decode_one_jpeg(buf, (size_t)len, scale_denom, out, (size_t)cap,
                         oh, ow);
}

// Threaded batch decode.  data: concatenated jpeg streams; offsets: n+1
// byte offsets into data; outs: n contiguous slots of out_stride bytes
// each; dims: (n,2) int32 [h,w] per image; rcs: per-image return code.
void decode_jpeg_batch(const uint8_t* data, const long long* offsets, int n,
                       int scale_denom, uint8_t* outs, long long out_stride,
                       int* dims, int* rcs, int n_threads) {
  parallel_for(n, n_threads, [&](int i) {
    rcs[i] = decode_one_jpeg(
        data + offsets[i], (size_t)(offsets[i + 1] - offsets[i]),
        scale_denom, outs + (size_t)i * out_stride, (size_t)out_stride,
        &dims[i * 2], &dims[i * 2 + 1]);
  });
}

void assemble_part_stack_mt(const uint8_t* img, int sh, int sw,
                            const double* mats, const uint8_t* valid,
                            int n_parts, int part, uint8_t* out,
                            int n_threads);

// imgs:   (N, sh, sw, c) uint8
// mats:   (N, 3, 3) float64 forward homographies (src->dst)
// out:    (N, dh, dw, c) uint8
void warp_perspective_batch(const uint8_t* imgs, const double* mats,
                            uint8_t* out, int n, int sh, int sw, int c,
                            int dh, int dw, int n_threads) {
  parallel_for(n, n_threads, [&](int i) {
    double inv[9];
    invert3x3(mats + i * 9, inv);
    warp_one(imgs + (size_t)i * sh * sw * c, sh, sw, c, inv,
             out + (size_t)i * dh * dw * c, dh, dw);
  });
}

// joints: (N, K, 2) float32 pixel coords (negative = invalid)
// right/left/head: (Lr|Ll|Lh, 2) int32 index pairs; body: (V,) int32
// out: (N, S, S, 3) uint8
void render_stickman_batch(const float* joints, int n, int k,
                           const int* right, int n_right, const int* left,
                           int n_left, const int* head, int n_head,
                           const int* body, int n_body, int rshoulder,
                           int lshoulder, int headup, int size,
                           int thickness, uint8_t* out, int n_threads) {
  size_t plane = (size_t)size * size;
  parallel_for(n, n_threads, [&](int idx) {
    const float* J = joints + (size_t)idx * k * 2;
    std::vector<uint8_t> ch0(plane, 0), ch1(plane, 0), ch2(plane, 0);

    auto valid = [&](int j) { return J[j * 2] >= 0.f && J[j * 2 + 1] >= 0.f; };

    // body polygon first (colors 0,127,255 across channels)
    if (n_body > 2) {
      std::vector<float> verts;
      for (int i = 0; i < n_body; ++i) {
        if (valid(body[i])) {
          verts.push_back(J[body[i] * 2]);
          verts.push_back(J[body[i] * 2 + 1]);
        }
      }
      if ((int)verts.size() / 2 > 2) {
        fill_poly(ch1.data(), size, size, verts.data(),
                  (int)verts.size() / 2, 127);
        fill_poly(ch2.data(), size, size, verts.data(),
                  (int)verts.size() / 2, 255);
      }
    }
    auto line_set = [&](const int* lines, int nl, uint8_t* chan,
                        uint8_t color) {
      for (int l = 0; l < nl; ++l) {
        int a = lines[l * 2], b = lines[l * 2 + 1];
        if (valid(a) && valid(b)) {
          draw_line(chan, size, size, J[a * 2], J[a * 2 + 1], J[b * 2],
                    J[b * 2 + 1], color, thickness);
        }
      }
    };
    line_set(right, n_right, ch1.data(), 255);
    line_set(left, n_left, ch0.data(), 255);
    if (n_head > 0) {
      line_set(head, n_head, ch0.data(), 127);
      line_set(head, n_head, ch1.data(), 127);
    } else if (valid(rshoulder) && valid(lshoulder) && valid(headup)) {
      float nx = 0.5f * (J[rshoulder * 2] + J[lshoulder * 2]);
      float ny = 0.5f * (J[rshoulder * 2 + 1] + J[lshoulder * 2 + 1]);
      draw_line(ch0.data(), size, size, nx, ny, J[headup * 2],
                J[headup * 2 + 1], 127, thickness);
      draw_line(ch1.data(), size, size, nx, ny, J[headup * 2],
                J[headup * 2 + 1], 127, thickness);
    }

    uint8_t* dst = out + (size_t)idx * plane * 3;
    for (size_t p = 0; p < plane; ++p) {
      dst[p * 3 + 0] = ch0[p];
      dst[p * 3 + 1] = ch1[p];
      dst[p * 3 + 2] = ch2[p];
    }
  });
}

// Warp n_parts homographies of ONE image and concat channels:
// img (sh, sw, 3) -> out (part, part, 3*n_parts).  valid[i]==0 -> zeros.
void assemble_part_stack(const uint8_t* img, int sh, int sw,
                         const double* mats, const uint8_t* valid,
                         int n_parts, int part, uint8_t* out) {
  assemble_part_stack_mt(img, sh, sw, mats, valid, n_parts, part, out, 1);
}

void assemble_part_stack_mt(const uint8_t* img, int sh, int sw,
                            const double* mats, const uint8_t* valid,
                            int n_parts, int part, uint8_t* out,
                            int n_threads) {
  parallel_for(n_parts, n_threads, [&](int p) {
    std::vector<uint8_t> tmp((size_t)part * part * 3);
    if (!valid[p]) {
      std::memset(tmp.data(), 0, tmp.size());
    } else {
      double inv[9];
      invert3x3(mats + p * 9, inv);
      warp_one(img, sh, sw, 3, inv, tmp.data(), part, part);
    }
    for (int y = 0; y < part; ++y)
      for (int x = 0; x < part; ++x)
        for (int ch = 0; ch < 3; ++ch)
          out[((size_t)y * part + x) * 3 * n_parts + p * 3 + ch] =
              tmp[((size_t)y * part + x) * 3 + ch];
  });
}

int bdvs_native_version() { return 2; }

}  // extern "C"
