// fastload — native host-side sample decode for the input pipeline.
//
// The reference's data path is torch DataLoader worker processes doing
// numpy/PIL decode in Python (reference lit_datamodule.py:97-127). TPU
// training needs the host to keep up with ~10^3 images/sec/chip, so the hot
// decode path (npy parse -> resize -> normalize -> batch assembly) is
// implemented here in C++ with a std::thread pool, exposed via a C ABI
// consumed through ctypes (vision_mtl_tpu/data/native.py).
//
// Supported: .npy v1/v2 files (float32/float64/int64/int32/uint8/int8,
// C-order), bilinear/nearest resize, mask remap (-1 -> fill), batched
// multi-threaded loading of image/mask/depth triples.
//
// Build: make -C native   (produces libfastload.so)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyInfo {
  std::vector<int64_t> shape;
  char dtype_kind = 'f';  // f,i,u
  int itemsize = 4;
  bool fortran = false;
  size_t data_offset = 0;
};

// Minimal .npy header parser (format spec v1.0/v2.0).
bool parse_npy_header(FILE* f, NpyInfo* info) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return false;
    header_len = b[0] | (b[1] << 8);
    info->data_offset = 10 + header_len;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return false;
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | ((uint32_t)b[3] << 24);
    info->data_offset = 12 + header_len;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return false;

  // descr
  size_t dp = header.find("'descr'");
  if (dp == std::string::npos) return false;
  size_t q1 = header.find('\'', dp + 7);
  size_t q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  // descr like '<f4', '<i8', '|u1'
  if (descr.size() < 3) return false;
  if (descr[0] == '>') return false;  // big-endian unsupported
  info->dtype_kind = descr[1];
  info->itemsize = atoi(descr.c_str() + 2);

  // fortran_order
  size_t fo = header.find("'fortran_order'");
  if (fo != std::string::npos) {
    size_t colon = header.find(':', fo);
    info->fortran = header.find("True", colon) < header.find(',', colon);
  }

  // shape
  size_t sp = header.find("'shape'");
  if (sp == std::string::npos) return false;
  size_t p1 = header.find('(', sp);
  size_t p2 = header.find(')', p1);
  std::string shape_s = header.substr(p1 + 1, p2 - p1 - 1);
  info->shape.clear();
  const char* s = shape_s.c_str();
  while (*s) {
    while (*s == ' ' || *s == ',') s++;
    if (!*s) break;
    info->shape.push_back(strtoll(s, const_cast<char**>(&s), 10));
  }
  return true;
}

// Read a full npy file into float32 (converting from its stored dtype).
bool read_npy_f32(const char* path, std::vector<float>* out,
                  std::vector<int64_t>* shape) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  NpyInfo info;
  if (!parse_npy_header(f, &info) || info.fortran) {
    fclose(f);
    return false;
  }
  // Validate untrusted header values before allocating: every dim positive,
  // and n * itemsize within a sane cap (2 GiB) without overflow.
  int64_t n = 1;
  const int64_t kMaxBytes = int64_t(2) << 30;
  for (int64_t d : info.shape) {
    if (d <= 0 || n > kMaxBytes / d) {
      fclose(f);
      return false;
    }
    n *= d;
  }
  if (info.itemsize <= 0 || n > kMaxBytes / info.itemsize) {
    fclose(f);
    return false;
  }
  std::vector<unsigned char> raw(n * info.itemsize);
  if (fseek(f, (long)info.data_offset, SEEK_SET) != 0 ||
      fread(raw.data(), info.itemsize, n, f) != (size_t)n) {
    fclose(f);
    return false;
  }
  fclose(f);
  out->resize(n);
  float* dst = out->data();
  const unsigned char* src = raw.data();
  if (info.dtype_kind == 'f' && info.itemsize == 4) {
    memcpy(dst, src, n * 4);
  } else if (info.dtype_kind == 'f' && info.itemsize == 8) {
    const double* s = reinterpret_cast<const double*>(src);
    for (int64_t i = 0; i < n; i++) dst[i] = (float)s[i];
  } else if (info.dtype_kind == 'i' && info.itemsize == 8) {
    const int64_t* s = reinterpret_cast<const int64_t*>(src);
    for (int64_t i = 0; i < n; i++) dst[i] = (float)s[i];
  } else if (info.dtype_kind == 'i' && info.itemsize == 4) {
    const int32_t* s = reinterpret_cast<const int32_t*>(src);
    for (int64_t i = 0; i < n; i++) dst[i] = (float)s[i];
  } else if (info.dtype_kind == 'i' && info.itemsize == 1) {
    const int8_t* s = reinterpret_cast<const int8_t*>(src);
    for (int64_t i = 0; i < n; i++) dst[i] = (float)s[i];
  } else if (info.dtype_kind == 'u' && info.itemsize == 1) {
    for (int64_t i = 0; i < n; i++) dst[i] = (float)src[i];
  } else if (info.dtype_kind == 'u' && info.itemsize == 2) {
    const uint16_t* s = reinterpret_cast<const uint16_t*>(src);
    for (int64_t i = 0; i < n; i++) dst[i] = (float)s[i];
  } else {
    return false;
  }
  *shape = info.shape;
  return true;
}

// Bilinear resize one channel plane (half-pixel centers, matches
// PIL/OpenCV linear for upscale; no antialias).
void resize_bilinear(const float* src, int h, int w, float* dst, int oh,
                     int ow) {
  if (h == oh && w == ow) {
    memcpy(dst, src, sizeof(float) * h * w);
    return;
  }
  const float sy = (float)h / oh, sx = (float)w / ow;
  for (int y = 0; y < oh; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = (int)fy;
    if (fy < 0) { fy = 0; y0 = 0; }
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    float wy = fy - y0;
    for (int x = 0; x < ow; x++) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = (int)fx;
      if (fx < 0) { fx = 0; x0 = 0; }
      int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      float wx = fx - x0;
      float v00 = src[y0 * w + x0], v01 = src[y0 * w + x1];
      float v10 = src[y1 * w + x0], v11 = src[y1 * w + x1];
      dst[y * ow + x] = (1 - wy) * ((1 - wx) * v00 + wx * v01) +
                        wy * ((1 - wx) * v10 + wx * v11);
    }
  }
}

void resize_nearest(const float* src, int h, int w, float* dst, int oh,
                    int ow) {
  if (h == oh && w == ow) {
    memcpy(dst, src, sizeof(float) * h * w);
    return;
  }
  const float sy = (float)h / oh, sx = (float)w / ow;
  for (int y = 0; y < oh; y++) {
    int yi = (int)(y * sy);
    if (yi >= h) yi = h - 1;
    for (int x = 0; x < ow; x++) {
      int xi = (int)(x * sx);
      if (xi >= w) xi = w - 1;
      dst[y * ow + x] = src[yi * w + xi];
    }
  }
}

struct SampleSpec {
  const char* img_path;
  const char* mask_path;
  const char* depth_path;
};

}  // namespace

extern "C" {

// Decode one npy into float32; returns ndim or -1. shape_out cap 8.
int fastload_read_npy(const char* path, float* out, int64_t out_cap,
                      int64_t* shape_out) {
  std::vector<float> data;
  std::vector<int64_t> shape;
  if (!read_npy_f32(path, &data, &shape)) return -1;
  if ((int64_t)data.size() > out_cap) return -1;
  memcpy(out, data.data(), data.size() * sizeof(float));
  for (size_t i = 0; i < shape.size() && i < 8; i++) shape_out[i] = shape[i];
  return (int)shape.size();
}

// Load a batch of cityscapes-style triples, resized + normalized:
//   imgs:   (B, OH, OW, 3) float32, bilinear
//   masks:  (B, OH, OW)    int32, nearest, ignore_value remapped to remap_to
//   depths: (B, OH, OW, 1) float32, nearest, divided by inv_depth_div
// Threaded over samples. Returns 0 on success, else index+1 of failed sample.
int fastload_load_batch(const char** img_paths, const char** mask_paths,
                        const char** depth_paths, int batch, int oh, int ow,
                        int ignore_value, int remap_to, float depth_div,
                        float* imgs, int32_t* masks, float* depths,
                        int num_threads) {
  std::atomic<int> failed(0);
  std::atomic<int> next(0);
  if (num_threads < 1) num_threads = 1;

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= batch || failed.load()) return;
      std::vector<float> img, mask, depth;
      std::vector<int64_t> is, ms, ds;
      if (!read_npy_f32(img_paths[i], &img, &is) ||
          !read_npy_f32(mask_paths[i], &mask, &ms) ||
          !read_npy_f32(depth_paths[i], &depth, &ds)) {
        failed.store(i + 1);
        return;
      }
      // image: HWC or CHW? cityscapes kaggle npys are HWC float
      if (is.size() != 3 || is[2] != 3 || ms.size() != 2 || ds.size() < 2) {
        failed.store(i + 1);
        return;
      }
      int h = (int)is[0], w = (int)is[1];
      // deinterleave HWC -> planes, resize, reinterleave
      std::vector<float> plane(h * w), rplane(oh * ow);
      for (int c = 0; c < 3; c++) {
        for (int p = 0; p < h * w; p++) plane[p] = img[p * 3 + c];
        resize_bilinear(plane.data(), h, w, rplane.data(), oh, ow);
        float* out = imgs + (size_t)i * oh * ow * 3;
        for (int p = 0; p < oh * ow; p++) out[p * 3 + c] = rplane[p];
      }
      // mask: nearest + remap
      int mh = (int)ms[0], mw = (int)ms[1];
      std::vector<float> rmask(oh * ow);
      resize_nearest(mask.data(), mh, mw, rmask.data(), oh, ow);
      int32_t* mout = masks + (size_t)i * oh * ow;
      for (int p = 0; p < oh * ow; p++) {
        int v = (int)rmask[p];
        mout[p] = (v == ignore_value) ? remap_to : v;
      }
      // depth: nearest + scale
      int dh = (int)ds[0], dw = (int)ds[1];
      std::vector<float> rdepth(oh * ow);
      resize_nearest(depth.data(), dh, dw, rdepth.data(), oh, ow);
      float* dout = depths + (size_t)i * oh * ow;
      float inv = depth_div != 0.0f ? 1.0f / depth_div : 1.0f;
      for (int p = 0; p < oh * ow; p++) dout[p] = rdepth[p] * inv;
    }
  };

  std::vector<std::thread> threads;
  int nt = num_threads < batch ? num_threads : batch;
  threads.reserve(nt);
  for (int t = 0; t < nt; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failed.load();
}

}  // extern "C"
