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
  // real npy headers are < 64 KiB (padded dict literal); a forged v2
  // header_len near 4 GiB would otherwise drive a giant allocation below
  if (header_len > (1u << 20)) return false;
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return false;

  // descr
  size_t dp = header.find("'descr'");
  if (dp == std::string::npos) return false;
  size_t q1 = header.find('\'', dp + 7);
  if (q1 == std::string::npos) return false;
  size_t q2 = header.find('\'', q1 + 1);
  if (q2 == std::string::npos) return false;
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
  if (p1 == std::string::npos) return false;
  size_t p2 = header.find(')', p1);
  if (p2 == std::string::npos) return false;
  std::string shape_s = header.substr(p1 + 1, p2 - p1 - 1);
  info->shape.clear();
  const char* s = shape_s.c_str();
  while (*s) {
    while (*s == ' ' || *s == ',') s++;
    if (!*s) break;
    char* end = nullptr;
    int64_t d = strtoll(s, &end, 10);
    // a non-numeric char leaves end==s; without this check the loop never
    // advances and pushes 0 into `shape` forever (found by the header fuzz:
    // tens of GB of vector growth on "'shape': }")
    if (end == s) return false;
    s = end;
    if (info->shape.size() >= 32) return false;  // npy caps ndim at 32
    info->shape.push_back(d);
  }
  return true;
}

// An npy file opened + header-validated, positioned at the data payload.
struct OpenNpy {
  FILE* f = nullptr;
  NpyInfo info;
  int64_t n = 0;  // total element count
  ~OpenNpy() {
    if (f) fclose(f);
  }
};

// Open + parse + validate untrusted header values (every dim positive, total
// bytes within a 2 GiB cap without overflow) and seek to the payload.
bool open_npy(const char* path, OpenNpy* o) {
  o->f = fopen(path, "rb");
  if (!o->f) return false;
  if (!parse_npy_header(o->f, &o->info) || o->info.fortran) return false;
  int64_t n = 1;
  const int64_t kMaxBytes = int64_t(2) << 30;
  for (int64_t d : o->info.shape) {
    if (d <= 0 || n > kMaxBytes / d) return false;
    n *= d;
  }
  if (o->info.itemsize <= 0 || o->info.itemsize > 8) return false;
  // cap the DECODED size, not just the file payload: a 2 GiB int8 file
  // would otherwise expand to an 8 GiB float32 buffer (bad_alloc -> abort).
  // Also keeps n <= 2^29, so every downstream int index fits 32 bits.
  const int64_t worst = o->info.itemsize < 4 ? 4 : o->info.itemsize;
  if (n > kMaxBytes / worst) return false;
  if (fseek(o->f, (long)o->info.data_offset, SEEK_SET) != 0) return false;
  o->n = n;
  return true;
}

// Read the payload of an opened npy into float32 (converting from its
// stored dtype). `raw_scratch` is a caller-provided reusable staging buffer
// (the batch loader calls this per sample per worker; reallocating MBs per
// call costs real page-fault time at loader rates).
bool read_open_npy_f32(OpenNpy& o, std::vector<float>* out,
                       std::vector<int64_t>* shape,
                       std::vector<unsigned char>* raw_scratch) {
  const NpyInfo& info = o.info;
  const int64_t n = o.n;
  std::vector<unsigned char>& raw = *raw_scratch;
  if ((int64_t)raw.size() < n * info.itemsize) raw.resize(n * info.itemsize);
  if (fread(raw.data(), info.itemsize, n, o.f) != (size_t)n) return false;
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

bool read_npy_f32(const char* path, std::vector<float>* out,
                  std::vector<int64_t>* shape) {
  std::vector<unsigned char> raw;
  OpenNpy o;
  if (!open_npy(path, &o)) return false;
  return read_open_npy_f32(o, out, shape, &raw);
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
                      int64_t* shape_out) try {
  std::vector<float> data;
  std::vector<int64_t> shape;
  if (!read_npy_f32(path, &data, &shape)) return -1;
  if ((int64_t)data.size() > out_cap) return -1;
  memcpy(out, data.data(), data.size() * sizeof(float));
  for (size_t i = 0; i < shape.size() && i < 8; i++) shape_out[i] = shape[i];
  return (int)shape.size();
} catch (...) {
  // exceptions (e.g. bad_alloc on a hostile header that slipped the caps)
  // must not cross the C ABI into ctypes — that aborts the training process
  return -1;
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

  const float inv = depth_div != 0.0f ? 1.0f / depth_div : 1.0f;

  auto worker = [&]() {
    // per-worker reusable scratch (reallocating MBs per sample costs real
    // page-fault time at loader rates)
    std::vector<float> img, mask, depth, plane, rplane, rmask, rdepth;
    std::vector<unsigned char> raw;
    std::vector<int64_t> is, ms, ds;
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= batch || failed.load()) return;
      try {
      float* iout = imgs + (size_t)i * oh * ow * 3;
      int32_t* mout = masks + (size_t)i * oh * ow;
      float* dout = depths + (size_t)i * oh * ow;

      // --- image: HWC float (cityscapes kaggle npys). Fast path when the
      // file is already f32 at the output size: fread straight into the
      // batch slot — no staging copy, no plane deinterleave round trip.
      {
        OpenNpy o;
        if (!open_npy(img_paths[i], &o) || o.info.shape.size() != 3 ||
            o.info.shape[2] != 3) {
          failed.store(i + 1);
          return;
        }
        int h = (int)o.info.shape[0], w = (int)o.info.shape[1];
        if (h == oh && w == ow && o.info.dtype_kind == 'f' &&
            o.info.itemsize == 4) {
          if (fread(iout, 4, o.n, o.f) != (size_t)o.n) {
            failed.store(i + 1);
            return;
          }
        } else {
          // generic: decode to f32, deinterleave -> resize -> reinterleave
          if (!read_open_npy_f32(o, &img, &is, &raw)) {
            failed.store(i + 1);
            return;
          }
          plane.resize((size_t)h * w);
          rplane.resize((size_t)oh * ow);
          for (int c = 0; c < 3; c++) {
            for (int p = 0; p < h * w; p++) plane[p] = img[p * 3 + c];
            resize_bilinear(plane.data(), h, w, rplane.data(), oh, ow);
            for (int p = 0; p < oh * ow; p++) iout[p * 3 + c] = rplane[p];
          }
        }
      }

      // --- mask: nearest + ignore remap. Fast path for a size-matched int64
      // file (np.save of a long mask): one fused int64 -> remapped int32
      // pass, skipping the float round trip entirely.
      {
        OpenNpy o;
        if (!open_npy(mask_paths[i], &o) || o.info.shape.size() != 2) {
          failed.store(i + 1);
          return;
        }
        int mh = (int)o.info.shape[0], mw = (int)o.info.shape[1];
        if (mh == oh && mw == ow && o.info.dtype_kind == 'i' &&
            o.info.itemsize == 8) {
          if ((int64_t)raw.size() < o.n * 8) raw.resize(o.n * 8);
          if (fread(raw.data(), 8, o.n, o.f) != (size_t)o.n) {
            failed.store(i + 1);
            return;
          }
          const int64_t* s = reinterpret_cast<const int64_t*>(raw.data());
          for (int64_t p = 0; p < o.n; p++) {
            // range-check BEFORE the narrowing cast: a corrupt label like
            // 2^32-1 would silently wrap to -1 and get remapped as the
            // ignore value; fail the sample instead (same untrusted-input
            // stance as the header validation)
            if (s[p] < INT32_MIN || s[p] > INT32_MAX) {
              failed.store(i + 1);
              return;
            }
            int32_t v = (int32_t)s[p];
            mout[p] = (v == ignore_value) ? remap_to : v;
          }
        } else {
          if (!read_open_npy_f32(o, &mask, &ms, &raw)) {
            failed.store(i + 1);
            return;
          }
          rmask.resize((size_t)oh * ow);
          resize_nearest(mask.data(), mh, mw, rmask.data(), oh, ow);
          for (int p = 0; p < oh * ow; p++) {
            int v = (int)rmask[p];
            mout[p] = (v == ignore_value) ? remap_to : v;
          }
        }
      }

      // --- depth: nearest + scale. Fast path for size-matched f32: fread
      // into the batch slot, scale in place.
      {
        OpenNpy o;
        if (!open_npy(depth_paths[i], &o) || o.info.shape.size() < 2) {
          failed.store(i + 1);
          return;
        }
        int dh = (int)o.info.shape[0], dw = (int)o.info.shape[1];
        if (dh == oh && dw == ow && o.info.shape.size() == 2 &&
            o.info.dtype_kind == 'f' && o.info.itemsize == 4) {
          if (fread(dout, 4, o.n, o.f) != (size_t)o.n) {
            failed.store(i + 1);
            return;
          }
          if (inv != 1.0f)
            for (int64_t p = 0; p < o.n; p++) dout[p] *= inv;
        } else {
          if (!read_open_npy_f32(o, &depth, &ds, &raw)) {
            failed.store(i + 1);
            return;
          }
          rdepth.resize((size_t)oh * ow);
          resize_nearest(depth.data(), dh, dw, rdepth.data(), oh, ow);
          for (int p = 0; p < oh * ow; p++) dout[p] = rdepth[p] * inv;
        }
      }
      } catch (...) {
        // an exception escaping a std::thread calls std::terminate — convert
        // to the per-sample failure contract instead
        failed.store(i + 1);
        return;
      }
    }
  };

  std::vector<std::thread> threads;
  int nt = num_threads < batch ? num_threads : batch;
  bool spawn_failed = false;
  try {
    threads.reserve(nt);
    for (int t = 0; t < nt; t++) threads.emplace_back(worker);
  } catch (...) {
    // bad_alloc/system_error under memory or thread-limit pressure must
    // not cross the C ABI (std::terminate via ctypes) nor destroy a
    // joinable std::thread (also std::terminate). Signal the workers
    // already running to stop via the shared failure flag, join below,
    // and report batch+1 (no sample is at fault — infrastructure failure).
    spawn_failed = true;
    failed.store(batch + 1);
  }
  for (auto& t : threads) t.join();
  return spawn_failed ? batch + 1 : failed.load();
}

}  // extern "C"
