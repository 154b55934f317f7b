// Minimal PNG decoder for the NYUv2 host path (native/fastload counterpart).
//
// Supports exactly what the dataset ships: 8-bit RGB / RGBA / grayscale
// (rgb + seg13) and 16-bit grayscale (depth, meters*1e4), non-interlaced,
// via zlib inflate + the 5 standard PNG filters. Exposed through the same
// C ABI library as fastload (built together into libfastload.so).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

struct PngImage {
  int width = 0;
  int height = 0;
  int channels = 0;   // 1, 3 or 4
  int bit_depth = 0;  // 8 or 16
  std::vector<float> pixels;  // HWC float (16-bit values as 0..65535)
};

uint32_t be32(const unsigned char* p) {
  return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
         ((uint32_t)p[2] << 8) | (uint32_t)p[3];
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

bool decode_png(const char* path, PngImage* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size < 0) {  // ftell failure would turn into a huge vector size below
    fclose(f);
    return false;
  }
  std::vector<unsigned char> data(size);
  if (fread(data.data(), 1, size, f) != (size_t)size) {
    fclose(f);
    return false;
  }
  fclose(f);

  static const unsigned char magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n',
                                         0x1a, '\n'};
  if (size < 8 || memcmp(data.data(), magic, 8) != 0) return false;

  int width = 0, height = 0, bit_depth = 0, color_type = -1;
  std::vector<unsigned char> idat;
  size_t pos = 8;
  while (pos + 8 <= (size_t)size) {
    uint32_t len = be32(&data[pos]);
    const char* type = reinterpret_cast<const char*>(&data[pos + 4]);
    const unsigned char* payload = &data[pos + 8];
    if (pos + 12 + len > (size_t)size) return false;
    if (memcmp(type, "IHDR", 4) == 0) {
      if (len < 13) return false;  // truncated IHDR
      width = (int)be32(payload);
      height = (int)be32(payload + 4);
      bit_depth = payload[8];
      color_type = payload[9];
      if (payload[12] != 0) return false;  // interlaced unsupported
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), payload, payload + len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + len;
  }
  int channels;
  switch (color_type) {
    case 0: channels = 1; break;  // gray
    case 2: channels = 3; break;  // rgb
    case 4: channels = 2; break;  // gray+alpha
    case 6: channels = 4; break;  // rgba
    default: return false;        // palette unsupported
  }
  if (width <= 0 || height <= 0 || (bit_depth != 8 && bit_depth != 16))
    return false;
  // cap forged IHDR dimensions BEFORE sizing buffers: with width/height up
  // to 2^31 the products below overflow size_t math into a small allocation
  // and the unfilter loop then writes out of bounds. 2^24 per side and
  // ~1 GiB decoded keeps all products comfortably inside 64 bits (and far
  // beyond any real dataset image).
  const int64_t kMaxSide = int64_t(1) << 24;
  const int64_t kMaxBytes = int64_t(1) << 30;
  const int bpp = channels * (bit_depth / 8);  // bytes per pixel
  if (width > kMaxSide || height > kMaxSide ||
      (int64_t)width * height > kMaxBytes / (bpp > 4 ? bpp : 4))
    return false;
  const size_t stride = (size_t)width * bpp;
  std::vector<unsigned char> raw((size_t)height * (stride + 1));
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK)
    return false;
  if (raw_len != raw.size()) return false;

  // unfilter scanlines into `img` — filter type dispatched per ROW, not per
  // byte, so the simple filters (none/sub/up/avg) run as tight
  // auto-vectorizable loops instead of a per-byte switch
  std::vector<unsigned char> img((size_t)height * stride);
  for (int y = 0; y < height; y++) {
    unsigned char filter = raw[y * (stride + 1)];
    const unsigned char* src = &raw[y * (stride + 1) + 1];
    unsigned char* dst = &img[y * stride];
    const unsigned char* up = y > 0 ? &img[(y - 1) * stride] : nullptr;
    const size_t b0 = (size_t)bpp;
    switch (filter) {
      case 0:
        memcpy(dst, src, stride);
        break;
      case 1:  // sub
        memcpy(dst, src, b0 < stride ? b0 : stride);
        for (size_t x = b0; x < stride; x++)
          dst[x] = (unsigned char)(src[x] + dst[x - b0]);
        break;
      case 2:  // up
        if (up) {
          for (size_t x = 0; x < stride; x++)
            dst[x] = (unsigned char)(src[x] + up[x]);
        } else {
          memcpy(dst, src, stride);
        }
        break;
      case 3:  // average
        if (up) {
          for (size_t x = 0; x < b0 && x < stride; x++)
            dst[x] = (unsigned char)(src[x] + up[x] / 2);
          for (size_t x = b0; x < stride; x++)
            dst[x] = (unsigned char)(src[x] + (dst[x - b0] + up[x]) / 2);
        } else {
          for (size_t x = 0; x < b0 && x < stride; x++) dst[x] = src[x];
          for (size_t x = b0; x < stride; x++)
            dst[x] = (unsigned char)(src[x] + dst[x - b0] / 2);
        }
        break;
      case 4:  // paeth
        if (up) {
          for (size_t x = 0; x < b0 && x < stride; x++)
            dst[x] = (unsigned char)(src[x] + up[x]);  // paeth(0,b,0)=b
          for (size_t x = b0; x < stride; x++)
            dst[x] = (unsigned char)(
                src[x] + paeth(dst[x - b0], up[x], up[x - b0]));
        } else {
          memcpy(dst, src, b0 < stride ? b0 : stride);
          for (size_t x = b0; x < stride; x++)
            dst[x] = (unsigned char)(src[x] + dst[x - b0]);  // paeth(a,0,0)=a
        }
        break;
      default:
        return false;
    }
  }

  out->width = width;
  out->height = height;
  out->channels = channels;
  out->bit_depth = bit_depth;
  out->pixels.resize((size_t)width * height * channels);
  if (bit_depth == 8) {
    for (size_t i = 0; i < out->pixels.size(); i++)
      out->pixels[i] = (float)img[i];
  } else {
    for (size_t i = 0; i < out->pixels.size(); i++)
      out->pixels[i] = (float)((img[2 * i] << 8) | img[2 * i + 1]);  // big-endian
  }
  return true;
}

}  // namespace

extern "C" {

// Decode a PNG to float32 HWC; returns channels (>0) on success, -1 on
// failure. shape_out: [height, width, channels, bit_depth].
int fastload_read_png(const char* path, float* out, int64_t out_cap,
                      int64_t* shape_out) try {
  PngImage img;
  if (!decode_png(path, &img)) return -1;
  if ((int64_t)img.pixels.size() > out_cap) return -1;
  memcpy(out, img.pixels.data(), img.pixels.size() * sizeof(float));
  shape_out[0] = img.height;
  shape_out[1] = img.width;
  shape_out[2] = img.channels;
  shape_out[3] = img.bit_depth;
  return img.channels;
} catch (...) {
  // never let an exception (e.g. bad_alloc) cross the C ABI into ctypes
  return -1;
}

}  // extern "C"
