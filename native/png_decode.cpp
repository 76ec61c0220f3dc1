// Native PNG -> RGB decoder for the data pipeline.
//
// The reference decodes every training crop through PIL in 16 Python
// worker processes (/root/reference/utils/dataset_utils.py:139-151,
// train.py:336-337). On a TPU VM the host CPU is the scarce resource, so
// the loader's decode stage is native: a single-pass PNG reader (zlib
// inflate + scanline unfilter + RGB expansion) with a C ABI consumed via
// ctypes from promptir_tpu/data/native.py. ctypes releases the GIL for
// the call, so the Python thread-pool loader gets true decode
// parallelism without worker processes.
//
// Scope: 8-bit gray / gray+alpha / palette / RGB / RGBA, non-interlaced
// (the shapes of every dataset the reference trains on: BSD400, WED, RESIDE,
// Rain100L are all plain 8-bit PNGs or JPEGs; JPEG and exotic PNGs fall
// back to PIL in the caller). Alpha is dropped (composited as-is, matching
// PIL .convert("RGB") for fully-opaque images, which these datasets are).

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

uint32_t be32(const uint8_t *p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

struct PngHeader {
  uint32_t width = 0, height = 0;
  uint8_t bit_depth = 0, color_type = 0, interlace = 0;
  int channels = 0;  // source channels per pixel
};

constexpr uint8_t kSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};

// Parses chunks; fills header, concatenates IDAT, captures PLTE. With
// info_only, stops right after IHDR (the dims peek must not pay for
// copying the compressed stream). Returns 0 on success, negative error.
int parse(const uint8_t *buf, int64_t len, PngHeader *hdr,
          std::vector<uint8_t> *idat, std::vector<uint8_t> *plte,
          bool info_only = false) {
  if (len < 8 + 25 || std::memcmp(buf, kSig, 8) != 0) return -1;
  int64_t off = 8;
  bool saw_ihdr = false;
  while (off + 12 <= len) {
    uint32_t clen = be32(buf + off);
    const uint8_t *type = buf + off + 4;
    const uint8_t *data = buf + off + 8;
    if (off + 12 + int64_t(clen) > len) return -2;
    if (!std::memcmp(type, "IHDR", 4)) {
      if (clen != 13) return -3;
      hdr->width = be32(data);
      hdr->height = be32(data + 4);
      hdr->bit_depth = data[8];
      hdr->color_type = data[9];
      hdr->interlace = data[12];
      saw_ihdr = true;
      if (info_only) break;
    } else if (!std::memcmp(type, "PLTE", 4)) {
      plte->assign(data, data + clen);
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat->insert(idat->end(), data, data + clen);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    off += 12 + clen;
  }
  if (!saw_ihdr || (!info_only && idat->empty())) return -4;
  // sanity bounds: reject absurd dimensions (corrupt/hostile headers)
  // before any size arithmetic — callers fall back to PIL on any error
  if (hdr->width == 0 || hdr->height == 0 || hdr->width > (1u << 20) ||
      hdr->height > (1u << 20) ||
      int64_t(hdr->width) * int64_t(hdr->height) > (int64_t(1) << 31)) {
    return -14;
  }
  switch (hdr->color_type) {
    case 0: hdr->channels = 1; break;  // gray
    case 2: hdr->channels = 3; break;  // rgb
    case 3: hdr->channels = 1; break;  // palette index
    case 4: hdr->channels = 2; break;  // gray+alpha
    case 6: hdr->channels = 4; break;  // rgba
    default: return -5;
  }
  return 0;
}

inline int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  return pb <= pc ? b : c;
}

// Undo the per-scanline filters in place over the raw inflated stream.
// raw layout: height rows of [filter_byte | stride bytes].
int unfilter(std::vector<uint8_t> &raw, int64_t h, int64_t stride, int bpp) {
  if (int64_t(raw.size()) < h * (stride + 1)) return -6;
  std::vector<uint8_t> prev(stride, 0);
  for (int64_t y = 0; y < h; ++y) {
    uint8_t *row = raw.data() + y * (stride + 1);
    uint8_t f = row[0];
    uint8_t *cur = row + 1;
    switch (f) {
      case 0:
        break;
      case 1:  // sub
        for (int64_t i = bpp; i < stride; ++i) cur[i] += cur[i - bpp];
        break;
      case 2:  // up
        for (int64_t i = 0; i < stride; ++i) cur[i] += prev[i];
        break;
      case 3:  // average
        for (int64_t i = 0; i < bpp; ++i) cur[i] += prev[i] >> 1;
        for (int64_t i = bpp; i < stride; ++i)
          cur[i] += uint8_t((int(cur[i - bpp]) + int(prev[i])) >> 1);
        break;
      case 4:  // paeth
        for (int64_t i = 0; i < bpp; ++i)
          cur[i] += uint8_t(paeth(0, prev[i], 0));
        for (int64_t i = bpp; i < stride; ++i)
          cur[i] += uint8_t(paeth(cur[i - bpp], prev[i], prev[i - bpp]));
        break;
      default:
        return -7;
    }
    std::memcpy(prev.data(), cur, stride);
  }
  return 0;
}

}  // namespace

extern "C" {

// Peek dimensions. Returns 0 and fills h/w if this decoder can handle the
// file; negative error (caller should fall back to PIL) otherwise.
int promptir_png_info(const uint8_t *buf, int64_t len, int32_t *h,
                      int32_t *w) {
  PngHeader hdr;
  std::vector<uint8_t> idat, plte;
  int rc = parse(buf, len, &hdr, &idat, &plte, /*info_only=*/true);
  if (rc) return rc;
  if (hdr.bit_depth != 8 || hdr.interlace != 0) return -8;
  *h = int32_t(hdr.height);
  *w = int32_t(hdr.width);
  return 0;
}

// Decode into caller-allocated HWC uint8 RGB (h*w*3 bytes). Returns 0 on
// success; negative error otherwise (output buffer then undefined).
int promptir_png_decode_rgb(const uint8_t *buf, int64_t len, uint8_t *out,
                            int64_t out_len) {
  PngHeader hdr;
  std::vector<uint8_t> idat, plte;
  int rc = parse(buf, len, &hdr, &idat, &plte);
  if (rc) return rc;
  if (hdr.bit_depth != 8 || hdr.interlace != 0) return -8;
  if (hdr.color_type == 3 && plte.empty()) return -9;
  const int64_t h = hdr.height, w = hdr.width;
  if (out_len < h * w * 3) return -10;

  const int bpp = hdr.channels;  // bytes per pixel (8-bit depth)
  const int64_t stride = w * bpp;
  std::vector<uint8_t> raw(size_t(h * (stride + 1)));

  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return -11;
  zs.next_in = idat.data();
  zs.avail_in = uInt(idat.size());
  zs.next_out = raw.data();
  zs.avail_out = uInt(raw.size());
  rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  if (rc != Z_STREAM_END && !(rc == Z_OK && zs.avail_out == 0)) return -12;

  rc = unfilter(raw, h, stride, bpp);
  if (rc) return rc;

  // expand to RGB
  for (int64_t y = 0; y < h; ++y) {
    const uint8_t *src = raw.data() + y * (stride + 1) + 1;
    uint8_t *dst = out + y * w * 3;
    switch (hdr.color_type) {
      case 0:  // gray
        for (int64_t x = 0; x < w; ++x) {
          uint8_t g = src[x];
          dst[3 * x] = g;
          dst[3 * x + 1] = g;
          dst[3 * x + 2] = g;
        }
        break;
      case 2:  // rgb
        std::memcpy(dst, src, size_t(w * 3));
        break;
      case 3:  // palette
        for (int64_t x = 0; x < w; ++x) {
          uint32_t idx = uint32_t(src[x]) * 3;
          if (idx + 2 >= plte.size()) return -13;
          dst[3 * x] = plte[idx];
          dst[3 * x + 1] = plte[idx + 1];
          dst[3 * x + 2] = plte[idx + 2];
        }
        break;
      case 4:  // gray+alpha (alpha dropped: datasets are opaque)
        for (int64_t x = 0; x < w; ++x) {
          uint8_t g = src[2 * x];
          dst[3 * x] = g;
          dst[3 * x + 1] = g;
          dst[3 * x + 2] = g;
        }
        break;
      case 6:  // rgba
        for (int64_t x = 0; x < w; ++x) {
          dst[3 * x] = src[4 * x];
          dst[3 * x + 1] = src[4 * x + 1];
          dst[3 * x + 2] = src[4 * x + 2];
        }
        break;
      default:
        return -5;
    }
  }
  return 0;
}

}  // extern "C"
