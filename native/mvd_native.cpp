// mvd_native: native data-path for the Objaverse zip corpus.
//
// The training input pipeline's host-side hot path — zip member lookup,
// DEFLATE, PNG decode, RGBA->white composite, resize, [-1,1] normalize —
// implemented in C++ (zlib + libpng) and exposed through a minimal C ABI
// consumed via ctypes (mvd_tpu/data/native_loader.py). Replaces the
// reference's Python-side PIL/torch transforms (reference
// src/data/objaverse_dataset.py:215-294) so loader threads decode at
// native speed while the TPU step runs.
//
// Zip support: ZIP32, stored (0) and deflate (8) members, EOCD + central
// directory parsing. No encryption/zip64 (the render toolchain never
// produces them).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <png.h>
#include <zlib.h>

namespace {

struct Buffer {
  std::vector<unsigned char> data;
};

bool read_file(const char* path, std::vector<unsigned char>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n < 0) { std::fclose(f); return false; }
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(out.data(), 1, out.size(), f) : 0;
  std::fclose(f);
  return got == out.size();
}

uint16_t rd16(const unsigned char* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const unsigned char* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}

// Locate a member by suffix match (entries may carry directory prefixes)
// and return its decompressed bytes.
bool zip_extract(const std::vector<unsigned char>& zip, const char* name,
                 std::vector<unsigned char>& out) {
  if (zip.size() < 22) return false;
  // find EOCD (scan back over possible comment)
  size_t eocd = std::string::npos;
  size_t start = zip.size() >= 22 + 65535 ? zip.size() - 22 - 65535 : 0;
  for (size_t i = zip.size() - 22 + 1; i-- > start;) {
    if (rd32(&zip[i]) == 0x06054b50) { eocd = i; break; }
  }
  if (eocd == std::string::npos) return false;
  uint16_t n_entries = rd16(&zip[eocd + 10]);
  uint32_t cd_off = rd32(&zip[eocd + 16]);

  size_t name_len_want = std::strlen(name);
  size_t p = cd_off;
  for (uint16_t e = 0; e < n_entries; ++e) {
    if (p + 46 > zip.size() || rd32(&zip[p]) != 0x02014b50) return false;
    uint16_t method = rd16(&zip[p + 10]);
    uint32_t csize = rd32(&zip[p + 20]);
    uint32_t usize = rd32(&zip[p + 24]);
    uint16_t nlen = rd16(&zip[p + 28]);
    uint16_t xlen = rd16(&zip[p + 30]);
    uint16_t clen = rd16(&zip[p + 32]);
    uint32_t lho = rd32(&zip[p + 42]);
    const char* ename = reinterpret_cast<const char*>(&zip[p + 46]);

    bool match = false;
    if (nlen >= name_len_want &&
        std::memcmp(ename + nlen - name_len_want, name, name_len_want) == 0) {
      // suffix match must align to a path boundary
      match = (nlen == name_len_want) || ename[nlen - name_len_want - 1] == '/';
    }
    if (match) {
      if (lho + 30 > zip.size()) return false;
      const unsigned char* lh = &zip[lho];
      if (rd32(lh) != 0x04034b50) return false;
      uint16_t lnlen = rd16(lh + 26);
      uint16_t lxlen = rd16(lh + 28);
      size_t data_off = lho + 30 + lnlen + lxlen;
      if (data_off + csize > zip.size()) return false;
      const unsigned char* src = &zip[data_off];
      out.resize(usize);
      if (method == 0) {
        if (csize != usize) return false;
        std::memcpy(out.data(), src, usize);
        return true;
      }
      if (method == 8) {
        z_stream zs{};
        if (inflateInit2(&zs, -MAX_WBITS) != Z_OK) return false;
        zs.next_in = const_cast<unsigned char*>(src);
        zs.avail_in = csize;
        zs.next_out = out.data();
        zs.avail_out = usize;
        int rc = inflate(&zs, Z_FINISH);
        inflateEnd(&zs);
        return rc == Z_STREAM_END && zs.total_out == usize;
      }
      return false;
    }
    p += 46 + nlen + xlen + clen;
  }
  return false;
}

struct PngReadState {
  const unsigned char* data;
  size_t size;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t count) {
  auto* st = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (st->pos + count > st->size) {
    png_error(png, "read past end");
    return;
  }
  std::memcpy(out, st->data + st->pos, count);
  st->pos += count;
}

// Decode PNG bytes to 8-bit RGBA.
bool png_decode(const std::vector<unsigned char>& bytes, int& w, int& h,
                std::vector<unsigned char>& rgba) {
  if (bytes.size() < 8 || png_sig_cmp(bytes.data(), 0, 8)) return false;
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return false; }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  PngReadState st{bytes.data(), bytes.size(), 0};
  png_set_read_fn(png, &st, png_read_fn);
  png_read_info(png, info);

  w = png_get_image_width(png, info);
  h = png_get_image_height(png, info);
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);

  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_filler(png, 0xFF, PNG_FILLER_AFTER);  // ensure alpha channel
  png_read_update_info(png, info);

  rgba.resize(size_t(w) * h * 4);
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y) rows[y] = rgba.data() + size_t(y) * w * 4;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

// RGBA -> white-composited RGB float in [0,1], bilinear resize to SxS.
void composite_resize_normalize(const std::vector<unsigned char>& rgba, int w,
                                int h, int s, float* out /* s*s*3, [-1,1] */) {
  const float inv255 = 1.0f / 255.0f;
  for (int oy = 0; oy < s; ++oy) {
    // PIL-style center-aligned sampling
    float fy = (oy + 0.5f) * h / s - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int ox = 0; ox < s; ++ox) {
      float fx = (ox + 0.5f) * w / s - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      float* dst = out + (size_t(oy) * s + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        auto px = [&](int x, int y) {
          const unsigned char* p = &rgba[(size_t(y) * w + x) * 4];
          float a = p[3] * inv255;
          // composite channel onto white
          return (p[c] * inv255) * a + (1.0f - a);
        };
        float top = px(x0, y0) * (1 - wx) + px(x1, y0) * wx;
        float bot = px(x0, y1) * (1 - wx) + px(x1, y1) * wx;
        float v = top * (1 - wy) + bot * wy;
        dst[c] = v * 2.0f - 1.0f;
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode one view: zip member `entry` (suffix-matched) -> float32
// [size*size*3] in [-1,1], white-composited, bilinear-resized.
// Returns 0 on success.
int mvd_load_view(const char* zip_path, const char* entry, int size, float* out) {
  std::vector<unsigned char> zip;
  if (!read_file(zip_path, zip)) return 1;
  std::vector<unsigned char> png_bytes;
  if (!zip_extract(zip, entry, png_bytes)) return 2;
  int w = 0, h = 0;
  std::vector<unsigned char> rgba;
  if (!png_decode(png_bytes, w, h, rgba)) return 3;
  composite_resize_normalize(rgba, w, h, size, out);
  return 0;
}

// Extract a raw zip member (e.g. NNN.npy / prompt.txt). Caller provides the
// capacity; *len is set to the true size. Returns 0 on success, -1 if the
// buffer is too small (with *len set to the required size).
int mvd_read_entry(const char* zip_path, const char* entry, unsigned char* out,
                   long* len) {
  std::vector<unsigned char> zip;
  if (!read_file(zip_path, zip)) return 1;
  std::vector<unsigned char> data;
  if (!zip_extract(zip, entry, data)) return 2;
  long cap = *len;
  *len = static_cast<long>(data.size());
  if (static_cast<long>(data.size()) > cap) return -1;
  std::memcpy(out, data.data(), data.size());
  return 0;
}

// Batch view decode into one contiguous NHWC buffer (loader fast path).
// entries: NUL-separated list of n entry names. Returns #failures.
int mvd_load_views_batch(const char* zip_path, const char* entries, int n,
                         int size, float* out) {
  std::vector<unsigned char> zip;
  if (!read_file(zip_path, zip)) return n;
  int failures = 0;
  const char* e = entries;
  for (int i = 0; i < n; ++i) {
    std::vector<unsigned char> png_bytes;
    int w = 0, h = 0;
    std::vector<unsigned char> rgba;
    if (zip_extract(zip, e, png_bytes) && png_decode(png_bytes, w, h, rgba)) {
      composite_resize_normalize(rgba, w, h, size,
                                 out + size_t(i) * size * size * 3);
    } else {
      ++failures;
    }
    e += std::strlen(e) + 1;
  }
  return failures;
}

}  // extern "C"
