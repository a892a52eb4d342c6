// stmask-tpu native host runtime: COCO RLE codec.
//
// The reference leans on pycocotools' C extension for RLE encoding of
// output masks (layers/output_utils.py:100-106); at 100+ FPS/chip the
// Python fallback codec becomes a measurable host cost, so the hot
// entry points live here.  Exposed via a plain C ABI consumed through
// ctypes (no pybind11 in the image).
//
// Format notes: counts are Fortran-order runs starting with the zero run;
// the string form is pycocotools' 5-bit varint with difference coding.

#include <cstdint>
#include <cstring>

extern "C" {

// Encode a row-major [h, w] binary mask into Fortran-order RLE counts.
// Returns the number of counts written, or -1 if max_counts is too small.
int rle_encode(const uint8_t* mask, int h, int w, int64_t* counts,
               int max_counts) {
  int m = 0;
  int64_t run = 0;
  uint8_t cur = 0;  // counts start with the zero run
  for (int x = 0; x < w; ++x) {
    const uint8_t* col = mask + x;
    for (int y = 0; y < h; ++y) {
      uint8_t v = col[(int64_t)y * w] ? 1 : 0;
      if (v == cur) {
        ++run;
      } else {
        if (m >= max_counts) return -1;
        counts[m++] = run;
        run = 1;
        cur = v;
      }
    }
  }
  if (m >= max_counts) return -1;
  counts[m++] = run;
  return m;
}

// Decode Fortran-order RLE counts into a row-major [h, w] binary mask.
int rle_decode(const int64_t* counts, int m, uint8_t* mask, int h, int w) {
  int64_t total = (int64_t)h * w;
  int64_t pos = 0;
  uint8_t val = 0;
  for (int i = 0; i < m; ++i) {
    int64_t c = counts[i];
    if (pos + c > total) return -1;
    if (val) {
      for (int64_t k = pos; k < pos + c; ++k) {
        int64_t y = k % h;
        int64_t x = k / h;
        mask[y * w + x] = 1;
      }
    }
    pos += c;
    val ^= 1;
  }
  return pos == total ? 0 : -1;
}

// pycocotools rleToString. Returns string length or -1 on overflow.
int rle_counts_to_string(const int64_t* cnts, int m, char* out,
                         int max_out) {
  int p = 0;
  for (int i = 0; i < m; ++i) {
    int64_t x = cnts[i];
    if (i > 2) x -= cnts[i - 2];
    bool more = true;
    while (more) {
      int c = (int)(x & 0x1f);
      x >>= 5;
      more = (c & 0x10) ? (x != -1) : (x != 0);
      if (more) c |= 0x20;
      if (p >= max_out) return -1;
      out[p++] = (char)(c + 48);
    }
  }
  return p;
}

// pycocotools rleFrString. Returns number of counts or -1 on overflow.
int rle_string_to_counts(const char* s, int n, int64_t* cnts,
                         int max_counts) {
  int m = 0;
  int i = 0;
  while (i < n) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    int c = 0;
    while (more) {
      if (i >= n) return -1;
      c = s[i] - 48;
      x |= (int64_t)(c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++i;
      ++k;
      if (!more && (c & 0x10)) x |= (int64_t)(-1) << (5 * k);
    }
    if (m > 2) x += cnts[m - 2];
    if (m >= max_counts) return -1;
    cnts[m++] = x;
  }
  return m;
}

// Fused convenience: encode mask straight to the varint string.
// Returns string length, or -1 on overflow.
int rle_encode_to_string(const uint8_t* mask, int h, int w, char* out,
                         int max_out, int64_t* scratch, int max_counts) {
  int m = rle_encode(mask, h, w, scratch, max_counts);
  if (m < 0) return -1;
  return rle_counts_to_string(scratch, m, out, max_out);
}

}  // extern "C"
