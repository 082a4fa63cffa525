// ganleaks_io — native batched image loader/encoder for the host path.
//
// LOADER: the reference decodes PNGs one-by-one through PIL inside python
// loops (attack_models/fbb.py:134, list comprehension over read_image). This
// library decodes a whole directory batch with libpng on a thread pool and
// fuses the uint8 -> [-1, 1] float conversion (attack_models/utils.py:82)
// and the VAE-GAN center-crop + iterated 2x2 box downsample
// (gan_models/vaegan/utils.py:44-71) into the decode pass, writing straight
// into the caller-provided NHWC float32 buffer that jax.device_put consumes.
//
// ENCODER: the reference dumps the whole synthetic set as per-image PNGs
// through a python loop over torchvision ToPILImage + Image.save
// (gan_models/dcgan/train_torch.py:160-174) — O(N) interpreter round-trips
// for N up to 100k images. gl_save_batch encodes a caller-provided uint8
// NHWC batch with libpng on the same thread-pool pattern. PNG is lossless,
// so artifact parity is at the pixel level (decode-identical), not the byte
// level: libpng's filter/deflate choices differ from PIL's.
//
// Exact-parity contract: outputs are bit-identical to the Python readers for
//   * images already at the target resolution (mode EXACT), and
//   * the center-crop/box-downsample variant (mode CENTER_CROP).
// The PIL-resize variant (bicubic on mismatched sizes) is NOT reimplemented
// — per-image fallback to PIL keeps that path byte-faithful.
//
// Build: make -C native   ->  native/libganleaks_io.so

#include <png.h>

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kOk = 0;
constexpr int kErrOpen = 1;
constexpr int kErrNotPng = 2;
constexpr int kErrDecode = 3;
constexpr int kErrShape = 4;

enum Mode {
  kExact = 0,       // require (res, res, 3); error otherwise
  kCenterCrop = 1,  // crop 128x128 at (cx=89, cy=121), box-downsample to res
};

struct Image {
  std::vector<uint8_t> pixels;  // HWC, 3 channels
  int w = 0, h = 0;
};

int decode_png_rgb(const char* path, Image* out) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return kErrOpen;

  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    return kErrNotPng;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    std::fclose(fp);
    return kErrDecode;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  // normalize every input to 8-bit RGB (transparency is DROPPED, matching
  // PIL.Image.open on RGB-consumed PNGs; tRNS is never expanded to alpha)
  png_byte color = png_get_color_type(png, info);
  png_byte depth = png_get_bit_depth(png, info);
  if (depth == 16) {
    // 16-bit inputs route to the PIL fallback: png_set_strip_16 keeps the
    // high byte, while PIL opens 16-bit grayscale as mode 'I' and its RGB
    // conversion CLIPS at 255 — silently diverging from the bit-parity
    // contract. Let the one authoritative reader decide.
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return kErrDecode;
  }
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  png_read_update_info(png, info);
  // belt-and-suspenders: our row buffers are exactly w*3; any transform
  // combination that doesn't land on 8-bit RGB falls back to the PIL reader
  if (png_get_channels(png, info) != 3 || png_get_bit_depth(png, info) != 8) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return kErrDecode;
  }

  out->w = static_cast<int>(png_get_image_width(png, info));
  out->h = static_cast<int>(png_get_image_height(png, info));
  // cap header-declared dimensions BEFORE allocating: a crafted/corrupt
  // IHDR can declare up to libpng's 1Mx1M default and the resize below
  // would request terabytes (std::bad_alloc escaping the decode worker
  // would std::terminate the whole process). 64M pixels = 192 MB RGB —
  // far above any real dataset image, far below harm.
  if (out->w <= 0 || out->h <= 0 ||
      static_cast<size_t>(out->w) * out->h > (64u << 20)) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return kErrDecode;
  }
  out->pixels.resize(static_cast<size_t>(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->pixels.data() + static_cast<size_t>(y) * out->w * 3;
  // re-arm the jump target now that rows/pixels are fully constructed:
  // a libpng error in png_read_image/_end lands HERE with both alive in
  // scope, so their destructors run on return — the first setjmp would
  // have been longjmp'd over their construction (UB + h*8 bytes leaked
  // per failed decode; encode_png_rgb's comment has the rationale)
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return kErrDecode;
  }
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);
  return kOk;
}

// attack_models/utils.py:82 — 2*(x/255)-1; numpy evaluates in float64 and
// the caller casts to float32: doing the same keeps outputs bit-identical
inline float to_tanh_range(double v) {
  return static_cast<float>(2.0 * (v / 255.0) - 1.0);
}

int postprocess(const Image& img, int resolution, int mode, float* dst) {
  const int res = resolution;
  if (img.w == res && img.h == res) {
    const size_t n = static_cast<size_t>(res) * res * 3;
    if (mode == kCenterCrop) {
      // read_image_center_crop scales in FLOAT32 (io/images.py:72-73)
      for (size_t i = 0; i < n; ++i)
        dst[i] = (static_cast<float>(img.pixels[i]) / 255.0f) * 2.0f - 1.0f;
    } else {
      // read_image scales in float64 then casts (io/images.py:56)
      for (size_t i = 0; i < n; ++i)
        dst[i] = to_tanh_range(static_cast<double>(img.pixels[i]));
    }
    return kOk;
  }
  if (mode == kExact) return kErrShape;

  // vaegan/utils.py:44-71: crop [cy-64:cy+64, cx-64:cx+64] (cx=89, cy=121),
  // then repeated 2x2 box averaging from 128 down to res, rint->clip->uint8
  // round-trip, then the [-1, 1] scaling.
  constexpr int kCx = 89, kCy = 121;
  if (img.h < kCy + 64 || img.w < kCx + 64 || res > 128 || (128 % res) != 0)
    return kErrShape;

  std::vector<float> buf(128 * 128 * 3);
  for (int y = 0; y < 128; ++y)
    for (int x = 0; x < 128; ++x)
      for (int c = 0; c < 3; ++c)
        buf[(static_cast<size_t>(y) * 128 + x) * 3 + c] = static_cast<float>(
            img.pixels[(static_cast<size_t>(y + kCy - 64) * img.w +
                        (x + kCx - 64)) * 3 + c]);

  int cur = 128;
  while (cur > res) {
    const int half = cur / 2;
    for (int y = 0; y < half; ++y)
      for (int x = 0; x < half; ++x)
        for (int c = 0; c < 3; ++c) {
          const size_t r0 = (static_cast<size_t>(2 * y) * cur + 2 * x) * 3 + c;
          const size_t r1 = (static_cast<size_t>(2 * y) * cur + 2 * x + 1) * 3 + c;
          const size_t r2 = (static_cast<size_t>(2 * y + 1) * cur + 2 * x) * 3 + c;
          const size_t r3 = (static_cast<size_t>(2 * y + 1) * cur + 2 * x + 1) * 3 + c;
          buf[(static_cast<size_t>(y) * half + x) * 3 + c] =
              (buf[r0] + buf[r1] + buf[r2] + buf[r3]) * 0.25f;
        }
    cur = half;
  }
  const size_t n = static_cast<size_t>(res) * res * 3;
  for (size_t i = 0; i < n; ++i) {
    float v = std::nearbyint(buf[i]);  // np.rint: banker's rounding
    v = v < 0.0f ? 0.0f : (v > 255.0f ? 255.0f : v);
    dst[i] = (v / 255.0f) * 2.0f - 1.0f;  // vaegan scaling (utils.py:69-71)
  }
  return kOk;
}

int encode_png_rgb(const char* path, const uint8_t* pixels, int h, int w,
                   int compress_level) {
  // rows is constructed AND fully written before the setjmp: a libpng
  // error longjmps back to it, and both skipping a live vector's
  // destructor and reading a local mutated between setjmp and longjmp
  // are undefined behavior (in practice: h*8 bytes leaked per failed
  // encode, e.g. every image once the disk fills mid-dump).
  std::vector<png_bytep> rows(h);
  for (int y = 0; y < h; ++y)
    rows[y] = const_cast<png_bytep>(pixels + static_cast<size_t>(y) * w * 3);
  FILE* fp = std::fopen(path, "wb");
  if (!fp) return kErrOpen;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info || setjmp(png_jmpbuf(png))) {
    if (png) png_destroy_write_struct(&png, info ? &info : nullptr);
    std::fclose(fp);
    return kErrDecode;
  }
  png_init_io(png, fp);
  png_set_compression_level(png, compress_level);
  // small synthetic images compress little either way; NONE filtering trades
  // a few % of file size for skipping the per-row filter heuristic entirely
  if (compress_level <= 1) png_set_filter(png, 0, PNG_FILTER_NONE);
  png_set_IHDR(png, info, w, h, 8, PNG_COLOR_TYPE_RGB, PNG_INTERLACE_NONE,
               PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  png_write_image(png, rows.data());
  png_write_end(png, nullptr);
  png_destroy_write_struct(&png, &info);
  std::fclose(fp);
  return kOk;
}

}  // namespace

extern "C" {

// Decode `n` PNGs into `out` (n, resolution, resolution, 3) float32 NHWC in
// [-1, 1]. `status[i]` receives a per-image code (0 ok; nonzero => caller
// should fall back to the Python reader for that image). Returns the number
// of failures.
int gl_load_batch(const char** paths, int n, int resolution, int mode,
                  float* out, int* status, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t stride = static_cast<size_t>(resolution) * resolution * 3;

  auto worker = [&]() {
    // nearbyint must round-half-even to match np.rint
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      int rc;
      try {
        Image img;
        rc = decode_png_rgb(paths[i], &img);
        if (rc == kOk)
          rc = postprocess(img, resolution, mode, out + stride * i);
      } catch (...) {
        // an exception escaping a std::thread is std::terminate — the
        // per-image contract is "status[i] nonzero => PIL fallback",
        // never process death
        rc = kErrDecode;
      }
      status[i] = rc;
      if (rc != kOk) failures.fetch_add(1);
    }
  };

  std::vector<std::thread> pool;
  const int workers = n_threads > n ? n : n_threads;
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// Encode `n` HWC uint8 RGB images (contiguous (n, h, w, 3) batch) to the
// given PNG paths. `status[i]` receives a per-image code (0 ok; nonzero =>
// caller should fall back to the Python writer). Returns failure count.
int gl_save_batch(const char** paths, int n, int h, int w,
                  const uint8_t* data, int compress_level, int* status,
                  int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t stride = static_cast<size_t>(h) * w * 3;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      int rc;
      try {
        rc = encode_png_rgb(paths[i], data + stride * i, h, w,
                            compress_level);
      } catch (...) {
        rc = kErrDecode;  // same never-terminate contract as the loader
      }
      status[i] = rc;
      if (rc != kOk) failures.fetch_add(1);
    }
  };

  std::vector<std::thread> pool;
  const int workers = n_threads > n ? n : n_threads;
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

int gl_version() { return 3; }

}  // extern "C"
