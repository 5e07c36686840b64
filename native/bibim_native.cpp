// bibim_native — native data-loading runtime for bibim_tpu.
//
// The reference renderer's asset path is native C++: stb_image decode on
// Win32 worker threads in batches of <=64 (resource.cpp:157-267). This is
// its Linux/TPU-host equivalent: libpng/libjpeg decode to RGBA8 plus a
// std::thread batch decoder, exposed through a plain C ABI consumed from
// Python via ctypes (bibim_tpu/native.py).
//
// Semantics match the reference/stb behavior:
//   - everything decodes to tightly-packed RGBA8 (STBI_rgb_alpha)
//   - 16-bit PNG channels narrow to 8 bits via the high byte (value >> 8)
//   - gray/gray-alpha/palette expand to RGBA
//   - failed decodes return null (tolerated upstream, resource.cpp:161-163)
//
// Build: make -C native   → libbibim_native.so

#include <cstddef>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <atomic>
#include <thread>
#include <vector>

#include <png.h>
#include <jpeglib.h>
#include <csetjmp>

extern "C" {

struct DecodedImage {
  uint8_t* pixels;  // RGBA8, row-major, width*height*4 bytes (malloc'd)
  int32_t width;
  int32_t height;
};

// ---------------------------------------------------------------------------
// PNG
// ---------------------------------------------------------------------------

static bool decode_png(FILE* f, DecodedImage* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  // Normalize to 8-bit RGBA, matching stb_image's conversions.
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_strip_16(png);  // high byte (v >> 8), like stb
  if (color_type == PNG_COLOR_TYPE_GRAY ||
      color_type == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_filler(png, 0xFF, PNG_FILLER_AFTER);  // add alpha if missing
  png_read_update_info(png, info);

  uint8_t* pixels = (uint8_t*)malloc((size_t)w * h * 4);
  if (!pixels) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = pixels + (size_t)y * w * 4;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);

  out->pixels = pixels;
  out->width = (int32_t)w;
  out->height = (int32_t)h;
  return true;
}

// ---------------------------------------------------------------------------
// JPEG
// ---------------------------------------------------------------------------

struct JpegError {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

static void jpeg_error_exit(j_common_ptr cinfo) {
  JpegError* err = (JpegError*)cinfo->err;
  longjmp(err->jump, 1);
}

static bool decode_jpeg(FILE* f, DecodedImage* out) {
  jpeg_decompress_struct cinfo;
  JpegError jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  uint8_t* pixels = nullptr;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    free(pixels);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int w = cinfo.output_width;
  const int h = cinfo.output_height;
  pixels = (uint8_t*)malloc((size_t)w * h * 4);
  if (!pixels) longjmp(jerr.jump, 1);
  std::vector<uint8_t> row((size_t)w * 3);
  while ((int)cinfo.output_scanline < h) {
    int y = cinfo.output_scanline;
    uint8_t* rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    uint8_t* dst = pixels + (size_t)y * w * 4;
    for (int x = 0; x < w; ++x) {
      dst[x * 4 + 0] = row[x * 3 + 0];
      dst[x * 4 + 1] = row[x * 3 + 1];
      dst[x * 4 + 2] = row[x * 3 + 2];
      dst[x * 4 + 3] = 0xFF;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  out->pixels = pixels;
  out->width = w;
  out->height = h;
  return true;
}

// ---------------------------------------------------------------------------
// Public API
// ---------------------------------------------------------------------------

// Decode one image file to RGBA8. Returns 1 on success.
int bibim_decode_image(const char* path, DecodedImage* out) {
  out->pixels = nullptr;
  out->width = out->height = 0;
  FILE* f = fopen(path, "rb");
  if (!f) return 0;
  uint8_t magic[4] = {0};
  if (fread(magic, 1, 4, f) != 4) {
    fclose(f);
    return 0;
  }
  rewind(f);
  bool ok = false;
  if (magic[0] == 0x89 && magic[1] == 'P') {
    ok = decode_png(f, out);
  } else if (magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  }
  fclose(f);
  return ok ? 1 : 0;
}

// Decode `n` files concurrently on up to `max_threads` workers (batch width
// 64 in the reference, resource.cpp:241-267). Results land in outs[i];
// failed entries have pixels == nullptr. Returns the success count.
int bibim_decode_batch(const char** paths, int n, DecodedImage* outs,
                       int max_threads) {
  if (max_threads <= 0) max_threads = 64;
  int workers = std::min(n, max_threads);
  std::atomic<int> next(0), ok_count(0);
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) {
    pool.emplace_back([&]() {
      for (;;) {
        int i = next.fetch_add(1);
        if (i >= n) break;
        if (bibim_decode_image(paths[i], &outs[i])) ok_count.fetch_add(1);
      }
    });
  }
  for (auto& th : pool) th.join();
  return ok_count.load();
}

void bibim_free_image(DecodedImage* img) {
  free(img->pixels);
  img->pixels = nullptr;
}

// Encode a tightly-packed RGB8/RGBA8 buffer as a PNG file. The frame-output
// path of the interactive loop (the swapchain-present analog): libpng at a
// low compression level is several times faster than the Python encoder on
// 1080p frames. Returns 1 on success.
int bibim_write_png(const char* path, const uint8_t* pixels, int width,
                    int height, int channels, int compress_level) {
  if (channels != 3 && channels != 4) return 0;
  FILE* f = fopen(path, "wb");
  if (!f) return 0;
  png_structp png =
      png_create_write_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr,
                              nullptr);
  if (!png) {
    fclose(f);
    return 0;
  }
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_write_struct(&png, nullptr);
    fclose(f);
    return 0;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_write_struct(&png, &info);
    fclose(f);
    return 0;
  }
  png_init_io(png, f);
  if (compress_level < 0) compress_level = 1;
  png_set_compression_level(png, compress_level);
  png_set_IHDR(png, info, (png_uint_32)width, (png_uint_32)height, 8,
               channels == 3 ? PNG_COLOR_TYPE_RGB : PNG_COLOR_TYPE_RGBA,
               PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
               PNG_FILTER_TYPE_DEFAULT);
  png_write_info(png, info);
  const size_t stride = (size_t)width * channels;
  for (int y = 0; y < height; ++y) {
    png_write_row(png, const_cast<png_bytep>(pixels + y * stride));
  }
  png_write_end(png, info);
  png_destroy_write_struct(&png, &info);
  fclose(f);
  return 1;
}

// Encode a tightly-packed RGB8/RGBA8 buffer as an in-memory JPEG — the
// live-viewer present path (host/serve.py streams MJPEG; the reference
// presents via its swapchain, main.cpp:1367-1380). libjpeg writes into a
// buffer it allocates; the caller frees it with bibim_free_buffer.
// Returns the byte count, 0 on failure.
int bibim_encode_jpeg(const uint8_t* pixels, int width, int height,
                      int channels, int quality, uint8_t** out_buf) {
  if (channels != 3 && channels != 4) return 0;
  jpeg_compress_struct cinfo;
  JpegError jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  unsigned char* buf = nullptr;
  unsigned long buf_len = 0;
  std::vector<uint8_t> row;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_compress(&cinfo);
    free(buf);
    return 0;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &buf, &buf_len);
  cinfo.image_width = width;
  cinfo.image_height = height;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  if (channels == 4) row.resize((size_t)width * 3);
  const size_t stride = (size_t)width * channels;
  while ((int)cinfo.next_scanline < height) {
    const uint8_t* src = pixels + cinfo.next_scanline * stride;
    JSAMPROW rp;
    if (channels == 4) {
      for (int x = 0; x < width; ++x) {
        row[x * 3 + 0] = src[x * 4 + 0];
        row[x * 3 + 1] = src[x * 4 + 1];
        row[x * 3 + 2] = src[x * 4 + 2];
      }
      rp = row.data();
    } else {
      rp = const_cast<JSAMPROW>(src);
    }
    jpeg_write_scanlines(&cinfo, &rp, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  *out_buf = buf;
  return (int)buf_len;
}

void bibim_free_buffer(uint8_t* buf) { free(buf); }

const char* bibim_native_version() { return "bibim_native 0.1.0"; }

}  // extern "C"
