// imloader — native threaded image loading for image_matching_tpu.
//
// The reference feeds its trainers through torch DataLoader worker
// *processes* doing cv2.imread + resize per sample (datasets/ALLSS.py:141-144,
// SURVEY.md §3.3/§3.4 boundaries). This library is the TPU-framework
// equivalent of that native layer: a C++ thread pool decodes PNG/JPEG,
// converts to grayscale float32 [0,1], area-resizes, and fills a bounded
// prefetch queue; Python drains whole batches through one ctypes call, so
// the host input pipeline keeps the accelerator fed without Python in the
// decode path.
//
// C API (see image_matching_tpu/data/native_loader.py):
//   iml_create(paths, n, out_h, out_w, n_threads, capacity, loop, seed)
//   iml_next_batch(handle, out_images, out_indices, batch) -> filled count
//   iml_destroy(handle)
//   iml_decode_file(path, out_h, out_w, out_buf) -> 0/err (single image)

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <setjmp.h>

namespace {

struct Image {
  int w = 0, h = 0, channels = 0;
  std::vector<uint8_t> data;  // interleaved
};

// ---------------------------------------------------------------- decoding

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_GRAYSCALE;  // decoder does the luma conversion
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->channels = cinfo.output_components;
  out->data.resize(size_t(out->w) * out->h * out->channels);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() +
                   size_t(cinfo.output_scanline) * out->w * out->channels;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

bool decode_png(FILE* f, Image* out) {
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

  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  // collapse colour to grayscale with standard luma weights
  if (png_get_color_type(png, info) & PNG_COLOR_MASK_COLOR)
    png_set_rgb_to_gray(png, 1 /*error_action: silent*/, -1, -1);
  png_read_update_info(png, info);

  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->channels = png_get_channels(png, info);
  out->data.resize(size_t(out->w) * out->h * out->channels);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * out->channels;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t got = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (got >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (got >= 8 && !png_sig_cmp(magic, 0, 8)) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok;
}

// gray uint8 (h, w) -> float32 [0,1] (out_h, out_w), area-style average
void resize_to(const Image& im, int out_h, int out_w, float* dst) {
  const double sy = double(im.h) / out_h;
  const double sx = double(im.w) / out_w;
  for (int oy = 0; oy < out_h; ++oy) {
    int y0 = int(oy * sy);
    int y1 = int((oy + 1) * sy);
    if (y1 <= y0) y1 = y0 + 1;
    if (y1 > im.h) y1 = im.h;
    for (int ox = 0; ox < out_w; ++ox) {
      int x0 = int(ox * sx);
      int x1 = int((ox + 1) * sx);
      if (x1 <= x0) x1 = x0 + 1;
      if (x1 > im.w) x1 = im.w;
      uint64_t acc = 0;
      for (int y = y0; y < y1; ++y) {
        const uint8_t* row = im.data.data() + size_t(y) * im.w;
        for (int x = x0; x < x1; ++x) acc += row[x];
      }
      dst[size_t(oy) * out_w + ox] =
          float(acc) / (float(y1 - y0) * float(x1 - x0) * 255.0f);
    }
  }
}

// ---------------------------------------------------------------- loader

struct Item {
  int index;
  std::vector<float> pixels;  // (out_h * out_w)
};

struct Loader {
  std::vector<std::string> paths;
  int out_h, out_w;
  bool loop;
  std::mt19937 rng;

  std::vector<int> order;
  size_t cursor = 0;
  std::mutex order_mu;

  std::deque<Item> queue;
  size_t capacity;
  std::mutex mu;
  std::condition_variable not_full, not_empty;
  std::atomic<bool> stop{false};
  std::atomic<int> exhausted_workers{0};
  int n_threads;
  std::vector<std::thread> workers;

  int next_index() {
    std::lock_guard<std::mutex> g(order_mu);
    if (cursor >= order.size()) {
      if (!loop) return -1;
      std::shuffle(order.begin(), order.end(), rng);
      cursor = 0;
    }
    return order[cursor++];
  }

  void worker() {
    while (!stop.load()) {
      int idx = next_index();
      if (idx < 0) break;
      Item item;
      item.index = idx;
      item.pixels.resize(size_t(out_h) * out_w, 0.0f);
      Image im;
      if (decode_file(paths[idx].c_str(), &im) && im.w > 0 && im.h > 0) {
        resize_to(im, out_h, out_w, item.pixels.data());
      } else {
        item.index = -(idx + 1);  // signal decode failure, keep zeros
      }
      std::unique_lock<std::mutex> lk(mu);
      not_full.wait(lk, [&] { return queue.size() < capacity || stop.load(); });
      if (stop.load()) break;
      queue.push_back(std::move(item));
      not_empty.notify_all();
    }
    exhausted_workers.fetch_add(1);
    std::lock_guard<std::mutex> g(mu);
    not_empty.notify_all();
  }

  bool drained() { return exhausted_workers.load() >= n_threads; }
};

}  // namespace

extern "C" {

void* iml_create(const char** paths, int n_paths, int out_h, int out_w,
                 int n_threads, int capacity, int loop, unsigned seed) {
  auto* l = new Loader();
  l->paths.reserve(n_paths);
  for (int i = 0; i < n_paths; ++i) l->paths.emplace_back(paths[i]);
  l->out_h = out_h;
  l->out_w = out_w;
  l->loop = loop != 0;
  l->rng.seed(seed);
  l->capacity = capacity > 0 ? capacity : 16;
  l->order.resize(n_paths);
  for (int i = 0; i < n_paths; ++i) l->order[i] = i;
  std::shuffle(l->order.begin(), l->order.end(), l->rng);
  l->n_threads = n_threads > 0 ? n_threads : 4;
  for (int t = 0; t < l->n_threads; ++t)
    l->workers.emplace_back([l] { l->worker(); });
  return l;
}

// Fills up to `batch` images; returns number filled (0 once drained in
// non-loop mode). out_images: batch*out_h*out_w floats; out_indices: batch ints
// (negative-1-based index marks a decode failure for that slot).
int iml_next_batch(void* handle, float* out_images, int* out_indices,
                   int batch) {
  auto* l = static_cast<Loader*>(handle);
  int filled = 0;
  const size_t stride = size_t(l->out_h) * l->out_w;
  while (filled < batch) {
    std::unique_lock<std::mutex> lk(l->mu);
    l->not_empty.wait(
        lk, [&] { return !l->queue.empty() || l->drained() || l->stop.load(); });
    if (l->queue.empty()) break;  // drained
    Item item = std::move(l->queue.front());
    l->queue.pop_front();
    l->not_full.notify_all();
    lk.unlock();
    std::memcpy(out_images + size_t(filled) * stride, item.pixels.data(),
                stride * sizeof(float));
    out_indices[filled] = item.index;
    ++filled;
  }
  return filled;
}

int iml_num_paths(void* handle) {
  return int(static_cast<Loader*>(handle)->paths.size());
}

void iml_destroy(void* handle) {
  auto* l = static_cast<Loader*>(handle);
  l->stop.store(true);
  {
    std::lock_guard<std::mutex> g(l->mu);
    l->not_full.notify_all();
    l->not_empty.notify_all();
  }
  for (auto& t : l->workers) t.join();
  delete l;
}

// One-shot decode+resize (no threads) — used for eval/tools.
int iml_decode_file(const char* path, int out_h, int out_w, float* out) {
  Image im;
  if (!decode_file(path, &im) || im.w <= 0) return 1;
  resize_to(im, out_h, out_w, out);
  return 0;
}

}  // extern "C"
