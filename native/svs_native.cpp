// svs_native — native data-loading runtime for svs_tpu.
//
// The reference's input pipeline is 8 torch DataLoader worker PROCESSES each
// re-deserialising whole-song .npy files per item (reference train.py:86-143,
// 179-185).  This library replaces that with:
//   - mmap'd .npy spectrograms (v1/v2 headers), opened once per song
//   - patch extraction that touches only the needed columns, with DC-drop,
//     shared crop, zero-pad and complex->angle (atan2f) done in C++
//   - std::thread batch assembly straight into the caller's pinned batch
//     buffers (no per-item Python objects, no GIL)
//   - a RIFF/WAVE decoder (PCM 8/16/24/32, float32/64, extensible) with
//     mono mixdown, mirroring svs_tpu/data/wav.py
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cmath>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr int kDtypeF4 = 0;   // '<f4'
constexpr int kDtypeC8 = 1;   // '<c8'

struct NpyFile {
  void* map = nullptr;
  size_t map_size = 0;
  const char* data = nullptr;  // payload start
  int64_t rows = 0, cols = 0;
  int dtype = -1;
  bool open = false;
};

std::mutex g_mu;
std::vector<NpyFile> g_files;

int parse_npy_header(const char* buf, size_t size, NpyFile* f,
                     size_t* payload_off) {
  if (size < 10 || std::memcmp(buf, "\x93NUMPY", 6) != 0) return -2;
  const uint8_t major = buf[6];
  size_t hlen, hoff;
  if (major == 1) {
    hlen = *reinterpret_cast<const uint16_t*>(buf + 8);
    hoff = 10;
  } else {
    hlen = *reinterpret_cast<const uint32_t*>(buf + 8);
    hoff = 12;
  }
  if (hoff + hlen > size) return -2;
  std::string h(buf + hoff, hlen);

  if (h.find("'fortran_order': False") == std::string::npos) return -3;
  if (h.find("'<f4'") != std::string::npos) f->dtype = kDtypeF4;
  else if (h.find("'<c8'") != std::string::npos) f->dtype = kDtypeC8;
  else return -4;

  size_t sp = h.find("'shape': (");
  if (sp == std::string::npos) return -5;
  long long r = 0, c = 0;
  if (std::sscanf(h.c_str() + sp, "'shape': (%lld, %lld)", &r, &c) != 2)
    return -5;
  f->rows = r;
  f->cols = c;
  *payload_off = hoff + hlen;
  return 0;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// npy mmap registry
// ---------------------------------------------------------------------------

// Open a 2-D '<f4' or '<c8' .npy file; returns handle >= 0, or a negative
// error code (-1 io, -2 magic, -3 layout, -4 dtype, -5 shape).
int svs_open_npy(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return -1; }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  ::close(fd);
  if (map == MAP_FAILED) return -1;

  NpyFile f;
  f.map = map;
  f.map_size = st.st_size;
  size_t off = 0;
  int rc = parse_npy_header(static_cast<const char*>(map), st.st_size, &f,
                            &off);
  if (rc != 0) { munmap(map, st.st_size); return rc; }
  size_t itemsize = f.dtype == kDtypeC8 ? 8 : 4;
  if (off + itemsize * f.rows * f.cols > static_cast<size_t>(st.st_size)) {
    munmap(map, st.st_size);
    return -6;
  }
  f.data = static_cast<const char*>(map) + off;
  f.open = true;

  std::lock_guard<std::mutex> lk(g_mu);
  for (size_t i = 0; i < g_files.size(); ++i) {
    if (!g_files[i].open) { g_files[i] = f; return static_cast<int>(i); }
  }
  g_files.push_back(f);
  return static_cast<int>(g_files.size() - 1);
}

int svs_npy_info(int h, int64_t* rows, int64_t* cols, int* dtype) {
  std::lock_guard<std::mutex> lk(g_mu);
  if (h < 0 || h >= static_cast<int>(g_files.size()) || !g_files[h].open)
    return -1;
  *rows = g_files[h].rows;
  *cols = g_files[h].cols;
  *dtype = g_files[h].dtype;
  return 0;
}

void svs_close_npy(int h) {
  std::lock_guard<std::mutex> lk(g_mu);
  if (h < 0 || h >= static_cast<int>(g_files.size()) || !g_files[h].open)
    return;
  munmap(g_files[h].map, g_files[h].map_size);
  g_files[h] = NpyFile{};
}

// ---------------------------------------------------------------------------
// patch extraction
// ---------------------------------------------------------------------------

namespace {

// Copy columns [start, start+out_len) of rows [row_lo, rows) from a '<f4'
// file into out (row-major (rows-row_lo, out_len)), zero-padding columns past
// the end (reference train.py:127-135 pad semantics).
int fill_f4(const NpyFile& f, int row_lo, int64_t start, int64_t out_len,
            float* out) {
  const int64_t nrows = f.rows - row_lo;
  const int64_t avail = start < f.cols ? std::min(out_len, f.cols - start)
                                       : 0;
  const float* src = reinterpret_cast<const float*>(f.data);
  for (int64_t r = 0; r < nrows; ++r) {
    const float* row = src + (r + row_lo) * f.cols + start;
    float* dst = out + r * out_len;
    std::memcpy(dst, row, avail * sizeof(float));
    if (avail < out_len)
      std::memset(dst + avail, 0, (out_len - avail) * sizeof(float));
  }
  return 0;
}

// Same for a '<c8' file, writing the phase ANGLE (np.angle semantics,
// reference train.py:105-106).
int fill_c8_angle(const NpyFile& f, int row_lo, int64_t start,
                  int64_t out_len, float* out) {
  const int64_t nrows = f.rows - row_lo;
  const int64_t avail = start < f.cols ? std::min(out_len, f.cols - start)
                                       : 0;
  const float* src = reinterpret_cast<const float*>(f.data);
  for (int64_t r = 0; r < nrows; ++r) {
    const float* row = src + 2 * ((r + row_lo) * f.cols + start);
    float* dst = out + r * out_len;
    for (int64_t c = 0; c < avail; ++c)
      dst[c] = atan2f(row[2 * c + 1], row[2 * c]);
    if (avail < out_len)
      std::memset(dst + avail, 0, (out_len - avail) * sizeof(float));
  }
  return 0;
}

}  // namespace

// Assemble a training batch: for each item b, copy the shared random crop
// starts[b] from (mag_handles[b], phase_handles[b]) into
// mag_out/angle_out[b] (each (batch, rows-drop_dc, out_len) row-major).
// angle_out may be nullptr (with phase_handles nullptr too): magnitudes
// only — the Python side slices angles from its per-song cache so all
// backends share ONE angle computation (bit-identical batches).
// Work is split across n_threads std::threads.  Returns 0 or first error.
int svs_fill_batch(const int* mag_handles, const int* phase_handles,
                   const int64_t* starts, int batch, int drop_dc,
                   int64_t out_len, float* mag_out, float* angle_out,
                   int n_threads) {
  const bool want_angle = angle_out != nullptr;
  if (want_angle && phase_handles == nullptr) return -13;
  std::vector<NpyFile> mags(batch), phases(batch);
  {
    std::lock_guard<std::mutex> lk(g_mu);
    for (int b = 0; b < batch; ++b) {
      int hm = mag_handles[b];
      if (hm < 0 || hm >= static_cast<int>(g_files.size()) ||
          !g_files[hm].open || g_files[hm].dtype != kDtypeF4)
        return -10;
      mags[b] = g_files[hm];
      if (want_angle) {
        int hp = phase_handles[b];
        if (hp < 0 || hp >= static_cast<int>(g_files.size()) ||
            !g_files[hp].open || g_files[hp].dtype != kDtypeC8)
          return -11;
        phases[b] = g_files[hp];
      }
    }
  }
  const int64_t item_rows = mags[0].rows - drop_dc;
  const int64_t item = item_rows * out_len;

  std::atomic<int> next(0), err(0);
  auto worker = [&]() {
    int b;
    while ((b = next.fetch_add(1)) < batch) {
      if (mags[b].rows - drop_dc != item_rows ||
          (want_angle && phases[b].rows != mags[b].rows)) {
        err.store(-12);
        continue;
      }
      fill_f4(mags[b], drop_dc, starts[b], out_len, mag_out + b * item);
      if (want_angle)
        fill_c8_angle(phases[b], drop_dc, starts[b], out_len,
                      angle_out + b * item);
    }
  };
  int t = std::max(1, std::min(n_threads, batch));
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return err.load();
}

// ---------------------------------------------------------------------------
// WAV decode
// ---------------------------------------------------------------------------

namespace {

struct WavInfo {
  int format = 0;  // 1 pcm, 3 float
  int bits = 0;
  int channels = 0;
  int sample_rate = 0;
  const char* payload = nullptr;
  size_t payload_size = 0;
};

int parse_wav(const char* buf, size_t size, WavInfo* w) {
  if (size < 12 || std::memcmp(buf, "RIFF", 4) != 0 ||
      std::memcmp(buf + 8, "WAVE", 4) != 0)
    return -2;
  size_t pos = 12;
  while (pos + 8 <= size) {
    const char* cid = buf + pos;
    uint32_t csz = *reinterpret_cast<const uint32_t*>(buf + pos + 4);
    const char* body = buf + pos + 8;
    if (pos + 8 + csz > size) csz = size - pos - 8;
    if (std::memcmp(cid, "fmt ", 4) == 0 && csz >= 16) {
      w->format = *reinterpret_cast<const uint16_t*>(body);
      w->channels = *reinterpret_cast<const uint16_t*>(body + 2);
      w->sample_rate = *reinterpret_cast<const uint32_t*>(body + 4);
      w->bits = *reinterpret_cast<const uint16_t*>(body + 14);
      if (w->format == 0xFFFE && csz >= 26)  // extensible
        w->format = *reinterpret_cast<const uint16_t*>(body + 24);
    } else if (std::memcmp(cid, "data", 4) == 0) {
      w->payload = body;
      w->payload_size = csz;
    }
    pos += 8 + csz + (csz & 1);
  }
  if (!w->payload || !w->channels || !w->bits) return -3;
  return 0;
}

}  // namespace

// Probe a wav file: frames (per channel), channels, sample rate.
int svs_wav_info(const char* path, int64_t* frames, int* channels, int* sr) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  fstat(fd, &st);
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  ::close(fd);
  if (map == MAP_FAILED) return -1;
  WavInfo w;
  int rc = parse_wav(static_cast<const char*>(map), st.st_size, &w);
  if (rc == 0) {
    *channels = w.channels;
    *sr = w.sample_rate;
    *frames = static_cast<int64_t>(w.payload_size) /
              (w.channels * (w.bits / 8));
  }
  munmap(map, st.st_size);
  return rc;
}

// Decode to float32 in [-1, 1]; mono=1 mixes channels down by mean
// (librosa.to_mono semantics, reference data.py:78).  out must hold `frames`
// (mono) or `frames*channels` (interleaved) floats.
int svs_read_wav_f32(const char* path, float* out, int64_t capacity,
                     int mono) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  fstat(fd, &st);
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  ::close(fd);
  if (map == MAP_FAILED) return -1;
  WavInfo w;
  int rc = parse_wav(static_cast<const char*>(map), st.st_size, &w);
  if (rc != 0) { munmap(map, st.st_size); return rc; }

  const int ch = w.channels;
  const int64_t frames = static_cast<int64_t>(w.payload_size) /
                         (ch * (w.bits / 8));
  const int64_t need = mono ? frames : frames * ch;
  if (need > capacity) { munmap(map, st.st_size); return -7; }

  auto sample = [&](int64_t i) -> float {  // i-th interleaved sample
    const char* p = w.payload;
    if (w.format == 3) {
      if (w.bits == 32) return reinterpret_cast<const float*>(p)[i];
      return static_cast<float>(reinterpret_cast<const double*>(p)[i]);
    }
    switch (w.bits) {
      case 16:
        return reinterpret_cast<const int16_t*>(p)[i] / 32768.0f;
      case 32:
        return reinterpret_cast<const int32_t*>(p)[i] / 2147483648.0f;
      case 24: {
        const uint8_t* b =
            reinterpret_cast<const uint8_t*>(p) + 3 * i;
        int32_t v = b[0] | (b[1] << 8) | (b[2] << 16);
        if (v >= (1 << 23)) v -= (1 << 24);
        return v / 8388608.0f;
      }
      case 8:
        return (reinterpret_cast<const uint8_t*>(p)[i] - 128) / 128.0f;
      default:
        return 0.0f;
    }
  };

  if (mono) {
    for (int64_t f = 0; f < frames; ++f) {
      float acc = 0.0f;
      for (int c = 0; c < ch; ++c) acc += sample(f * ch + c);
      out[f] = acc / ch;
    }
  } else {
    for (int64_t i = 0; i < frames * ch; ++i) out[i] = sample(i);
  }
  munmap(map, st.st_size);
  return 0;
}

int svs_native_abi_version() { return 2; }

}  // extern "C"
