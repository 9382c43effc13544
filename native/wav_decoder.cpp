// Multi-threaded batch WAV decoder for the Speech Commands ingest path.
//
// The dataset is ~100k small PCM16 mono RIFF files; Python-side decoding
// (wave module) is the cold-path bottleneck of dataset preparation. This
// decoder walks RIFF chunks, converts PCM8/16/24/32 to float32 in [-1, 1),
// takes the first channel, and fills a fixed-stride batch buffer from a
// thread pool. Exposed as a plain C ABI for ctypes.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libwavdec.so wav_decoder.cpp -lpthread

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct WavInfo {
  int sample_rate = 0;
  int channels = 0;
  int bits = 0;
  int n_frames = 0;  // frames written to out
  int status = 0;    // 0 ok, nonzero = error code
};

uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) { return (uint16_t)p[0] | ((uint16_t)p[1] << 8); }

// Shared RIFF walk: load the file and locate fmt + data. On success,
// `parsed.data` points into `buf` and info carries rate/channels/bits.
struct Parsed {
  const uint8_t* data = nullptr;
  size_t data_len = 0;
  int fmt_tag = 0;
};

Parsed parse_riff(const char* path, std::vector<uint8_t>& buf, WavInfo& info) {
  Parsed parsed;
  FILE* f = fopen(path, "rb");
  if (!f) {
    info.status = 1;
    return parsed;
  }
  // Read the whole file (Speech Commands clips are ~32 KB).
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (size < 44 || size > (64 << 20)) {
    fclose(f);
    info.status = 2;
    return parsed;
  }
  buf.resize((size_t)size);
  if (fread(buf.data(), 1, (size_t)size, f) != (size_t)size) {
    fclose(f);
    info.status = 3;
    return parsed;
  }
  fclose(f);

  const uint8_t* p = buf.data();
  if (memcmp(p, "RIFF", 4) != 0 || memcmp(p + 8, "WAVE", 4) != 0) {
    info.status = 4;
    return parsed;
  }

  // Walk chunks for fmt + data.
  size_t pos = 12;
  int fmt_tag = 0, channels = 0, bits = 0, rate = 0;
  const uint8_t* data = nullptr;
  size_t data_len = 0;
  while (pos + 8 <= (size_t)size) {
    const uint8_t* hdr = p + pos;
    uint32_t chunk_len = rd_u32(hdr + 4);
    const uint8_t* body = hdr + 8;
    if (pos + 8 + chunk_len > (size_t)size) chunk_len = (uint32_t)(size - pos - 8);
    if (memcmp(hdr, "fmt ", 4) == 0 && chunk_len >= 16) {
      fmt_tag = rd_u16(body);
      channels = rd_u16(body + 2);
      rate = (int)rd_u32(body + 4);
      bits = rd_u16(body + 14);
    } else if (memcmp(hdr, "data", 4) == 0) {
      data = body;
      data_len = chunk_len;
    }
    pos += 8 + chunk_len + (chunk_len & 1);  // chunks are word-aligned
  }
  if (!data || channels <= 0 || rate <= 0 || (fmt_tag != 1 && fmt_tag != 3)) {
    info.status = 5;
    return parsed;
  }
  info.sample_rate = rate;
  info.channels = channels;
  info.bits = bits;
  parsed.data = data;
  parsed.data_len = data_len;
  parsed.fmt_tag = fmt_tag;
  return parsed;
}

// Decode one file's first channel into out[0..max_len), zero-padding the
// tail. Returns info; info.status != 0 on failure.
WavInfo decode_one(const char* path, float* out, int max_len) {
  WavInfo info;
  std::vector<uint8_t> buf;
  Parsed parsed = parse_riff(path, buf, info);
  if (info.status != 0) return info;
  int channels = info.channels, bits = info.bits, fmt_tag = parsed.fmt_tag;
  const uint8_t* data = parsed.data;

  int bytes_per = bits / 8;
  long total_frames = (long)(parsed.data_len / ((size_t)bytes_per * channels));
  int n = (int)(total_frames < max_len ? total_frames : max_len);
  info.n_frames = n;

  if (fmt_tag == 3 && bits == 32) {  // IEEE float
    for (int i = 0; i < n; i++) {
      float v;
      memcpy(&v, data + (size_t)i * channels * 4, 4);
      out[i] = v;
    }
  } else if (bits == 16) {
    for (int i = 0; i < n; i++) {
      int16_t v = (int16_t)rd_u16(data + (size_t)i * channels * 2);
      out[i] = (float)v / 32768.0f;
    }
  } else if (bits == 8) {
    for (int i = 0; i < n; i++) {
      out[i] = ((float)data[(size_t)i * channels] - 128.0f) / 128.0f;
    }
  } else if (bits == 24) {
    for (int i = 0; i < n; i++) {
      const uint8_t* s = data + (size_t)i * channels * 3;
      int32_t v = (int32_t)((uint32_t)s[0] << 8 | (uint32_t)s[1] << 16 |
                            (uint32_t)s[2] << 24) >> 8;
      out[i] = (float)v / 8388608.0f;
    }
  } else if (bits == 32) {
    for (int i = 0; i < n; i++) {
      int32_t v;
      memcpy(&v, data + (size_t)i * channels * 4, 4);
      out[i] = (float)v / 2147483648.0f;
    }
  } else {
    info.status = 6;
    return info;
  }
  for (int i = n; i < max_len; i++) out[i] = 0.0f;
  return info;
}

// int16 PCM passthrough decode: the raw samples go out untouched (half the
// bytes of f32 — the caller ships them to the accelerator and dequantizes
// there). Only fmt 1 / 16-bit files qualify; everything else returns
// status 7 so the caller can fall back to the float path for that file.
WavInfo decode_one_i16(const char* path, int16_t* out, int max_len) {
  WavInfo info;
  std::vector<uint8_t> buf;
  Parsed parsed = parse_riff(path, buf, info);
  if (info.status != 0) return info;
  if (parsed.fmt_tag != 1 || info.bits != 16) {
    info.status = 7;  // not int16 PCM — caller retries as float
    return info;
  }
  int channels = info.channels;
  long total_frames = (long)(parsed.data_len / ((size_t)2 * channels));
  int n = (int)(total_frames < max_len ? total_frames : max_len);
  info.n_frames = n;
  const uint8_t* data = parsed.data;
  if (channels == 1) {
    memcpy(out, data, (size_t)n * 2);  // mono: contiguous copy
  } else {
    for (int i = 0; i < n; i++)
      out[i] = (int16_t)rd_u16(data + (size_t)i * channels * 2);
  }
  for (int i = n; i < max_len; i++) out[i] = 0;
  return info;
}

}  // namespace

extern "C" {

// paths: n C strings. out: (n, max_len) float32, zero-padded.
// lengths/rates/status: n int32 each. Returns number of failed files.
int wavdec_batch(const char** paths, int n, float* out, int max_len,
                 int* lengths, int* rates, int* status, int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads > n) n_threads = n > 0 ? n : 1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);

  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      WavInfo info = decode_one(paths[i], out + (size_t)i * max_len, max_len);
      lengths[i] = info.n_frames;
      rates[i] = info.sample_rate;
      status[i] = info.status;
      if (info.status != 0) failures.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; t++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

// paths: n C strings. out: (n, max_len) int16, zero-padded, raw PCM.
// Per-file status 7 marks non-int16-PCM files (caller falls back to the
// float decoder for those); other nonzero statuses are hard errors.
// Returns number of files with nonzero status.
int wavdec_batch_i16(const char** paths, int n, int16_t* out, int max_len,
                     int* lengths, int* rates, int* status, int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads > n) n_threads = n > 0 ? n : 1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);

  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      WavInfo info = decode_one_i16(paths[i], out + (size_t)i * max_len, max_len);
      lengths[i] = info.n_frames;
      rates[i] = info.sample_rate;
      status[i] = info.status;
      if (info.status != 0) failures.fetch_add(1);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; t++) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

int wavdec_version() { return 2; }

}  // extern "C"
