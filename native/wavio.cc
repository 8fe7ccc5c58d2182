// Native audio IO for the lasr_tpu data pipeline.
//
// First-party replacement for the native layer the reference delegates to
// (libsndfile via the soundfile wheel + torch DataLoader worker processes,
// reference lasr/data/reader.py:15-29 and bin/train_lighting.py:224-238):
// RIFF/WAVE decode (PCM 8/16/24/32-bit and IEEE float 32/64) with channel
// averaging, plus a thread-pooled batch API that decodes a whole batch of
// files in parallel while Python holds no GIL (called via ctypes).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread wavio.cc -o libwavio.so

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct WavFormat {
  uint16_t audio_format = 0;
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  long data_size = 0;
  long data_offset = 0;
};

bool parse_header(FILE* f, WavFormat* wf) {
  unsigned char hdr[12];
  if (fread(hdr, 1, 12, f) != 12) return false;
  if (memcmp(hdr, "RIFF", 4) != 0 || memcmp(hdr + 8, "WAVE", 4) != 0)
    return false;
  bool have_fmt = false;
  for (;;) {
    unsigned char chunk[8];
    if (fread(chunk, 1, 8, f) != 8) return false;
    uint32_t size;
    memcpy(&size, chunk + 4, 4);
    if (memcmp(chunk, "fmt ", 4) == 0) {
      // PCM fmt body is 16 bytes (bits at +14); EXTENSIBLE sub-format is
      // read at +24, so require size >= 26 before that memcpy. A shorter
      // (malformed/truncated) fmt chunk is rejected, never over-read.
      if (size < 16) return false;
      std::vector<unsigned char> body(size);
      if (fread(body.data(), 1, size, f) != size) return false;
      memcpy(&wf->audio_format, body.data(), 2);
      memcpy(&wf->channels, body.data() + 2, 2);
      memcpy(&wf->sample_rate, body.data() + 4, 4);
      memcpy(&wf->bits, body.data() + 14, 2);
      if (wf->audio_format == 0xFFFE && size >= 26)  // EXTENSIBLE
        memcpy(&wf->audio_format, body.data() + 24, 2);
      if (size % 2) fseek(f, 1, SEEK_CUR);
      have_fmt = true;
    } else if (memcmp(chunk, "data", 4) == 0) {
      if (!have_fmt) return false;
      wf->data_size = static_cast<long>(size);
      wf->data_offset = ftell(f);
      return true;
    } else {
      fseek(f, size + (size % 2), SEEK_CUR);
    }
  }
}

// Decode + average channels into out[0..max_samples). Returns frame count
// actually written, or -1 on error.
long decode_file(const char* path, float* out, long max_samples,
                 int* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavFormat wf;
  if (!parse_header(f, &wf) || wf.channels == 0 || wf.bits == 0) {
    fclose(f);
    return -1;
  }
  *sample_rate = static_cast<int>(wf.sample_rate);
  const int ch = wf.channels;
  const long bytes_per_frame = ch * (wf.bits / 8);
  long frames = wf.data_size / bytes_per_frame;
  if (frames > max_samples) frames = max_samples;

  std::vector<unsigned char> raw(frames * bytes_per_frame);
  if (fread(raw.data(), 1, raw.size(), f) != raw.size()) {
    fclose(f);
    return -1;
  }
  fclose(f);

  const unsigned char* p = raw.data();
  const float inv_ch = 1.0f / ch;
  for (long i = 0; i < frames; ++i) {
    double acc = 0.0;
    for (int c = 0; c < ch; ++c) {
      const unsigned char* s = p + (i * ch + c) * (wf.bits / 8);
      double v = 0.0;
      if (wf.audio_format == 1) {  // integer PCM
        switch (wf.bits) {
          case 16: {
            int16_t x;
            memcpy(&x, s, 2);
            v = x / 32768.0;
            break;
          }
          case 32: {
            int32_t x;
            memcpy(&x, s, 4);
            v = x / 2147483648.0;
            break;
          }
          case 24: {
            int32_t x = s[0] | (s[1] << 8) | (s[2] << 16);
            if (x >= (1 << 23)) x -= (1 << 24);
            v = x / 8388608.0;
            break;
          }
          case 8:
            v = (s[0] - 128.0) / 128.0;
            break;
          default:
            return -1;
        }
      } else if (wf.audio_format == 3) {  // IEEE float
        if (wf.bits == 32) {
          float x;
          memcpy(&x, s, 4);
          v = x;
        } else if (wf.bits == 64) {
          double x;
          memcpy(&x, s, 8);
          v = x;
        } else {
          return -1;
        }
      } else {
        return -1;
      }
      acc += v;
    }
    out[i] = static_cast<float>(acc * inv_ch);
  }
  return frames;
}

}  // namespace

extern "C" {

long wav_read(const char* path, float* out, long max_samples,
              int* sample_rate) {
  return decode_file(path, out, max_samples, sample_rate);
}

long wav_info(const char* path, int* sample_rate, int* channels) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavFormat wf;
  bool ok = parse_header(f, &wf);
  fclose(f);
  if (!ok || wf.channels == 0 || wf.bits == 0) return -1;
  *sample_rate = static_cast<int>(wf.sample_rate);
  *channels = wf.channels;
  return wf.data_size / (wf.channels * (wf.bits / 8));
}

// Decode n files in parallel into out (n x max_samples, zero-padded).
// lengths[i] = decoded frame count (or -1 on error). Returns 0 on success,
// otherwise the count of failed files.
int wav_read_batch(const char** paths, int n, float* out, long max_samples,
                   int* lengths, int* sample_rates, int n_threads) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      float* dst = out + static_cast<long>(i) * max_samples;
      memset(dst, 0, sizeof(float) * max_samples);
      long got = decode_file(paths[i], dst, max_samples, &sample_rates[i]);
      lengths[i] = static_cast<int>(got);
      if (got < 0) failures.fetch_add(1);
    }
  };
  int t = n_threads < 1 ? 1 : n_threads;
  if (t > n) t = n;
  std::vector<std::thread> pool;
  pool.reserve(t);
  for (int i = 0; i < t; ++i) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
