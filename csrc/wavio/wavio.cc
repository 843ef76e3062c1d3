// Native WAV decode for the host data feeder.
//
// The reference's data path decodes audio in torchaudio's C++ sox backend
// inside torch DataLoader worker processes (lid/raw_datasets.py:250 →
// torchaudio.load).  This rebuild's feeder is Python threads; this library
// moves the per-item decode (the hot host loop at training time) into C++:
// single-file decode plus a multithreaded padded-batch API that writes
// straight into the (N, T_max) float32 batch buffer — no intermediate
// per-item allocations, GIL released for the whole batch.
//
// Formats: RIFF/WAVE with PCM 8/16/24/32-bit int, IEEE float32/64, and
// WAVE_FORMAT_EXTENSIBLE wrappers of either.  Multi-channel files return
// channel 0, matching the Python reader (speechlid_tpu/data/audio_io.py)
// and torchaudio's `[0]` selection in the reference.
//
// C ABI (ctypes; exceptions never cross the boundary):
//   wavio_info(path, *frames, *sr, *channels)            -> 0 | <0 error
//   wavio_read(path, out, capacity, *sr)                 -> frames | <0
//   wavio_read_batch(paths, n, out, capacity, lengths,
//                    srs, n_threads)                     -> 0 | <0 first error
//
// Error codes: -1 open/IO, -2 not a RIFF/WAVE, -3 unsupported encoding,
// -4 malformed chunk layout, -5 capacity too small.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int kErrIO = -1;
constexpr int kErrNotWav = -2;
constexpr int kErrEncoding = -3;
constexpr int kErrMalformed = -4;
constexpr int kErrCapacity = -5;

struct WavMeta {
  uint16_t format = 0;     // 1 = PCM, 3 = IEEE float (after EXTENSIBLE unwrap)
  uint16_t channels = 0;
  uint32_t sample_rate = 0;
  uint16_t bits = 0;
  long data_offset = 0;    // file offset of the sample data
  uint32_t data_bytes = 0;
};

uint32_t rd_u32(const unsigned char* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const unsigned char* p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}

// Parse the chunk layout; leaves the file usable for a follow-up data read.
int parse_header(FILE* f, WavMeta* meta) {
  unsigned char hdr[12];
  if (std::fread(hdr, 1, 12, f) != 12) return kErrNotWav;
  if (std::memcmp(hdr, "RIFF", 4) != 0 || std::memcmp(hdr + 8, "WAVE", 4) != 0)
    return kErrNotWav;
  bool have_fmt = false, have_data = false;
  while (!have_fmt || !have_data) {
    unsigned char ch[8];
    if (std::fread(ch, 1, 8, f) != 8) break;  // EOF: stop with what we have
    uint32_t size = rd_u32(ch + 4);
    if (std::memcmp(ch, "fmt ", 4) == 0) {
      if (size < 16 || size > 4096) return kErrMalformed;
      std::vector<unsigned char> fmt(size);
      if (std::fread(fmt.data(), 1, size, f) != size) return kErrMalformed;
      meta->format = rd_u16(&fmt[0]);
      meta->channels = rd_u16(&fmt[2]);
      meta->sample_rate = rd_u32(&fmt[4]);
      meta->bits = rd_u16(&fmt[14]);
      if (meta->format == 0xFFFE && size >= 40) {
        // WAVE_FORMAT_EXTENSIBLE: the real format is the first 2 bytes of
        // the 16-byte SubFormat GUID at offset 24
        meta->format = rd_u16(&fmt[24]);
      }
      have_fmt = true;
    } else if (std::memcmp(ch, "data", 4) == 0) {
      meta->data_offset = std::ftell(f);
      meta->data_bytes = size;
      have_data = true;
      if (!have_fmt) {
        if (std::fseek(f, size + (size & 1), SEEK_CUR) != 0)
          return kErrMalformed;
      }
    } else {
      // skip unknown chunk (word-aligned)
      if (std::fseek(f, size + (size & 1), SEEK_CUR) != 0) break;
    }
  }
  if (!have_fmt || !have_data) return kErrNotWav;
  if (meta->channels == 0 || meta->sample_rate == 0 || meta->bits == 0)
    return kErrMalformed;
  if (meta->format == 1) {
    if (meta->bits != 8 && meta->bits != 16 && meta->bits != 24 &&
        meta->bits != 32)
      return kErrEncoding;
  } else if (meta->format == 3) {
    if (meta->bits != 32 && meta->bits != 64) return kErrEncoding;
  } else {
    return kErrEncoding;
  }
  return 0;
}

long frames_of(const WavMeta& m) {
  long bytes_per_frame = static_cast<long>(m.channels) * (m.bits / 8);
  return bytes_per_frame ? static_cast<long>(m.data_bytes) / bytes_per_frame
                         : 0;
}

// Decode channel 0 into out[0..frames); returns frames decoded or <0.
long decode(FILE* f, const WavMeta& m, float* out, long capacity) {
  long frames = frames_of(m);
  if (frames > capacity) return kErrCapacity;
  if (std::fseek(f, m.data_offset, SEEK_SET) != 0) return kErrIO;
  const int bpsamp = m.bits / 8;
  const long frame_bytes = static_cast<long>(m.channels) * bpsamp;
  // stream in ~256 KB chunks of whole frames
  const long frames_per_buf =
      frame_bytes ? std::max<long>(1, (256L << 10) / frame_bytes) : 1;
  std::vector<unsigned char> buf(frames_per_buf * frame_bytes);
  // fast paths for the dominant corpus formats (mono PCM16 / float32):
  // contiguous reads + a tight unit-stride loop GCC auto-vectorizes
  if (m.channels == 1 && ((m.format == 1 && m.bits == 16) ||
                          (m.format == 3 && m.bits == 32))) {
    long done = 0;
    const float k16 = 1.0f / 32768.0f;
    while (done < frames) {
      long want = std::min(frames - done, frames_per_buf);
      size_t got = std::fread(buf.data(), frame_bytes, want, f);
      if (got == 0) break;
      if (m.format == 1) {
        const int16_t* s = reinterpret_cast<const int16_t*>(buf.data());
        float* o = out + done;
        for (size_t i = 0; i < got; ++i) o[i] = s[i] * k16;
      } else {
        std::memcpy(out + done, buf.data(), got * 4);
      }
      done += static_cast<long>(got);
    }
    return done;
  }
  long done = 0;
  while (done < frames) {
    long want = std::min(frames - done, frames_per_buf);
    size_t got = std::fread(buf.data(), frame_bytes, want, f);
    if (got == 0) break;  // truncated data chunk: return what decoded
    const unsigned char* p = buf.data();
    for (size_t i = 0; i < got; ++i, p += frame_bytes) {
      float v;
      if (m.format == 3) {
        if (m.bits == 32) {
          float s;
          std::memcpy(&s, p, 4);
          v = s;
        } else {
          double s;
          std::memcpy(&s, p, 8);
          v = static_cast<float>(s);
        }
      } else if (m.bits == 16) {
        int16_t s;
        std::memcpy(&s, p, 2);
        v = static_cast<float>(s) / 32768.0f;
      } else if (m.bits == 32) {
        int32_t s;
        std::memcpy(&s, p, 4);
        v = static_cast<float>(s) / 2147483648.0f;
      } else if (m.bits == 24) {
        // little-endian 24-bit → sign-extended 32-bit via unsigned shift
        uint32_t u = (static_cast<uint32_t>(p[0]) << 8) |
                     (static_cast<uint32_t>(p[1]) << 16) |
                     (static_cast<uint32_t>(p[2]) << 24);
        int32_t s;
        std::memcpy(&s, &u, 4);
        v = static_cast<float>(s >> 8) / 8388608.0f;
      } else {  // 8-bit unsigned
        v = (static_cast<float>(p[0]) - 128.0f) / 128.0f;
      }
      out[done + static_cast<long>(i)] = v;
    }
    done += static_cast<long>(got);
  }
  return done;
}

}  // namespace

extern "C" {

int wavio_info(const char* path, long* frames, int* sample_rate,
               int* channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return kErrIO;
  WavMeta m;
  int rc = parse_header(f, &m);
  std::fclose(f);
  if (rc != 0) return rc;
  if (frames) *frames = frames_of(m);
  if (sample_rate) *sample_rate = static_cast<int>(m.sample_rate);
  if (channels) *channels = static_cast<int>(m.channels);
  return 0;
}

long wavio_read(const char* path, float* out, long capacity,
                int* sample_rate) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return kErrIO;
  WavMeta m;
  int rc = parse_header(f, &m);
  if (rc != 0) {
    std::fclose(f);
    return rc;
  }
  long n = decode(f, m, out, capacity);
  std::fclose(f);
  if (n >= 0 && sample_rate) *sample_rate = static_cast<int>(m.sample_rate);
  return n;
}

// Padded batch decode: out is (n, capacity) row-major float32; each row is
// zero-padded past its length.  Work is sharded over n_threads (<=0 →
// hardware_concurrency).  Returns 0 or the FIRST (by index) error code;
// lengths[i] of failed items are set to the error code.
int wavio_read_batch(const char** paths, int n, float* out, long capacity,
                     long* lengths, int* sample_rates, int n_threads) {
  if (n <= 0) return 0;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (n_threads <= 0) n_threads = hw > 0 ? hw : 1;
  n_threads = std::min(n_threads, n);
  std::atomic<int> next(0);

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      float* row = out + static_cast<long>(i) * capacity;
      int sr = 0;
      long got = wavio_read(paths[i], row, capacity, &sr);
      lengths[i] = got;
      if (sample_rates) sample_rates[i] = sr;
      if (got >= 0 && got < capacity)
        std::memset(row + got, 0, (capacity - got) * sizeof(float));
      else if (got < 0)
        std::memset(row, 0, capacity * sizeof(float));
    }
  };

  if (n_threads == 1) {
    worker();
  } else {
    std::vector<std::thread> ts;
    ts.reserve(n_threads);
    for (int t = 0; t < n_threads; ++t) ts.emplace_back(worker);
    for (auto& t : ts) t.join();
  }
  for (int i = 0; i < n; ++i)
    if (lengths[i] < 0) return static_cast<int>(lengths[i]);
  return 0;
}

}  // extern "C"
