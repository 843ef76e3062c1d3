// Host-side batched CTC prefix beam search with n-gram LM fusion.
//
// TPU-native replacement for the reference's third-party native stack
// (SURVEY.md §2.4): OpenSeq2Seq ctc_decoders (C++ beam search, built from
// decoders.tar.gz by lid/requirements/install.sh) + KenLM (Scorer inside the
// decoder and standalone perplexity queries for language arbitration,
// lid/test.py:202-220).  One self-contained library:
//
//  - ArpaLM: ARPA text n-gram model with backoff (log10 domain), sentence
//    scoring with <s>/</s> context and KenLM-style perplexity
//    10^(-score/(nwords+1));
//  - ProbingKenLM: read-only loader for KenLM *binary* models in the
//    default "probing" format (magic "mmap lm ... format version 5"), so
//    the reference's trained .bin/.klm artifacts load directly
//    (lid/lm_decoder.py:23-62, lid/test.py:58-60).  Layout facts derived
//    from the published format: murmur64a-hashed vocab probing table,
//    (prob, backoff) unigram array, per-order middle probing tables keyed
//    on a reversed word-id hash chain, float probs carrying an
//    extend-left flag in the sign bit.  Parity vs the upstream query tool
//    is pinned by tests/data/tiny_probing.klm golden scores;
//  - Scorer: word-level fusion  alpha·log10 P(w|ctx) + beta  applied at
//    word boundaries (space) and end-of-utterance, matching the
//    OpenSeq2Seq/PaddlePaddle scorer the reference wraps
//    (lid/lm_decoder.py:23-62);
//  - ctc_beam_search_batch: per-utterance prefix beam search over
//    softmax probabilities with cutoff_top_n / cutoff_prob pruning,
//    multi-threaded over the batch (num_processes analog).
//
// The device computes log-probs; this library only runs on host CPU where
// branchy search belongs.  Exposed through a C ABI for ctypes (no pybind11
// in this image).

#include <algorithm>
#include <cctype>
#include <cmath>
#include <cstring>
#include <fstream>
#include <limits>
#include <map>
#include <memory>
#include <mutex>
#include <sstream>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kLogZero = -std::numeric_limits<double>::infinity();
constexpr double kOovPenalty = -1000.0;  // KenLM-ish unk penalty in log10

double log_sum_exp10(double a, double b) {
  // inputs/outputs in log10 domain
  if (a == kLogZero) return b;
  if (b == kLogZero) return a;
  double m = std::max(a, b);
  return m + std::log10(std::pow(10.0, a - m) + std::pow(10.0, b - m));
}

std::vector<std::string> split_ws(const std::string& s) {
  std::vector<std::string> out;
  std::istringstream iss(s);
  std::string tok;
  while (iss >> tok) out.push_back(tok);
  return out;
}

// ---------------------------------------------------------------------------
// n-gram LM interface (ARPA text + KenLM probing binary backends)
// ---------------------------------------------------------------------------

class NgramModelBase {
 public:
  virtual ~NgramModelBase() = default;
  virtual int order() const = 0;

  // log10 P(w | context words), with backoff recursion.
  virtual double WordScore(const std::vector<std::string>& context,
                           const std::string& word) const = 0;

  // total log10 prob of a sentence with <s> context and </s> end.
  double SentenceScore(const std::string& sentence,
                       bool add_sentence_markers = true) const {
    std::vector<std::string> words = split_ws(sentence);
    std::vector<std::string> ctx;
    if (add_sentence_markers) ctx.push_back("<s>");
    double total = 0.0;
    for (const auto& w : words) {
      total += WordScore(ctx, w);
      ctx.push_back(w);
    }
    if (add_sentence_markers) total += WordScore(ctx, "</s>");
    return total;
  }

  // KenLM Model.perplexity: 10^(-score / (len(words)+1))
  double Perplexity(const std::string& sentence) const {
    std::vector<std::string> words = split_ws(sentence);
    double score = SentenceScore(sentence, true);
    size_t denom = words.size() + 1;
    if (denom == 0) denom = 1;
    return std::pow(10.0, -score / static_cast<double>(denom));
  }
};

class ArpaLM : public NgramModelBase {
 public:
  bool Load(const std::string& path) {
    std::ifstream f(path);
    if (!f.is_open()) return false;
    std::string line;
    int cur_order = 0;
    bool in_data = false;
    while (std::getline(f, line)) {
      // trim CR
      while (!line.empty() && (line.back() == '\r' || line.back() == '\n'))
        line.pop_back();
      if (line == "\\data\\") {
        in_data = true;
        continue;
      }
      if (line.rfind("ngram ", 0) == 0) continue;
      if (line.size() > 1 && line[0] == '\\') {
        if (line == "\\end\\") break;
        // "\N-grams:"
        size_t dash = line.find("-grams:");
        if (dash != std::string::npos) {
          cur_order = std::stoi(line.substr(1, dash - 1));
          if (cur_order > max_order_) max_order_ = cur_order;
        }
        continue;
      }
      if (!in_data || cur_order == 0 || line.empty()) continue;
      // prob \t w1 w2 ... \t backoff?
      std::istringstream iss(line);
      double prob;
      if (!(iss >> prob)) continue;
      std::vector<std::string> words(cur_order);
      for (int i = 0; i < cur_order; ++i) {
        if (!(iss >> words[i])) { words.clear(); break; }
      }
      if (words.empty()) continue;
      double backoff = 0.0;
      bool has_backoff = static_cast<bool>(iss >> backoff);
      std::string key = Join(words);
      probs_[key] = prob;
      if (has_backoff) backoffs_[key] = backoff;
    }
    return max_order_ > 0;
  }

  int order() const override { return max_order_; }

  double WordScore(const std::vector<std::string>& context,
                   const std::string& word) const override {
    // use at most order-1 context words
    std::vector<std::string> ctx = context;
    int keep = std::min<int>(ctx.size(), max_order_ - 1);
    ctx.assign(ctx.end() - keep, ctx.end());
    // KenLM semantics: every token without a unigram entry IS <unk>, so
    // n-grams and backoff weights involving <unk> participate (the
    // binary loaders resolve OOV to word id 0 the same way)
    if (probs_.count("<unk>")) {
      for (auto& w : ctx)
        if (!probs_.count(w)) w = "<unk>";
      if (!probs_.count(word)) return ScoreBackoff(ctx, "<unk>");
    }
    return ScoreBackoff(ctx, word);
  }

 private:
  static std::string Join(const std::vector<std::string>& words) {
    std::string out;
    for (size_t i = 0; i < words.size(); ++i) {
      if (i) out.push_back(' ');
      out += words[i];
    }
    return out;
  }

  double ScoreBackoff(std::vector<std::string> ctx,
                      const std::string& word) const {
    double total = 0.0;
    for (;;) {  // iterative context shortening, accumulating backoffs
      std::vector<std::string> full = ctx;
      full.push_back(word);
      auto it = probs_.find(Join(full));
      if (it != probs_.end()) return total + it->second;
      if (ctx.empty()) {
        // unknown unigram → <unk> if present, else hard penalty
        auto unk = probs_.find("<unk>");
        return total + (unk != probs_.end() ? unk->second : kOovPenalty);
      }
      auto bit = backoffs_.find(Join(ctx));
      if (bit != backoffs_.end()) total += bit->second;
      ctx.erase(ctx.begin());
    }
  }

  std::unordered_map<std::string, double> probs_;
  std::unordered_map<std::string, double> backoffs_;
  int max_order_ = 0;
};

// ---------------------------------------------------------------------------
// KenLM binary (probing format) read-only model
// ---------------------------------------------------------------------------

// MurmurHash64A (Austin Appleby, public domain), seed 0 — the word hash of
// the probing vocabulary on 64-bit hosts.
uint64_t Murmur64A(const void* key, size_t len, uint64_t seed = 0) {
  const uint64_t m = 0xc6a4a7935bd1e995ULL;
  const int r = 47;
  uint64_t h = seed ^ (len * m);
  const unsigned char* data = static_cast<const unsigned char*>(key);
  const unsigned char* end = data + (len & ~size_t(7));
  while (data != end) {
    uint64_t k;
    std::memcpy(&k, data, 8);
    data += 8;
    k *= m;
    k ^= k >> r;
    k *= m;
    h ^= k;
    h *= m;
  }
  switch (len & 7) {
    case 7: h ^= uint64_t(data[6]) << 48; [[fallthrough]];
    case 6: h ^= uint64_t(data[5]) << 40; [[fallthrough]];
    case 5: h ^= uint64_t(data[4]) << 32; [[fallthrough]];
    case 4: h ^= uint64_t(data[3]) << 24; [[fallthrough]];
    case 3: h ^= uint64_t(data[2]) << 16; [[fallthrough]];
    case 2: h ^= uint64_t(data[1]) << 8; [[fallthrough]];
    case 1: h ^= uint64_t(data[0]); h *= m;
  }
  h ^= h >> r;
  h *= m;
  h ^= h >> r;
  return h;
}

// n-gram key: hash chain over word ids in REVERSE order (predicted word
// first), per the probing search's CombineWordHash.
inline uint64_t CombineWordHash(uint64_t current, uint32_t next) {
  return (current * 8978948897894561157ULL) ^
         (static_cast<uint64_t>(1 + next) * 17894857484156487943ULL);
}

// float log10-probs store an "extend left" flag in the sign bit; the true
// value always has the sign bit SET (log-probs are <= 0).
inline float ForceNegative(float f) {
  uint32_t u;
  std::memcpy(&u, &f, 4);
  u |= 0x80000000u;
  std::memcpy(&f, &u, 4);
  return f;
}

class ProbingKenLM : public NgramModelBase {
 public:
  // Returns true on success; on a recognized-but-unsupported binary,
  // fills `error` and returns false.
  bool Load(const std::string& path, std::string* error) {
    std::ifstream f(path, std::ios::binary | std::ios::ate);
    if (!f.is_open()) return false;
    const std::streamsize fsize = f.tellg();
    if (fsize < 128) return false;
    // one read straight into the final buffer (no iterator realloc churn)
    data_.resize(static_cast<size_t>(fsize));
    f.seekg(0);
    if (!f.read(data_.data(), fsize)) return false;
    static const char kMagic[] =
        "mmap lm http://kheafield.com/code format version 5\n";
    const size_t magic_len = sizeof(kMagic) - 1;
    if (std::memcmp(data_.data(), kMagic, magic_len) != 0)
      return false;  // not a KenLM v5 binary — caller may try ARPA
    // Header: Sanity (88 B: magic padded to 56, 3 floats, 3 uint32, 1
    // uint64) then FixedWidthParameters then uint64 counts[order].
    const size_t kSanity = 88, kFixed = 20;
    unsigned char order = data_[kSanity];
    if (order < 1 || order > 16 ||
        data_.size() < kSanity + kFixed + 8ull * order) {
      if (error) *error = "corrupt KenLM binary: bad order/truncated header";
      return false;
    }
    float multiplier;
    int32_t model_type;
    std::memcpy(&multiplier, data_.data() + kSanity + 4, 4);
    std::memcpy(&model_type, data_.data() + kSanity + 8, 4);
    if (model_type != 0) {  // 0=PROBING; 1=REST_PROBING; 2..5 trie family
      if (model_type >= 2 && model_type <= 5)
        return false;  // trie family: handled by TrieKenLM
      if (error)
        *error = "unsupported KenLM binary type " +
                 std::to_string(model_type) +
                 " (probing and the trie family are supported; rebuild "
                 "with build_binary, or use the text ARPA)";
      return false;
    }
    order_ = order;
    counts_.resize(order_);
    std::memcpy(counts_.data(), data_.data() + kSanity + kFixed,
                8 * order_);
    size_t off = Align8(kSanity + kFixed + 8 * order_);

    // vocabulary: 8-byte header {version, bound} + probing table of
    // {uint64 hash, uint32 word_id} packed to 12 bytes
    off += 8;
    vocab_buckets_ = Buckets(counts_[0], multiplier);
    vocab_ = data_.data() + off;
    off += vocab_buckets_ * 12;

    // unigrams: (counts[0]+1) × {float prob, float backoff}
    unigram_ = data_.data() + off;
    off += (counts_[0] + 1) * 8;

    // middle orders 2..order-1: probing tables of {uint64, prob, backoff}
    for (int n = 2; n < order_; ++n) {
      uint64_t b = Buckets(counts_[n - 1], multiplier);
      middle_.push_back({data_.data() + off, b});
      off += b * 16;
    }
    // longest order: {uint64, prob} packed to 12 bytes
    longest_buckets_ = Buckets(counts_[order_ - 1], multiplier);
    longest_ = data_.data() + off;
    off += longest_buckets_ * 12;
    if (off > data_.size()) {
      if (error) *error = "KenLM binary truncated";
      return false;
    }
    return true;
  }

  int order() const override { return order_; }

  double WordScore(const std::vector<std::string>& context,
                   const std::string& word) const override {
    std::vector<uint32_t> ctx;
    size_t keep =
        std::min(context.size(), static_cast<size_t>(order_ - 1));
    for (size_t i = context.size() - keep; i < context.size(); ++i)
      ctx.push_back(WordId(context[i]));
    return ScoreBackoff(ctx, WordId(word));
  }

 private:
  static size_t Align8(size_t x) { return (x + 7) / 8 * 8; }

  static uint64_t Buckets(uint64_t entries, float multiplier) {
    uint64_t by_mult = static_cast<uint64_t>(
        multiplier * static_cast<float>(entries));
    return std::max(entries + 1, by_mult);
  }

  uint32_t WordId(const std::string& w) const {
    uint64_t h = Murmur64A(w.data(), w.size());
    uint64_t idx = h % vocab_buckets_;
    for (;;) {
      const char* e = vocab_ + idx * 12;
      uint64_t key;
      std::memcpy(&key, e, 8);
      if (key == h) {
        uint32_t id;
        std::memcpy(&id, e + 8, 4);
        return id;
      }
      if (key == 0) return 0;  // <unk>
      idx = (idx + 1) % vocab_buckets_;
    }
  }

  // n-gram (ids in natural order) → probing key
  static uint64_t KeyFor(const uint32_t* ids, size_t n) {
    uint64_t key = ids[n - 1];
    for (size_t i = n - 1; i-- > 0;) key = CombineWordHash(key, ids[i]);
    return key;
  }

  bool FindMiddle(size_t n, uint64_t key, float* prob,
                  float* backoff) const {
    const auto& t = middle_[n - 2];
    uint64_t idx = key % t.buckets;
    for (;;) {
      const char* e = t.base + idx * 16;
      uint64_t k;
      std::memcpy(&k, e, 8);
      if (k == key) {
        std::memcpy(prob, e + 8, 4);
        std::memcpy(backoff, e + 12, 4);
        *prob = ForceNegative(*prob);
        return true;
      }
      if (k == 0) return false;
      idx = (idx + 1) % t.buckets;
    }
  }

  bool FindLongest(uint64_t key, float* prob) const {
    uint64_t idx = key % longest_buckets_;
    for (;;) {
      const char* e = longest_ + idx * 12;
      uint64_t k;
      std::memcpy(&k, e, 8);
      if (k == key) {
        std::memcpy(prob, e + 8, 4);
        return true;  // longest entries always carry the sign bit already
      }
      if (k == 0) return false;
      idx = (idx + 1) % longest_buckets_;
    }
  }

  void Unigram(uint32_t id, float* prob, float* backoff) const {
    const char* e = unigram_ + static_cast<size_t>(id) * 8;
    std::memcpy(prob, e, 4);
    std::memcpy(backoff, e + 4, 4);
    *prob = ForceNegative(*prob);
  }

  // backoff weight of the context n-gram (0 when absent)
  double BackoffOf(const std::vector<uint32_t>& ctx, size_t start) const {
    size_t n = ctx.size() - start;
    float prob, backoff;
    if (n == 1) {
      Unigram(ctx[start], &prob, &backoff);
      return backoff;
    }
    if (FindMiddle(n, KeyFor(ctx.data() + start, n), &prob, &backoff))
      return backoff;
    return 0.0;
  }

  double ScoreBackoff(std::vector<uint32_t> ctx, uint32_t wid) const {
    double total = 0.0;
    size_t start = 0;
    for (;;) {
      size_t n = ctx.size() - start + 1;
      float prob, backoff;
      bool found;
      if (n == 1) {
        Unigram(wid, &prob, &backoff);
        return total + prob;
      }
      std::vector<uint32_t> gram(ctx.begin() + start, ctx.end());
      gram.push_back(wid);
      if (n == static_cast<size_t>(order_))
        found = FindLongest(KeyFor(gram.data(), n), &prob);
      else
        found = FindMiddle(n, KeyFor(gram.data(), n), &prob, &backoff);
      if (found) return total + prob;
      total += BackoffOf(ctx, start);
      ++start;  // shorten context from the far end
    }
  }

  struct Table {
    const char* base;
    uint64_t buckets;
  };

  std::vector<char> data_;
  int order_ = 0;
  std::vector<uint64_t> counts_;
  const char* vocab_ = nullptr;
  uint64_t vocab_buckets_ = 0;
  const char* unigram_ = nullptr;
  std::vector<Table> middle_;
  const char* longest_ = nullptr;
  uint64_t longest_buckets_ = 0;
};

// ---------------------------------------------------------------------------
// KenLM binary (trie family) read-only model — model types 2..5:
// TRIE, QUANT_TRIE (-q), ARRAY_TRIE (-a), QUANT_ARRAY_TRIE (-q -a).
// Layout re-derived from the published format (reverse trie of bit-packed
// sorted arrays; sorted-hash vocabulary; optional Federico-Bertoldi bin
// quantization of prob/backoff; optional Bhiksha-Raj compressed next
// pointers).  Parity vs the upstream query tool is pinned by
// tests/data/tiny_trie.klm / tiny_qtrie.klm / tiny_atrie.klm /
// tiny_qatrie.klm golden scores (the reference loads such artifacts via
// kenlm.Model, lid/test.py:58-60).
// ---------------------------------------------------------------------------

inline uint8_t RequiredBits(uint64_t max_value) {
  if (!max_value) return 0;
  uint8_t ret = 1;
  while (max_value >>= 1) ++ret;
  return ret;
}

class TrieKenLM : public NgramModelBase {
 public:
  bool Load(const std::string& path, std::string* error) {
    std::ifstream f(path, std::ios::binary | std::ios::ate);
    if (!f.is_open()) return false;
    const std::streamsize fsize = f.tellg();
    if (fsize < 128) return false;
    const size_t size = static_cast<size_t>(fsize);
    // 8-byte aligned backing store (bit-packed reads load whole uint64s),
    // filled by ONE read — no raw intermediate holding 2x the file
    data_.assign((size + 15) / 8, 0);
    f.seekg(0);
    if (!f.read(reinterpret_cast<char*>(data_.data()), fsize)) return false;
    const char* d = base();
    static const char kMagic[] =
        "mmap lm http://kheafield.com/code format version 5\n";
    if (std::memcmp(d, kMagic, sizeof(kMagic) - 1) != 0)
      return false;
    const size_t kSanity = 88, kFixed = 20;
    unsigned char order = d[kSanity];
    if (order < 1 || order > 16 ||
        size < kSanity + kFixed + 8ull * order) {
      if (error) *error = "corrupt KenLM binary: bad order/truncated header";
      return false;
    }
    int32_t model_type;
    std::memcpy(&model_type, d + kSanity + 8, 4);
    if (model_type < 2 || model_type > 5) return false;  // not trie family
    quant_ = (model_type - 2) & 1;
    bhiksha_ = ((model_type - 2) & 2) != 0;
    order_ = order;
    counts_.resize(order_);
    std::memcpy(counts_.data(), d + kSanity + kFixed, 8 * order_);
    size_t off = Align8(kSanity + kFixed + 8 * order_);

    // sorted-hash vocabulary: uint64 count then that many sorted
    // murmur64a(word) hashes; id = index+1 (<unk> = 0, not stored)
    std::memcpy(&vocab_count_, d + off, 8);
    vocab_hashes_ = reinterpret_cast<const uint64_t*>(d + off + 8);
    // region reserved for counts_[0] hashes regardless of <unk> presence
    off += 8 + 8 * counts_[0];

    // quantization tables (-q): 8-byte header {version, prob_bits,
    // backoff_bits}, then per middle order a prob table (2^p floats) and
    // a backoff table (2^b floats), then the longest-order prob table
    if (quant_) {
      uint8_t version = static_cast<uint8_t>(d[off]);
      prob_bits_ = static_cast<uint8_t>(d[off + 1]);
      backoff_bits_ = static_cast<uint8_t>(d[off + 2]);
      if (version != 2) {
        if (error)
          *error = "unsupported KenLM quantization version " +
                   std::to_string(version);
        return false;
      }
      const float* t = reinterpret_cast<const float*>(d + off + 8);
      for (int m = 0; m < order_ - 2; ++m) {
        mid_prob_table_.push_back(t);
        t += uint64_t(1) << prob_bits_;
        mid_backoff_table_.push_back(t);
        t += uint64_t(1) << backoff_bits_;
      }
      longest_table_ = t;
      off += 8 + 4 * ((order_ - 2) *
                      ((uint64_t(1) << prob_bits_) +
                       (uint64_t(1) << backoff_bits_)) +
                      (uint64_t(1) << prob_bits_));
    }

    // unigrams: (counts[0]+2) × {float prob, float backoff, uint64 next}
    unigram_ = d + off;
    off += (counts_[0] + 2) * 16;

    // middle orders n = 2..order-1: [bhiksha offsets][bit-packed entries]
    const uint8_t word_bits = RequiredBits(counts_[0]);
    for (int n = 2; n < order_; ++n) {
      Middle mid;
      mid.entries = counts_[n - 1];
      const uint64_t max_next = counts_[n];
      const uint8_t quant_bits = quant_ ? prob_bits_ + backoff_bits_ : 63;
      if (bhiksha_) {
        uint8_t bversion = static_cast<uint8_t>(d[off]);
        uint8_t configured_bits = static_cast<uint8_t>(d[off + 1]);
        if (bversion != 0) {
          if (error)
            *error = "unsupported KenLM bhiksha version " +
                     std::to_string(bversion);
          return false;
        }
        const uint64_t max_offset = mid.entries + 1;
        const uint8_t chop = ChopBits(max_offset, max_next, configured_bits);
        mid.next_bits = RequiredBits(max_next) - chop;
        const uint64_t array_count =
            (max_next >> (RequiredBits(max_next) - chop)) + 1;
        const size_t bhiksha_size = 8 * (1 + array_count) + 7;
        mid.offsets = reinterpret_cast<const uint64_t*>(
                          d + Align8(off)) + 1;  // skip 8-byte header
        mid.n_offsets = array_count;
        off += bhiksha_size;
      } else {
        mid.next_bits = RequiredBits(max_next);
      }
      mid.word_bits = word_bits;
      mid.quant_bits = quant_bits;
      mid.total_bits = word_bits + quant_bits + mid.next_bits;
      mid.bits = reinterpret_cast<const uint8_t*>(d + off);
      off += ((1 + mid.entries) * mid.total_bits + 7) / 8 + 8;
      middle_.push_back(mid);
    }

    // longest order: word + prob (raw 31-bit or quantized index)
    longest_quant_bits_ = quant_ ? prob_bits_ : 31;
    longest_total_bits_ = word_bits + longest_quant_bits_;
    longest_word_bits_ = word_bits;
    longest_bits_ = reinterpret_cast<const uint8_t*>(d + off);
    off += ((1 + counts_[order_ - 1]) * longest_total_bits_ + 7) / 8 + 8;
    if (off > size + 8) {  // +8: trailing guard bytes may exceed file len
      if (error) *error = "KenLM trie binary truncated";
      return false;
    }
    return true;
  }

  int order() const override { return order_; }

  double WordScore(const std::vector<std::string>& context,
                   const std::string& word) const override {
    std::vector<uint32_t> ctx;
    size_t keep =
        std::min(context.size(), static_cast<size_t>(order_ - 1));
    for (size_t i = context.size() - keep; i < context.size(); ++i)
      ctx.push_back(WordId(context[i]));
    const uint32_t wid = WordId(word);

    // walk 1: longest match of (ctx suffix + word), reversed extension
    float prob, backoff;
    UnigramAt(wid, &prob, &backoff);
    double best_prob = prob;
    size_t matched_ctx = 0;  // context words of the longest found n-gram
    Range range = UnigramRange(wid);
    for (size_t m = 1; m <= ctx.size(); ++m) {
      if (range.begin >= range.end) break;
      const uint32_t cw = ctx[ctx.size() - m];
      float p;
      if (m + 1 < static_cast<size_t>(order_)) {
        if (!FindMiddle(m - 1, cw, &p, &backoff, &range)) break;
      } else {
        if (!FindLongest(cw, range, &p)) break;
        best_prob = p;
        matched_ctx = m;
        break;
      }
      best_prob = p;
      matched_ctx = m;
    }

    // walk 2: backoff weights of context suffixes longer than the match
    double total = best_prob;
    if (matched_ctx < ctx.size() && !ctx.empty()) {
      float bo;
      UnigramAt(ctx.back(), &prob, &bo);
      if (matched_ctx < 1) total += bo;
      Range brange = UnigramRange(ctx.back());
      for (size_t m = 2; m <= ctx.size(); ++m) {
        if (brange.begin >= brange.end) break;
        const uint32_t cw = ctx[ctx.size() - m];
        float p;
        if (!FindMiddle(m - 2, cw, &p, &bo, &brange)) break;
        if (matched_ctx < m) total += bo;
      }
    }
    return total;
  }

 private:
  struct Range {
    uint64_t begin, end;
  };
  struct Middle {
    const uint8_t* bits = nullptr;
    const uint64_t* offsets = nullptr;  // bhiksha chopped high bits
    uint64_t n_offsets = 0;
    uint64_t entries = 0;
    uint8_t word_bits = 0, quant_bits = 0, next_bits = 0, total_bits = 0;
  };

  const char* base() const {
    return reinterpret_cast<const char*>(data_.data());
  }
  static size_t Align8(size_t x) { return (x + 7) / 8 * 8; }

  // argmin over chopped high bits of the next-pointer (Bhiksha-Raj):
  // table cost vs inline-bit savings, replicated from the format's sizing
  static uint8_t ChopBits(uint64_t max_offset, uint64_t max_next,
                          uint8_t configured_bits) {
    const uint8_t required = RequiredBits(max_next);
    uint8_t best_chop = 0;
    int64_t lowest = std::numeric_limits<int64_t>::max();
    for (uint8_t chop = 0;
         chop <= std::min(required, configured_bits); ++chop) {
      int64_t change =
          static_cast<int64_t>(max_next >> (required - chop)) * 64 -
          static_cast<int64_t>(max_offset) * chop;
      if (change < lowest) {
        lowest = change;
        best_chop = chop;
      }
    }
    return best_chop;
  }

  // little-endian bit-packed reads (64-bit window, buffer is padded)
  static uint64_t ReadBits(const uint8_t* b, uint64_t bit_off,
                           uint8_t length) {
    uint64_t window;
    std::memcpy(&window, b + (bit_off >> 3), 8);
    const uint64_t mask =
        length >= 64 ? ~uint64_t(0) : ((uint64_t(1) << length) - 1);
    return (window >> (bit_off & 7)) & mask;
  }
  static float ReadFloat32At(const uint8_t* b, uint64_t bit_off) {
    uint32_t u = static_cast<uint32_t>(ReadBits(b, bit_off, 32));
    float f;
    std::memcpy(&f, &u, 4);
    return f;
  }
  static float ReadNonPositiveFloat31(const uint8_t* b, uint64_t bit_off) {
    uint32_t u = static_cast<uint32_t>(ReadBits(b, bit_off, 31));
    u |= 0x80000000u;  // sign bit implicit: log-probs are <= 0
    float f;
    std::memcpy(&f, &u, 4);
    return f;
  }

  uint32_t WordId(const std::string& w) const {
    const uint64_t h = Murmur64A(w.data(), w.size());
    const uint64_t* lo = vocab_hashes_;
    const uint64_t* hi = vocab_hashes_ + vocab_count_;
    const uint64_t* it = std::lower_bound(lo, hi, h);
    if (it != hi && *it == h)
      return static_cast<uint32_t>(it - lo) + 1;  // +1: <unk> is 0
    return 0;
  }

  void UnigramAt(uint32_t id, float* prob, float* backoff) const {
    const char* e = unigram_ + static_cast<size_t>(id) * 16;
    std::memcpy(prob, e, 4);
    std::memcpy(backoff, e + 4, 4);
  }
  Range UnigramRange(uint32_t id) const {
    Range r;
    std::memcpy(&r.begin, unigram_ + static_cast<size_t>(id) * 16 + 8, 8);
    std::memcpy(&r.end,
                unigram_ + (static_cast<size_t>(id) + 1) * 16 + 8, 8);
    return r;
  }

  // binary search for `word` among entries [range.begin, range.end) of a
  // bit-packed array whose word ids are sorted ascending
  static bool FindEntry(const uint8_t* bits, uint8_t total_bits,
                        uint8_t word_bits, Range range, uint32_t word,
                        uint64_t* at) {
    uint64_t lo = range.begin, hi = range.end;
    while (lo < hi) {
      const uint64_t mid = lo + (hi - lo) / 2;
      const uint64_t w = ReadBits(bits, mid * total_bits, word_bits);
      if (w == word) {
        *at = mid;
        return true;
      }
      if (w < word)
        lo = mid + 1;
      else
        hi = mid;
    }
    return false;
  }

  // next-pointer range of entry `idx` (inline bits, bhiksha-extended)
  Range NextRange(const Middle& m, uint64_t idx) const {
    const uint64_t field = idx * m.total_bits + m.word_bits + m.quant_bits;
    Range r;
    const uint64_t lo_begin = ReadBits(m.bits, field, m.next_bits);
    const uint64_t lo_end =
        ReadBits(m.bits, field + m.total_bits, m.next_bits);
    if (!m.offsets) {
      r.begin = lo_begin;
      r.end = lo_end;
      return r;
    }
    const uint64_t* ob = m.offsets;
    const uint64_t* oe = m.offsets + m.n_offsets;
    const uint64_t* begin_it = std::upper_bound(ob, oe, idx) - 1;
    const uint64_t* end_it;
    for (end_it = begin_it + 1; end_it < oe && *end_it <= idx + 1; ++end_it) {
    }
    --end_it;
    r.begin = (static_cast<uint64_t>(begin_it - ob) << m.next_bits) | lo_begin;
    r.end = (static_cast<uint64_t>(end_it - ob) << m.next_bits) | lo_end;
    return r;
  }

  // find `word` in middle table m (order m+2); updates *range to children
  bool FindMiddle(size_t mi, uint32_t word, float* prob, float* backoff,
                  Range* range) const {
    const Middle& m = middle_[mi];
    uint64_t idx;
    if (!FindEntry(m.bits, m.total_bits, m.word_bits, *range, word, &idx))
      return false;
    const uint64_t voff = idx * m.total_bits + m.word_bits;
    if (quant_) {
      const uint64_t bo_idx = ReadBits(m.bits, voff, backoff_bits_);
      const uint64_t p_idx =
          ReadBits(m.bits, voff + backoff_bits_, prob_bits_);
      *prob = mid_prob_table_[mi][p_idx];
      *backoff = mid_backoff_table_[mi][bo_idx];
    } else {
      *prob = ReadNonPositiveFloat31(m.bits, voff);
      *backoff = ReadFloat32At(m.bits, voff + 31);
    }
    *range = NextRange(m, idx);
    return true;
  }

  bool FindLongest(uint32_t word, Range range, float* prob) const {
    uint64_t idx;
    if (!FindEntry(longest_bits_, longest_total_bits_, longest_word_bits_,
                   range, word, &idx))
      return false;
    const uint64_t voff = idx * longest_total_bits_ + longest_word_bits_;
    if (quant_)
      *prob = longest_table_[ReadBits(longest_bits_, voff, prob_bits_)];
    else
      *prob = ReadNonPositiveFloat31(longest_bits_, voff);
    return true;
  }

  std::vector<uint64_t> data_;  // uint64 for 8-byte alignment
  int order_ = 0;
  bool quant_ = false, bhiksha_ = false;
  uint8_t prob_bits_ = 0, backoff_bits_ = 0;
  std::vector<uint64_t> counts_;
  uint64_t vocab_count_ = 0;
  const uint64_t* vocab_hashes_ = nullptr;
  const char* unigram_ = nullptr;
  std::vector<Middle> middle_;
  std::vector<const float*> mid_prob_table_, mid_backoff_table_;
  const float* longest_table_ = nullptr;
  const uint8_t* longest_bits_ = nullptr;
  uint8_t longest_word_bits_ = 0, longest_quant_bits_ = 0,
          longest_total_bits_ = 0;
};

// ---------------------------------------------------------------------------
// Scorer (word-level LM fusion, OpenSeq2Seq semantics)
// ---------------------------------------------------------------------------

struct Scorer {
  double alpha = 0.0;
  double beta = 0.0;
  std::shared_ptr<NgramModelBase> lm;

  // score of the last word of `prefix_words` given the preceding ones;
  // an empty last word (consecutive spaces) scores as unknown
  double WordBonus(const std::vector<std::string>& words) const {
    if (!lm || words.empty()) return beta;
    std::vector<std::string> ctx(words.begin(), words.end() - 1);
    ctx.insert(ctx.begin(), "<s>");
    double lp = lm->WordScore(ctx, words.back());
    return alpha * lp + beta;
  }
};

// ---------------------------------------------------------------------------
// CTC prefix beam search
// ---------------------------------------------------------------------------

struct BeamEntry {
  double pb = kLogZero;   // ends in blank (log10)
  double pnb = kLogZero;  // ends in non-blank
  double lm_score = 0.0;  // accumulated LM fusion (log10)
  double Total() const { return log_sum_exp10(pb, pnb) + lm_score; }
};

struct DecodeParams {
  int beam_size = 100;
  double cutoff_prob = 1.0;
  int cutoff_top_n = 40;
  int blank_id = -1;  // -1 → V-1 (blank-last convention)
  int space_id = -2;  // resolved from vocab
};

using Prefix = std::vector<int>;

struct PrefixHash {
  size_t operator()(const Prefix& p) const {
    size_t h = 1469598103934665603ull;
    for (int v : p) {
      h ^= static_cast<size_t>(v) + 0x9e3779b97f4a7c15ull;
      h *= 1099511628211ull;
    }
    return h;
  }
};

std::string PrefixToText(const Prefix& p,
                         const std::vector<std::string>& vocab) {
  std::string out;
  for (int id : p)
    if (id >= 0 && id < static_cast<int>(vocab.size())) out += vocab[id];
  return out;
}

std::vector<std::string> PrefixWords(const Prefix& p,
                                     const std::vector<std::string>& vocab) {
  return split_ws(PrefixToText(p, vocab));
}

// Words to hand Scorer::WordBonus when a SPACE extends `prefix`: the word
// completed by the space is the prefix's trailing non-space run.  A prefix
// that is empty or already ends in space completes an EMPTY word, which is
// scored as unknown (upstream scorer semantics) — re-scoring the previous
// word here used to hand consecutive-space hypotheses an unbounded free
// alpha*logP+beta boost per extra space.
std::vector<std::string> SpaceBonusWords(
    const Prefix& prefix, const std::vector<std::string>& vocab,
    int space_id) {
  std::vector<std::string> words = PrefixWords(prefix, vocab);
  if (prefix.empty() || prefix.back() == space_id) words.push_back("");
  return words;
}

// one utterance: probs (T, V) softmax probabilities
std::vector<std::pair<std::string, double>> DecodeOne(
    const float* probs, int T, int V, const std::vector<std::string>& vocab,
    const DecodeParams& prm, const Scorer* scorer) {
  int blank = prm.blank_id < 0 ? V - 1 : prm.blank_id;
  std::unordered_map<Prefix, BeamEntry, PrefixHash> beams;
  beams[{}].pb = 0.0;  // log10(1)

  std::vector<std::pair<double, int>> frame(V);
  for (int t = 0; t < T; ++t) {
    const float* row = probs + static_cast<size_t>(t) * V;
    // cutoff pruning: top-n by prob, then cumulative cutoff_prob
    for (int v = 0; v < V; ++v) frame[v] = {row[v], v};
    int keep = std::min(prm.cutoff_top_n, V);
    std::partial_sort(frame.begin(), frame.begin() + keep, frame.end(),
                      [](auto& a, auto& b) { return a.first > b.first; });
    double cum = 0.0;
    int used = 0;
    for (; used < keep; ++used) {
      cum += frame[used].first;
      if (cum >= prm.cutoff_prob) { ++used; break; }
    }

    std::unordered_map<Prefix, BeamEntry, PrefixHash> next;
    next.reserve(beams.size() * 4);
    for (int i = 0; i < used; ++i) {
      double p = frame[i].first;
      if (p <= 0.0f) continue;
      double lp = std::log10(p);
      int s = frame[i].second;
      for (const auto& [prefix, entry] : beams) {
        int last = prefix.empty() ? -1 : prefix.back();
        if (s == blank) {
          auto& ne = next[prefix];
          ne.lm_score = entry.lm_score;
          double add = log_sum_exp10(entry.pb, entry.pnb) + lp;
          ne.pb = log_sum_exp10(ne.pb, add);
        } else if (s == last) {
          {  // repeat collapses into the same prefix
            auto& ne = next[prefix];
            ne.lm_score = entry.lm_score;
            ne.pnb = log_sum_exp10(ne.pnb, entry.pnb + lp);
          }
          {  // ...or extends after a blank
            Prefix ext = prefix;
            ext.push_back(s);
            auto& ne = next[ext];
            if (ne.pb == kLogZero && ne.pnb == kLogZero) {
              ne.lm_score = entry.lm_score;
              if (scorer && s == prm.space_id)
                ne.lm_score += scorer->WordBonus(
                    SpaceBonusWords(prefix, vocab, prm.space_id));
            }
            ne.pnb = log_sum_exp10(ne.pnb, entry.pb + lp);
          }
        } else {
          Prefix ext = prefix;
          ext.push_back(s);
          auto& ne = next[ext];
          if (ne.pb == kLogZero && ne.pnb == kLogZero) {
            ne.lm_score = entry.lm_score;
            if (scorer && s == prm.space_id)
              ne.lm_score += scorer->WordBonus(
                  SpaceBonusWords(prefix, vocab, prm.space_id));
          }
          ne.pnb = log_sum_exp10(
              ne.pnb, log_sum_exp10(entry.pb, entry.pnb) + lp);
        }
      }
    }
    // second prune: keep top beam_size by total score
    std::vector<std::pair<double, const Prefix*>> ranked;
    ranked.reserve(next.size());
    for (auto& [prefix, e] : next) ranked.push_back({e.Total(), &prefix});
    int k = std::min<int>(prm.beam_size, ranked.size());
    std::partial_sort(ranked.begin(), ranked.begin() + k, ranked.end(),
                      [](auto& a, auto& b) { return a.first > b.first; });
    std::unordered_map<Prefix, BeamEntry, PrefixHash> pruned;
    pruned.reserve(k);
    for (int i = 0; i < k; ++i) pruned[*ranked[i].second] = next[*ranked[i].second];
    beams.swap(pruned);
  }

  // final: score trailing word at end of utterance (OpenSeq2Seq behavior)
  std::vector<std::pair<std::string, double>> results;
  results.reserve(beams.size());
  for (auto& [prefix, e] : beams) {
    double total = e.Total();
    if (scorer && !prefix.empty() && prefix.back() != prm.space_id) {
      auto words = PrefixWords(prefix, vocab);
      if (!words.empty()) total += scorer->WordBonus(words);
    }
    results.push_back({PrefixToText(prefix, vocab), total});
  }
  std::sort(results.begin(), results.end(),
            [](auto& a, auto& b) { return a.second > b.second; });
  return results;
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

extern "C" {

namespace {
std::string g_ngram_error;  // last load failure detail (main thread only)

// Read just the 128-byte header: KenLM v5 model_type (0=probing,
// 1=rest-probing, 2..5=trie family) or -1 when not a KenLM binary.
// Avoids slurping a multi-GB file once per candidate loader.
int SniffKenLMType(const char* path) {
  std::ifstream f(path, std::ios::binary);
  if (!f.is_open()) return -1;
  char hdr[128];
  f.read(hdr, sizeof(hdr));
  if (f.gcount() < static_cast<std::streamsize>(sizeof(hdr))) return -1;
  static const char kMagic[] =
      "mmap lm http://kheafield.com/code format version 5\n";
  if (std::memcmp(hdr, kMagic, sizeof(kMagic) - 1) != 0) return -1;
  int32_t model_type;
  std::memcpy(&model_type, hdr + 88 + 8, 4);
  return model_type;
}
}

void* ngram_load(const char* path) try {
  g_ngram_error.clear();
  // header sniff dispatches to exactly one loader (a big file is read
  // once); anything that isn't a KenLM v5 binary falls back to text ARPA
  const int model_type = SniffKenLMType(path);
  if (model_type == 0) {
    auto bin = std::make_unique<ProbingKenLM>();
    std::string err;
    if (bin->Load(path, &err)) return bin.release();
    g_ngram_error = err.empty() ? "corrupt KenLM probing binary" : err;
    return nullptr;
  }
  if (model_type >= 2 && model_type <= 5) {
    auto trie = std::make_unique<TrieKenLM>();
    std::string err;
    if (trie->Load(path, &err)) return trie.release();
    g_ngram_error = err.empty() ? "corrupt KenLM trie binary" : err;
    return nullptr;
  }
  if (model_type != -1) {
    g_ngram_error = "unsupported KenLM binary type " +
                    std::to_string(model_type) +
                    " (probing and the trie family are supported; rebuild "
                    "with build_binary, or use the text ARPA)";
    return nullptr;
  }
  auto* lm = new ArpaLM();
  if (!lm->Load(path)) {
    delete lm;
    return nullptr;
  }
  return lm;
} catch (const std::exception& e) {
  // never let a C++ exception cross the C ABI into ctypes (std::terminate
  // would kill the whole Python process): bad_alloc on a huge file,
  // stoi on a malformed ARPA header, ...
  g_ngram_error = e.what();
  return nullptr;
} catch (...) {
  g_ngram_error = "unknown C++ exception during LM load";
  return nullptr;
}

const char* ngram_last_error() { return g_ngram_error.c_str(); }

void ngram_free(void* lm) { delete static_cast<NgramModelBase*>(lm); }

double ngram_sentence_score(void* lm, const char* sentence) {
  return static_cast<NgramModelBase*>(lm)->SentenceScore(sentence);
}

double ngram_perplexity(void* lm, const char* sentence) {
  return static_cast<NgramModelBase*>(lm)->Perplexity(sentence);
}

int ngram_order(void* lm) { return static_cast<NgramModelBase*>(lm)->order(); }

void* scorer_create(double alpha, double beta, void* lm) {
  auto* s = new Scorer();
  s->alpha = alpha;
  s->beta = beta;
  if (lm)
    s->lm = std::shared_ptr<NgramModelBase>(
        static_cast<NgramModelBase*>(lm),
        [](NgramModelBase*) {});  // non-owning
  return s;
}

void scorer_free(void* s) { delete static_cast<Scorer*>(s); }

// probs: (B, Tmax, V) row-major softmax probabilities.
// out: caller-allocated char buffer of size B*out_stride; texts are
// NUL-terminated per row.  out_scores: (B,) best totals.
int ctc_beam_search_batch(const float* probs, int B, int Tmax, int V,
                          const int* lengths, const char** vocab,
                          int vocab_size, int beam_size, int num_threads,
                          double cutoff_prob, int cutoff_top_n, void* scorer,
                          int blank_id, char* out, int out_stride,
                          double* out_scores) {
  if (vocab_size > V) return -1;
  std::vector<std::string> vocab_s(vocab, vocab + vocab_size);
  DecodeParams prm;
  prm.beam_size = beam_size;
  prm.cutoff_prob = cutoff_prob;
  prm.cutoff_top_n = cutoff_top_n;
  prm.blank_id = blank_id;
  prm.space_id = -2;
  for (int i = 0; i < vocab_size; ++i)
    if (vocab_s[i] == " ") prm.space_id = i;

  const Scorer* sc = static_cast<const Scorer*>(scorer);
  std::vector<std::thread> workers;
  int nthreads = std::max(1, num_threads);

  auto work = [&](int tid) {
    for (int b = tid; b < B; b += nthreads) {
      int T = lengths ? lengths[b] : Tmax;
      if (T > Tmax) T = Tmax;
      auto res =
          DecodeOne(probs + static_cast<size_t>(b) * Tmax * V, T, V,
                    vocab_s, prm, sc && sc->lm ? sc : nullptr);
      const std::string& best = res.empty() ? std::string() : res[0].first;
      char* dst = out + static_cast<size_t>(b) * out_stride;
      int n = std::min<int>(best.size(), out_stride - 1);
      std::memcpy(dst, best.data(), n);
      dst[n] = '\0';
      if (out_scores) out_scores[b] = res.empty() ? kLogZero : res[0].second;
    }
  };
  for (int t = 0; t < nthreads; ++t) workers.emplace_back(work, t);
  for (auto& w : workers) w.join();
  return 0;
}

}  // extern "C"
