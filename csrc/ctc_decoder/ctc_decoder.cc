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
// ARPA n-gram LM
// ---------------------------------------------------------------------------

class ArpaLM {
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

  int order() const { return max_order_; }

  // log10 P(w | context words), with backoff recursion.
  double WordScore(const std::vector<std::string>& context,
                   const std::string& word) const {
    // use at most order-1 context words
    std::vector<std::string> ctx = context;
    int keep = std::min<int>(ctx.size(), max_order_ - 1);
    ctx.assign(ctx.end() - keep, ctx.end());
    return ScoreBackoff(ctx, word);
  }

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
    while (true) {
      std::vector<std::string> full = ctx;
      full.push_back(word);
      auto it = probs_.find(Join(full));
      if (it != probs_.end()) return it->second;
      if (ctx.empty()) {
        // unknown unigram → <unk> if present, else hard penalty
        auto unk = probs_.find("<unk>");
        return unk != probs_.end() ? unk->second : kOovPenalty;
      }
      double bo = 0.0;
      auto bit = backoffs_.find(Join(ctx));
      if (bit != backoffs_.end()) bo = bit->second;
      ctx.erase(ctx.begin());
      // recurse with shorter context + backoff weight
      return bo + ScoreBackoff(ctx, word);
    }
  }

  std::unordered_map<std::string, double> probs_;
  std::unordered_map<std::string, double> backoffs_;
  int max_order_ = 0;
};

// ---------------------------------------------------------------------------
// Scorer (word-level LM fusion, OpenSeq2Seq semantics)
// ---------------------------------------------------------------------------

struct Scorer {
  double alpha = 0.0;
  double beta = 0.0;
  std::shared_ptr<ArpaLM> lm;

  // score of the last word of `prefix_words` given the preceding ones
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
      if (cum >= prm.cutoff_prob && used + 1 >= 1) { ++used; break; }
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
                ne.lm_score += scorer->WordBonus(PrefixWords(prefix, vocab));
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
              ne.lm_score += scorer->WordBonus(PrefixWords(prefix, vocab));
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

void* ngram_load(const char* path) {
  auto* lm = new ArpaLM();
  if (!lm->Load(path)) {
    delete lm;
    return nullptr;
  }
  return lm;
}

void ngram_free(void* lm) { delete static_cast<ArpaLM*>(lm); }

double ngram_sentence_score(void* lm, const char* sentence) {
  return static_cast<ArpaLM*>(lm)->SentenceScore(sentence);
}

double ngram_perplexity(void* lm, const char* sentence) {
  return static_cast<ArpaLM*>(lm)->Perplexity(sentence);
}

int ngram_order(void* lm) { return static_cast<ArpaLM*>(lm)->order(); }

void* scorer_create(double alpha, double beta, void* lm) {
  auto* s = new Scorer();
  s->alpha = alpha;
  s->beta = beta;
  if (lm)
    s->lm = std::shared_ptr<ArpaLM>(static_cast<ArpaLM*>(lm),
                                    [](ArpaLM*) {});  // non-owning
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
  std::mutex err_mutex;
  int err = 0;
  int nthreads = std::max(1, num_threads);
  std::vector<int> items(B);
  for (int i = 0; i < B; ++i) items[i] = i;

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
  return err;
}

}  // extern "C"
