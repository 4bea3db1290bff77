// subgc_native: C++ host-side cores for the subgc_tpu framework.
//
// The reference delegates its text pipeline to vendored Java jars invoked per
// subprocess (PTB tokenizer, METEOR, SPICE; SURVEY.md §2) and runs its
// consensus-reranking pairwise-CIDEr loop in pure Python
// (misc/consensus_reranking/..., hours at scale).  This library provides
// native equivalents exposed through a plain C ABI (loaded via ctypes —
// no pybind11 in this image):
//
//   * subgc_ptb_tokenize   — PTB-style tokenizer (same rules as
//                            subgc_tpu/eval/tokenizer.py)
//   * subgc_pairwise_cider — TF-IDF n-gram pairwise CIDEr similarities
//                            (cider_scorer_compute_sentence.py semantics)
//   * subgc_mutual_bleu4   — mutual BLEU-4 of a sentence set (the mBLEU-4
//                            diversity metric hot loop)
//
// All string batches cross the boundary newline-separated; outputs are
// caller-allocated double buffers or malloc'd strings freed via subgc_free.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// tokenizer
// ---------------------------------------------------------------------------

const char* kPunct[] = {"''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-",
                        "-RCB-", ".", "?", "!", ",", ":", "-", "--", "...",
                        ";"};

bool is_punct_token(const std::string& t) {
  for (const char* p : kPunct)
    if (t == p) return true;
  return false;
}

bool is_digit(char c) { return c >= '0' && c <= '9'; }

void append_tok(std::vector<std::string>* out, std::string t, bool lowercase) {
  if (t.empty()) return;
  // bracket tokens are emitted lowercased already (the jar's -lowerCase
  // output is lowercase, so the wrapper's case-sensitive strip keeps them;
  // see subgc_tpu/eval/tokenizer.py module docstring)
  if (lowercase)
    for (auto& c : t)
      if (c >= 'A' && c <= 'Z') c += 32;
  out->push_back(std::move(t));
}

// contraction suffixes split from the preceding word
bool contraction_split(const std::string& w, size_t* cut) {
  auto ends = [&](const char* suf) {
    size_t n = strlen(suf);
    if (w.size() <= n) return false;
    for (size_t i = 0; i < n; i++) {
      char a = w[w.size() - n + i], b = suf[i];
      if (a >= 'A' && a <= 'Z') a += 32;
      if (a != b) return false;
    }
    // the char before the suffix must not be an apostrophe or space
    char prev = w[w.size() - n - 1];
    if (prev == '\'' || prev == ' ') return false;
    *cut = w.size() - n;
    return true;
  };
  return ends("n't") || ends("'ll") || ends("'re") || ends("'ve") ||
         ends("'s") || ends("'m") || ends("'d");
}

std::vector<std::string> ptb_tokenize_sentence(const std::string& in,
                                               bool lowercase) {
  std::string s;
  s.reserve(in.size() * 2);
  size_t n = in.size();
  // character pass: split punctuation / map brackets / ellipsis / quotes
  for (size_t i = 0; i < n; i++) {
    char c = in[i];
    switch (c) {
      case '\n': s += ' '; break;
      case '(': s += " -lrb- "; break;
      case ')': s += " -rrb- "; break;
      case '[': s += " -lsb- "; break;
      case ']': s += " -rsb- "; break;
      case '{': s += " -lcb- "; break;
      case '}': s += " -rcb- "; break;
      case ';': case '@': case '#': case '$': case '%': case '&':
      case '?': case '!':
        s += ' '; s += c; s += ' ';
        break;
      case '.':
        if (i + 2 < n && in[i + 1] == '.' && in[i + 2] == '.') {
          s += " ... ";
          i += 2;
        } else {
          // split only a sentence-final period (possibly followed by
          // closers), like the sed rule
          size_t j = i + 1;
          while (j < n && (in[j] == '"' || in[j] == '\'' || in[j] == ')' ||
                           in[j] == ']' || in[j] == '}'))
            j++;
          bool final_period = true;
          for (size_t k = j; k < n; k++)
            if (in[k] != ' ' && in[k] != '\n') { final_period = false; break; }
          if (final_period && i > 0 && in[i - 1] != '.') {
            s += " .";
          } else {
            s += '.';
          }
        }
        break;
      case ',':
        if (i > 0 && is_digit(in[i - 1]) && i + 1 < n && is_digit(in[i + 1]))
          s += ',';
        else {
          s += " , ";
        }
        break;
      case ':': s += " : "; break;
      case '-':
        if (i + 1 < n && in[i + 1] == '-') {
          s += " -- ";
          i++;
        } else
          s += '-';
        break;
      case '"': {
        // opening quote if at start or after space/bracket
        bool opening = (s.empty());
        if (!opening) {
          char prev = s.back();
          opening = (prev == ' ' || prev == '(' || prev == '[' ||
                     prev == '{' || prev == '<');
        }
        s += opening ? " `` " : " '' ";
        break;
      }
      default: s += c;
    }
  }
  // word pass: contractions, cannot
  std::vector<std::string> toks;
  size_t i = 0;
  while (i < s.size()) {
    while (i < s.size() && s[i] == ' ') i++;
    size_t j = i;
    while (j < s.size() && s[j] != ' ') j++;
    if (j > i) {
      std::string w = s.substr(i, j - i);
      // closing single quote: word-final apostrophe splits off (before
      // contraction handling, like the python rule order)
      bool trailing_quote = false;
      if (w.size() > 1 && w.back() == '\'' && w[w.size() - 2] != '\'') {
        w.pop_back();
        trailing_quote = true;
      }
      std::string lw = w;
      for (auto& c : lw)
        if (c >= 'A' && c <= 'Z') c += 32;
      size_t cut;
      if (lw == "cannot") {
        append_tok(&toks, w.substr(0, 3), lowercase);
        append_tok(&toks, w.substr(3), lowercase);
      } else if (contraction_split(w, &cut)) {
        append_tok(&toks, w.substr(0, cut), lowercase);
        append_tok(&toks, w.substr(cut), lowercase);
      } else {
        append_tok(&toks, std::move(w), lowercase);
      }
      if (trailing_quote) toks.push_back("'");
    }
    i = j;
  }
  return toks;
}

// ---------------------------------------------------------------------------
// n-gram machinery (BLEU / CIDEr)
// ---------------------------------------------------------------------------

std::vector<std::string> split_ws(const std::string& s) {
  std::vector<std::string> out;
  size_t i = 0;
  while (i < s.size()) {
    while (i < s.size() && s[i] == ' ') i++;
    size_t j = i;
    while (j < s.size() && s[j] != ' ') j++;
    if (j > i) out.push_back(s.substr(i, j - i));
    i = j;
  }
  return out;
}

std::vector<std::string> split_lines(const char* text) {
  std::vector<std::string> out;
  const char* p = text;
  const char* start = p;
  for (;; p++) {
    if (*p == '\n' || *p == '\0') {
      out.emplace_back(start, p - start);
      if (*p == '\0') break;
      start = p + 1;
    }
  }
  // trailing empty line from terminal '\n'
  if (!out.empty() && out.back().empty() && text[0] != '\0' &&
      p > text && *(p - 1) == '\0')
    ;  // keep semantics: caller sends exactly N lines without trailing \n
  return out;
}

using NgramCounts = std::unordered_map<std::string, int>;

// n-grams encoded as words joined by '\x01' with a length-prefix char
void ngram_counts(const std::vector<std::string>& words, int max_n,
                  NgramCounts* counts) {
  for (int k = 1; k <= max_n; k++) {
    for (int i = 0; i + k <= (int)words.size(); i++) {
      std::string key(1, (char)('0' + k));
      for (int j = 0; j < k; j++) {
        key += '\x01';
        key += words[i + j];
      }
      (*counts)[key]++;
    }
  }
}

struct CiderVec {
  // per n: {ngram -> tfidf}
  std::vector<std::unordered_map<std::string, double>> vec;
  double norm[4] = {0, 0, 0, 0};
  int length = 0;  // bigram token count, per cider_scorer:131
};

struct CiderModel {
  std::unordered_map<std::string, double> df;
  double ref_len = 0.0;

  void build(const std::vector<std::vector<std::string>>& docs) {
    for (const auto& doc : docs) {
      std::unordered_map<std::string, bool> seen;
      for (const auto& sent : doc) {
        NgramCounts c;
        ngram_counts(split_ws(sent), 4, &c);
        for (auto& kv : c) seen[kv.first] = true;
      }
      for (auto& kv : seen) df[kv.first] += 1.0;
    }
    ref_len = std::log((double)docs.size());
  }

  CiderVec vectorize(const std::string& sent) const {
    CiderVec v;
    v.vec.resize(4);
    NgramCounts c;
    ngram_counts(split_ws(sent), 4, &c);
    for (auto& kv : c) {
      int n = kv.first[0] - '0' - 1;
      auto it = df.find(kv.first);
      double d = std::log(std::max(1.0, it == df.end() ? 0.0 : it->second));
      double w = (double)kv.second * (ref_len - d);
      v.vec[n][kv.first] = w;
      v.norm[n] += w * w;
      if (n == 1) v.length += kv.second;
    }
    for (int n = 0; n < 4; n++) v.norm[n] = std::sqrt(v.norm[n]);
    return v;
  }

  double sim(const CiderVec& h, const CiderVec& r, double sigma) const {
    double delta = (double)(h.length - r.length);
    double pen = std::exp(-(delta * delta) / (2.0 * sigma * sigma));
    double total = 0.0;
    for (int n = 0; n < 4; n++) {
      double val = 0.0;
      for (auto& kv : h.vec[n]) {
        auto it = r.vec[n].find(kv.first);
        if (it != r.vec[n].end())
          val += std::min(kv.second, it->second) * it->second;
      }
      if (h.norm[n] != 0 && r.norm[n] != 0) val /= h.norm[n] * r.norm[n];
      total += val * pen;
    }
    return total / 4.0 * 10.0;
  }
};

}  // namespace

extern "C" {

// Tokenize newline-separated sentences -> newline-separated token strings
// (punctuation-list tokens removed, matching the coco-caption wrapper).
// Caller frees with subgc_free.
char* subgc_ptb_tokenize(const char* text, int lowercase) {
  auto lines = split_lines(text);
  std::string out;
  for (size_t i = 0; i < lines.size(); i++) {
    auto toks = ptb_tokenize_sentence(lines[i], lowercase != 0);
    bool first = true;
    for (auto& t : toks) {
      if (is_punct_token(t)) continue;
      if (!first) out += ' ';
      out += t;
      first = false;
    }
    if (i + 1 < lines.size()) out += '\n';
  }
  char* buf = (char*)malloc(out.size() + 1);
  memcpy(buf, out.c_str(), out.size() + 1);
  return buf;
}

void subgc_free(char* p) { free(p); }

// Pairwise CIDEr matrix.
// df_docs: documents separated by '\n', sentences within a doc by '\t'.
// hyps / refs: '\n'-separated tokenized sentences.
// out: row-major [n_hyps, n_refs] similarities.  Returns 0 on success.
int subgc_pairwise_cider(const char* df_docs, const char* hyps,
                         const char* refs, double sigma, double* out) {
  std::vector<std::vector<std::string>> docs;
  for (auto& line : split_lines(df_docs)) {
    std::vector<std::string> doc;
    size_t i = 0;
    while (i <= line.size()) {
      size_t j = line.find('\t', i);
      if (j == std::string::npos) j = line.size();
      doc.push_back(line.substr(i, j - i));
      i = j + 1;
      if (j == line.size()) break;
    }
    docs.push_back(std::move(doc));
  }
  CiderModel model;
  model.build(docs);

  auto hyp_lines = split_lines(hyps);
  auto ref_lines = split_lines(refs);
  std::vector<CiderVec> hv, rv;
  hv.reserve(hyp_lines.size());
  rv.reserve(ref_lines.size());
  for (auto& h : hyp_lines) hv.push_back(model.vectorize(h));
  for (auto& r : ref_lines) rv.push_back(model.vectorize(r));

  for (size_t i = 0; i < hv.size(); i++)
    for (size_t j = 0; j < rv.size(); j++)
      out[i * rv.size() + j] = model.sim(hv[i], rv[j], sigma);
  return 0;
}

// Mutual BLEU-4: score sentence i against the other n-1 as references
// (closest reflen, corpus formula over the single sentence — identical to
// the reference's per-sentence Bleu(4) call in diversity_score.py:69-84).
// sents: '\n'-separated tokenized sentences.  out: [n] BLEU-4 values.
int subgc_mutual_bleu4(const char* sents, double* out) {
  auto lines = split_lines(sents);
  int n = (int)lines.size();
  std::vector<std::vector<std::string>> words(n);
  std::vector<NgramCounts> counts(n);
  for (int i = 0; i < n; i++) {
    words[i] = split_ws(lines[i]);
    ngram_counts(words[i], 4, &counts[i]);
  }
  const double small = 1e-9, tiny = 1e-15;
  for (int i = 0; i < n; i++) {
    // clipped max counts over the other sentences
    NgramCounts maxc;
    int testlen = (int)words[i].size();
    int reflen = 1 << 30;
    for (int j = 0; j < n; j++) {
      if (j == i) continue;
      int rl = (int)words[j].size();
      // closest reflen, ties -> smaller length (min over (|d|, l) pairs)
      if (std::abs(rl - testlen) < std::abs(reflen - testlen) ||
          (std::abs(rl - testlen) == std::abs(reflen - testlen) &&
           rl < reflen))
        reflen = rl;
      for (auto& kv : counts[j]) {
        auto& slot = maxc[kv.first];
        slot = std::max(slot, kv.second);
      }
    }
    double bleu = 1.0, result = 0.0;
    for (int k = 1; k <= 4; k++) {
      int guess = std::max(0, testlen - k + 1);
      int correct = 0;
      for (auto& kv : counts[i]) {
        if (kv.first[0] - '0' != k) continue;
        auto it = maxc.find(kv.first);
        if (it != maxc.end()) correct += std::min(kv.second, it->second);
      }
      bleu *= ((double)correct + tiny) / ((double)guess + small);
      result = std::pow(bleu, 1.0 / k);
    }
    double ratio = ((double)testlen + tiny) / ((double)reflen + small);
    if (ratio < 1.0) result *= std::exp(1.0 - 1.0 / ratio);
    out[i] = result;
  }
  return 0;
}

// Weighted positive/negative sub-graph sampler (the train input path's hot
// loop — 61% of get_batch time in python; semantics of
// dataloaders/dataloader.py:229-266 via subgc_tpu/data/dataset.py
// ::sample_pos_neg).  Distribution-parity, not numpy-stream-parity: draws
// come from a std::mt19937_64 seeded by the caller (the loader burns one
// numpy draw per image for the seed, keeping runs deterministic by seed).
//
// node_iou: [rows, total_cols] row-major; the first 5 columns are the GT
// sub-graphs.  Masks/weights are computed over ALL rows (matching
// sample_pos_neg, whose column sums cover the whole matrix) while output
// covers the first spi rows only; requires rows >= spi.
// out: [spi, half, 2] indices into the full mask list.
int subgc_sample_pos_neg(const float* node_iou, int rows, int spi,
                         int total_cols, double thres, int half,
                         unsigned long long seed, long long* out) {
  const int S = total_cols - 5;
  if (S <= 0 || spi <= 0 || half <= 0 || rows < spi) return 1;
  std::mt19937_64 gen(seed);
  std::uniform_real_distribution<double> uni(0.0, 1.0);
  auto iou = [&](int i, int j) { return node_iou[i * total_cols + 5 + j]; };

  std::vector<char> pos(rows * S), neg(rows * S);
  std::vector<char> any_pos_col(S, 0);
  for (int i = 0; i < rows; i++)
    for (int j = 0; j < S; j++) {
      bool p = iou(i, j) >= thres;
      pos[i * S + j] = p;
      neg[i * S + j] = !p;
      if (p) any_pos_col[j] = 1;
    }
  // "impure" positives can't be negatives for any sentence
  for (int i = 0; i < rows; i++)
    for (int j = 0; j < S; j++)
      if (any_pos_col[j]) neg[i * S + j] = 0;

  std::vector<double> colsum(S, 0.0);
  for (int j = 0; j < S; j++)
    for (int i = 0; i < rows; i++) colsum[j] += pos[i * S + j];
  std::vector<double> w(rows * S), rowsum(rows, 0.0);
  for (int i = 0; i < rows; i++)
    for (int j = 0; j < S; j++) {
      w[i * S + j] = pos[i * S + j] / (colsum[j] + 1e-7);
      rowsum[i] += w[i * S + j];
    }

  auto draw_weighted = [&](const std::vector<int>& idx,
                           const std::vector<double>& p) {
    // inverse-CDF draw (p sums to ~1 after the remainder-absorb trick)
    double u = uni(gen), c = 0.0;
    for (size_t k = 0; k < idx.size(); k++) {
      c += p[k];
      if (u < c) return idx[k];
    }
    return idx.back();
  };
  auto draw_uniform = [&](const std::vector<int>& idx) {
    return idx[(size_t)(uni(gen) * idx.size()) % idx.size()];
  };

  for (int i = 0; i < spi; i++) {
    std::vector<int> pos_idx, neg_idx;
    for (int j = 0; j < S; j++) {
      if (pos[i * S + j]) pos_idx.push_back(j);
      if (neg[i * S + j]) neg_idx.push_back(j);
    }
    // positives
    long long* row = out + (size_t)i * half * 2;
    if ((int)pos_idx.size() < half) {
      int to_pad = half - (int)pos_idx.size();
      for (int k = 0; k < to_pad; k++) row[k * 2 + 0] = i - 5;
      for (int k = 0; k < (int)pos_idx.size(); k++)
        row[(to_pad + k) * 2 + 0] = pos_idx[k];
    } else {
      std::vector<double> pw(pos_idx.size());
      double sum = 0.0;
      for (size_t k = 0; k < pos_idx.size(); k++) {
        pw[k] = w[i * S + pos_idx[k]] / (rowsum[i] + 1e-7);
        sum += pw[k];
      }
      // remainder-absorb: one random slot takes 1 - (sum of the others)
      size_t rd = (size_t)(uni(gen) * pw.size()) % pw.size();
      pw[rd] = 1.0 - (sum - pw[rd]);
      for (int k = 0; k < half; k++)
        row[k * 2 + 0] = draw_weighted(pos_idx, pw);
    }
    // negatives
    if ((int)neg_idx.size() < half) {
      std::vector<int> tmp_neg, any_idx;
      for (int j = 0; j < S; j++) {
        if (iou(i, j) <= thres) tmp_neg.push_back(j);
        if (iou(i, j) <= 1.0) any_idx.push_back(j);
      }
      const std::vector<int>& src =
          tmp_neg.empty() ? any_idx
                          : (neg_idx.empty() ? tmp_neg : neg_idx);
      if (src.empty()) return 2;
      for (int k = 0; k < half; k++) row[k * 2 + 1] = draw_uniform(src);
    } else {
      // without replacement: partial Fisher-Yates
      std::vector<int> pool(neg_idx);
      for (int k = 0; k < half; k++) {
        size_t r = k + (size_t)(uni(gen) * (pool.size() - k)) %
                           (pool.size() - k);
        std::swap(pool[k], pool[r]);
        row[k * 2 + 1] = pool[k];
      }
    }
    for (int k = 0; k < half; k++) {
      row[k * 2 + 0] += 5;
      row[k * 2 + 1] += 5;
    }
  }
  return 0;
}

}  // extern "C"
