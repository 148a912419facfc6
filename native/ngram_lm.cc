// Native ARPA n-gram language model scorer (KenLM-compatible queries).
//
// The reference scores beam-search hypotheses with KenLM's C++ model through
// its python binding (reference PrefixTree.py:288-290). This library fills
// the same role for the TPU framework: it loads a text ARPA file into
// flat hash tables and answers sentence log10-probability queries with
// standard Katz backoff (longest-match + accumulated backoff weights,
// OOV -> <unk>). Exposed as a C API consumed via ctypes
// (emg_tpu/decode/lm_binding.py).
//
// Build: make -C native  (produces libngram_lm.so)

#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct VecHash {
  size_t operator()(const std::vector<int32_t>& v) const {
    size_t h = 1469598103934665603ull;
    for (int32_t x : v) {
      h ^= static_cast<size_t>(x) + 0x9e3779b97f4a7c15ull + (h << 6) + (h >> 2);
    }
    return h;
  }
};

struct Entry {
  float logp;
  float backoff;
};

struct Model {
  std::unordered_map<std::string, int32_t> vocab;
  std::vector<std::unordered_map<std::vector<int32_t>, Entry, VecHash>> ngrams;
  int order = 0;
  int32_t unk_id = -1;
  int32_t bos_id = -1;
  int32_t eos_id = -1;

  int32_t lookup(const std::string& w) const {
    auto it = vocab.find(w);
    return it == vocab.end() ? unk_id : it->second;
  }
};

bool parse_arpa(const std::string& path, Model* m) {
  std::ifstream in(path);
  if (!in) return false;
  std::string line;
  // seek \data\ section
  while (std::getline(in, line)) {
    if (line.rfind("\\data\\", 0) == 0) break;
  }
  std::vector<long> counts;
  while (std::getline(in, line)) {
    if (line.rfind("ngram", 0) == 0) {
      auto eq = line.find('=');
      counts.push_back(std::stol(line.substr(eq + 1)));
    } else if (line.find("-grams:") != std::string::npos) {
      break;
    }
  }
  m->order = static_cast<int>(counts.size());
  m->ngrams.resize(m->order + 1);

  auto intern = [&](const std::string& w) -> int32_t {
    auto it = m->vocab.find(w);
    if (it != m->vocab.end()) return it->second;
    int32_t id = static_cast<int32_t>(m->vocab.size());
    m->vocab.emplace(w, id);
    return id;
  };

  // `line` holds the first section header
  while (true) {
    if (line.find("\\end\\") != std::string::npos) break;
    int n = std::stoi(line.substr(1, line.find('-') - 1));
    bool next_section = false;
    while (std::getline(in, line)) {
      if (line.empty() || line == "\r") continue;
      if (line[0] == '\\') { next_section = true; break; }
      std::istringstream ss(line);
      float logp;
      ss >> logp;
      std::vector<int32_t> words(n);
      std::string w;
      for (int i = 0; i < n; ++i) { ss >> w; words[i] = intern(w); }
      float backoff = 0.0f;
      if (ss >> w) backoff = std::stof(w);
      m->ngrams[n][words] = {logp, backoff};
    }
    if (!next_section) break;
  }
  auto find_id = [&](const char* w) -> int32_t {
    auto it = m->vocab.find(w);
    return it == m->vocab.end() ? -1 : it->second;
  };
  m->unk_id = find_id("<unk>");
  m->bos_id = find_id("<s>");
  m->eos_id = find_id("</s>");
  return true;
}

double word_score(const Model& m, std::vector<int32_t> context, int32_t word) {
  if (m.order > 1) {
    size_t keep = static_cast<size_t>(m.order - 1);
    if (context.size() > keep)
      context.erase(context.begin(), context.end() - keep);
  } else {
    context.clear();
  }
  double total_backoff = 0.0;
  while (true) {
    std::vector<int32_t> key(context);
    key.push_back(word);
    int n = static_cast<int>(key.size());
    if (n <= m.order) {
      auto it = m.ngrams[n].find(key);
      if (it != m.ngrams[n].end()) return total_backoff + it->second.logp;
    }
    if (context.empty()) return total_backoff - 99.0;
    auto bo = m.ngrams[context.size()].find(context);
    if (bo != m.ngrams[context.size()].end())
      total_backoff += bo->second.backoff;
    context.erase(context.begin());
  }
}

}  // namespace

extern "C" {

void* lm_load(const char* path) {
  Model* m = new Model();
  if (!parse_arpa(path, m)) {
    delete m;
    return nullptr;
  }
  return m;
}

void lm_free(void* handle) { delete static_cast<Model*>(handle); }

int lm_order(void* handle) { return static_cast<Model*>(handle)->order; }

double lm_score(void* handle, const char* sentence, int bos, int eos) {
  const Model& m = *static_cast<Model*>(handle);
  std::istringstream ss(sentence);
  std::string w;
  std::vector<int32_t> context;
  if (bos && m.bos_id >= 0) context.push_back(m.bos_id);
  double total = 0.0;
  while (ss >> w) {
    int32_t id = m.lookup(w);
    total += word_score(m, context, id);
    context.push_back(id);
  }
  if (eos && m.eos_id >= 0) total += word_score(m, context, m.eos_id);
  return total;
}

}  // extern "C"
