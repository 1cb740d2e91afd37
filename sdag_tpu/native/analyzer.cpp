// Lucene-style English analyzer: tokenize on non-alphanumerics, lowercase,
// default English stopword removal, Porter stemming.
//
// TPU-native replacement for the host-side half of the reference's
// Pyserini/Lucene BM25 path (src/pipeline/retrieval/sparse.py:11-64): the
// JVM analyzer chain becomes this C library (driven via ctypes); scoring
// runs on device (sdag_tpu/ops/bm25.py).
//
// Batch protocol: documents separated by '\x02' on input; output tokens
// separated by '\x01' within a doc, docs separated by '\x02'.

#include <cctype>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_set>
#include <vector>

namespace {

const std::unordered_set<std::string>& stopwords() {
  // Lucene EnglishAnalyzer ENGLISH_STOP_WORDS_SET
  static const std::unordered_set<std::string> kStop = {
      "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
      "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
      "that", "the", "their", "then", "there", "these", "they", "this",
      "to", "was", "will", "with"};
  return kStop;
}

// ---------------------------------------------------------------------------
// Porter stemmer (classic 1980 algorithm).
// ---------------------------------------------------------------------------
class PorterStemmer {
 public:
  std::string stem(const std::string& in) {
    if (in.size() <= 2) return in;
    b_ = in;
    k_ = static_cast<int>(b_.size()) - 1;
    step1ab();
    step1c();
    step2();
    step3();
    step4();
    step5();
    return b_.substr(0, k_ + 1);
  }

 private:
  std::string b_;
  int k_ = 0;
  int j_ = 0;

  bool cons(int i) const {
    switch (b_[i]) {
      case 'a': case 'e': case 'i': case 'o': case 'u':
        return false;
      case 'y':
        return (i == 0) ? true : !cons(i - 1);
      default:
        return true;
    }
  }

  // measure of consonant-vowel sequences between 0 and j_
  int m() const {
    int n = 0, i = 0;
    while (true) {
      if (i > j_) return n;
      if (!cons(i)) break;
      i++;
    }
    i++;
    while (true) {
      while (true) {
        if (i > j_) return n;
        if (cons(i)) break;
        i++;
      }
      i++;
      n++;
      while (true) {
        if (i > j_) return n;
        if (!cons(i)) break;
        i++;
      }
      i++;
    }
  }

  bool vowelinstem() const {
    for (int i = 0; i <= j_; i++)
      if (!cons(i)) return true;
    return false;
  }

  bool doublec(int j) const {
    if (j < 1) return false;
    if (b_[j] != b_[j - 1]) return false;
    return cons(j);
  }

  bool cvc(int i) const {
    if (i < 2 || !cons(i) || cons(i - 1) || !cons(i - 2)) return false;
    char ch = b_[i];
    return ch != 'w' && ch != 'x' && ch != 'y';
  }

  bool ends(const char* s) {
    int l = static_cast<int>(std::strlen(s));
    if (l > k_ + 1) return false;
    if (b_.compare(k_ - l + 1, l, s) != 0) return false;
    j_ = k_ - l;
    return true;
  }

  void setto(const char* s) {
    int l = static_cast<int>(std::strlen(s));
    b_.replace(j_ + 1, b_.size() - j_ - 1, s);
    k_ = j_ + l;
  }

  void r(const char* s) {
    if (m() > 0) setto(s);
  }

  void step1ab() {
    if (b_[k_] == 's') {
      if (ends("sses")) k_ -= 2;
      else if (ends("ies")) setto("i");
      else if (b_[k_ - 1] != 's') k_--;
    }
    if (ends("eed")) {
      if (m() > 0) k_--;
    } else if ((ends("ed") || ends("ing")) && vowelinstem()) {
      k_ = j_;
      if (ends("at")) setto("ate");
      else if (ends("bl")) setto("ble");
      else if (ends("iz")) setto("ize");
      else if (doublec(k_)) {
        k_--;
        char ch = b_[k_];
        if (ch == 'l' || ch == 's' || ch == 'z') k_++;
      } else if (m() == 1 && cvc(k_)) {
        setto("e");
      }
    }
  }

  void step1c() {
    if (ends("y") && vowelinstem()) b_[k_] = 'i';
  }

  void step2() {
    if (k_ < 1) return;
    switch (b_[k_ - 1]) {
      case 'a':
        if (ends("ational")) { r("ate"); break; }
        if (ends("tional")) { r("tion"); break; }
        break;
      case 'c':
        if (ends("enci")) { r("ence"); break; }
        if (ends("anci")) { r("ance"); break; }
        break;
      case 'e':
        if (ends("izer")) { r("ize"); break; }
        break;
      case 'l':
        if (ends("bli")) { r("ble"); break; }
        if (ends("alli")) { r("al"); break; }
        if (ends("entli")) { r("ent"); break; }
        if (ends("eli")) { r("e"); break; }
        if (ends("ousli")) { r("ous"); break; }
        break;
      case 'o':
        if (ends("ization")) { r("ize"); break; }
        if (ends("ation")) { r("ate"); break; }
        if (ends("ator")) { r("ate"); break; }
        break;
      case 's':
        if (ends("alism")) { r("al"); break; }
        if (ends("iveness")) { r("ive"); break; }
        if (ends("fulness")) { r("ful"); break; }
        if (ends("ousness")) { r("ous"); break; }
        break;
      case 't':
        if (ends("aliti")) { r("al"); break; }
        if (ends("iviti")) { r("ive"); break; }
        if (ends("biliti")) { r("ble"); break; }
        break;
      case 'g':
        if (ends("logi")) { r("log"); break; }
        break;
    }
  }

  void step3() {
    switch (b_[k_]) {
      case 'e':
        if (ends("icate")) { r("ic"); break; }
        if (ends("ative")) { r(""); break; }
        if (ends("alize")) { r("al"); break; }
        break;
      case 'i':
        if (ends("iciti")) { r("ic"); break; }
        break;
      case 'l':
        if (ends("ical")) { r("ic"); break; }
        if (ends("ful")) { r(""); break; }
        break;
      case 's':
        if (ends("ness")) { r(""); break; }
        break;
    }
  }

  void step4() {
    if (k_ < 1) return;
    switch (b_[k_ - 1]) {
      case 'a': if (ends("al")) break; return;
      case 'c': if (ends("ance")) break; if (ends("ence")) break; return;
      case 'e': if (ends("er")) break; return;
      case 'i': if (ends("ic")) break; return;
      case 'l': if (ends("able")) break; if (ends("ible")) break; return;
      case 'n':
        if (ends("ant")) break;
        if (ends("ement")) break;
        if (ends("ment")) break;
        if (ends("ent")) break;
        return;
      case 'o':
        if (ends("ion") && j_ >= 0 && (b_[j_] == 's' || b_[j_] == 't')) break;
        if (ends("ou")) break;
        return;
      case 's': if (ends("ism")) break; return;
      case 't': if (ends("ate")) break; if (ends("iti")) break; return;
      case 'u': if (ends("ous")) break; return;
      case 'v': if (ends("ive")) break; return;
      case 'z': if (ends("ize")) break; return;
      default: return;
    }
    if (m() > 1) k_ = j_;
  }

  void step5() {
    j_ = k_;
    if (b_[k_] == 'e') {
      int a = m();
      if (a > 1 || (a == 1 && !cvc(k_ - 1))) k_--;
    }
    if (b_[k_] == 'l' && doublec(k_) && m() > 1) k_--;
  }
};

void analyze_doc(const char* begin, const char* end, std::string* out) {
  PorterStemmer stemmer;
  std::string tok;
  bool first = true;
  auto flush = [&]() {
    if (tok.empty()) return;
    if (stopwords().count(tok) == 0) {
      std::string stemmed = stemmer.stem(tok);
      if (!stemmed.empty()) {
        if (!first) out->push_back('\x01');
        out->append(stemmed);
        first = false;
      }
    }
    tok.clear();
  };
  for (const char* p = begin; p != end; ++p) {
    unsigned char c = static_cast<unsigned char>(*p);
    if (std::isalnum(c)) {
      tok.push_back(static_cast<char>(std::tolower(c)));
    } else {
      flush();
    }
  }
  flush();
}

}  // namespace

extern "C" {

// Analyze a batch of '\x02'-separated docs.  Returns a malloc'd buffer the
// caller frees with analyzer_free; *out_len receives its length.
char* analyze_batch(const char* input, int64_t input_len, int64_t* out_len) {
  std::string out;
  out.reserve(static_cast<size_t>(input_len));
  const char* p = input;
  const char* end = input + input_len;
  bool first_doc = true;
  while (p <= end) {
    const char* sep = static_cast<const char*>(
        memchr(p, '\x02', static_cast<size_t>(end - p)));
    const char* doc_end = sep ? sep : end;
    if (!first_doc) out.push_back('\x02');
    analyze_doc(p, doc_end, &out);
    first_doc = false;
    if (!sep) break;
    p = sep + 1;
  }
  char* buf = static_cast<char*>(malloc(out.size()));
  memcpy(buf, out.data(), out.size());
  *out_len = static_cast<int64_t>(out.size());
  return buf;
}

void analyzer_free(char* p) { free(p); }

}  // extern "C"
