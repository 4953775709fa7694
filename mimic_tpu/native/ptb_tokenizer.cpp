// Native PTB-style caption tokenizer.
//
// The reference shells out to Stanford-CoreNLP's Java PTBTokenizer for CIDEr
// scoring (testbed/evaluate/metrics/CIDEr/CIDEr.py:80-101) — its one native
// dependency.  This is the C++ equivalent: byte-for-byte the same rules as the
// pure-Python fallback in mimic_tpu/evaluate/ptb_tokenizer.py (which is the
// parity oracle in tests), built once with g++ and loaded via ctypes.
//
// Exported C ABI:
//   int ptb_tokenize_line(const char* line, int lowercase,
//                         char* out, int out_cap);
// Writes space-joined tokens into `out` (NUL-terminated); returns the number of
// bytes written (excluding NUL), or -1 if `out_cap` is too small.

#include <cctype>
#include <cstring>
#include <string>
#include <vector>

namespace {

inline bool is_word_byte(unsigned char c) {
  // ASCII word chars plus all non-ASCII bytes (UTF-8 letters approximate \w)
  return std::isalnum(c) || c == '_' || c >= 0x80;
}

inline bool is_space_byte(unsigned char c) { return std::isspace(c) != 0; }

const char* bracket_token(char c) {
  switch (c) {
    case '(': return "-LRB-";
    case ')': return "-RRB-";
    case '{': return "-LCB-";
    case '}': return "-RCB-";
    case '[': return "-LSB-";
    case ']': return "-RSB-";
    default: return nullptr;
  }
}

bool is_clause_punct(char c) {
  switch (c) {
    case ',': case ';': case ':': case '@': case '#': case '$': case '%':
    case '&':
      return true;
    default:
      return false;
  }
}

// split trailing contractions recursively: n't 's 'm 're 've 'll 'd
void split_contractions(const std::string& tok, std::vector<std::string>* out) {
  size_t n = tok.size();
  auto tail_is = [&](const char* suf) {
    size_t m = std::strlen(suf);
    if (n < m + 1) return false;  // need at least one head char
    for (size_t i = 0; i < m; ++i) {
      char a = tok[n - m + i];
      char b = suf[i];
      if (std::tolower(static_cast<unsigned char>(a)) != b) return false;
    }
    // head must end in a word byte
    return is_word_byte(static_cast<unsigned char>(tok[n - m - 1]));
  };
  static const char* two[] = {"'s", "'m", "'d"};
  static const char* three[] = {"n't", "'re", "'ve", "'ll"};
  for (const char* suf : three) {
    if (tail_is(suf)) {
      split_contractions(tok.substr(0, n - 3), out);
      out->push_back(tok.substr(n - 3));
      return;
    }
  }
  for (const char* suf : two) {
    if (tail_is(suf)) {
      split_contractions(tok.substr(0, n - 2), out);
      out->push_back(tok.substr(n - 2));
      return;
    }
  }
  out->push_back(tok);
}

void tokenize(const std::string& line, std::vector<std::string>* out) {
  size_t i = 0;
  const size_t n = line.size();
  while (i < n) {
    unsigned char c = line[i];
    if (is_space_byte(c)) {
      ++i;
      continue;
    }
    // ellipsis
    if (c == '.' && i + 2 < n && line[i + 1] == '.' && line[i + 2] == '.') {
      out->push_back("...");
      i += 3;
      continue;
    }
    // dashes --+
    if (c == '-' && i + 1 < n && line[i + 1] == '-') {
      size_t j = i;
      while (j < n && line[j] == '-') ++j;
      out->push_back(line.substr(i, j - i));
      i = j;
      continue;
    }
    // clause punctuation / symbols
    if (is_clause_punct(static_cast<char>(c))) {
      out->push_back(std::string(1, static_cast<char>(c)));
      ++i;
      continue;
    }
    // numbers with internal . or ,
    if (std::isdigit(c)) {
      size_t j = i;
      while (j < n) {
        if (std::isdigit(static_cast<unsigned char>(line[j]))) {
          ++j;
        } else if ((line[j] == '.' || line[j] == ',') && j + 1 < n &&
                   std::isdigit(static_cast<unsigned char>(line[j + 1]))) {
          j += 2;
          while (j < n && std::isdigit(static_cast<unsigned char>(line[j]))) ++j;
        } else {
          break;
        }
      }
      // always emit the digit run ("2nd" → "2" + "nd", matching the Python
      // regex's leftmost-match behavior)
      out->push_back(line.substr(i, j - i));
      i = j;
      continue;
    }
    // words incl. internal hyphen/apostrophe, optional trailing '
    if (is_word_byte(c)) {
      size_t j = i;
      while (j < n) {
        if (is_word_byte(static_cast<unsigned char>(line[j]))) {
          ++j;
        } else if ((line[j] == '-' || line[j] == '\'') && j + 1 < n &&
                   is_word_byte(static_cast<unsigned char>(line[j + 1]))) {
          j += 2;
        } else {
          break;
        }
      }
      if (j < n && line[j] == '\'') ++j;  // trailing apostrophe
      split_contractions(line.substr(i, j - i), out);
      i = j;
      continue;
    }
    // brackets
    if (const char* tok = bracket_token(static_cast<char>(c))) {
      out->push_back(tok);
      ++i;
      continue;
    }
    // double quote → ''
    if (c == '"') {
      out->push_back("''");
      ++i;
      continue;
    }
    // any other single non-space char
    out->push_back(std::string(1, static_cast<char>(c)));
    ++i;
  }
}

}  // namespace

extern "C" int ptb_tokenize_line(const char* line, int lowercase, char* out,
                                 int out_cap) {
  std::string text(line);
  if (lowercase) {
    for (auto& ch : text) {
      ch = static_cast<char>(std::tolower(static_cast<unsigned char>(ch)));
    }
  }
  for (auto& ch : text) {
    if (ch == '\n') ch = ' ';
  }
  std::vector<std::string> toks;
  tokenize(text, &toks);
  std::string joined;
  for (size_t i = 0; i < toks.size(); ++i) {
    if (i) joined += ' ';
    joined += toks[i];
  }
  if (static_cast<int>(joined.size()) + 1 > out_cap) return -1;
  std::memcpy(out, joined.c_str(), joined.size() + 1);
  return static_cast<int>(joined.size());
}
