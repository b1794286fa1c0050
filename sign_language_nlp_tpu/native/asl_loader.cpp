// asl_loader — native data-loading fast path for the ASL-Phono corpus.
//
// The reference's only I/O-bound hot loop is the dataset build: scan a
// directory of per-sample JSON files, drop label groups below a
// min-frequency, then per frame compose the phonological fields into one
// token (reference dataset/builder/dataset_builder.py:66-135 and the
// composition strategies at :137-223 — Python-level json + pandas +
// torchtext). This library does the scan → parse → compose pipeline in
// C++ and streams a compact TSV the Python side consumes:
//
//     label \t filename \t tok1 tok2 tok3 ...\n
//
// Exposed C ABI (ctypes): asl_build_corpus(dir, fields_csv, min_freq,
// strategy, out_path) -> number of samples written (<0 on error).
//
// The JSON subset parsed here covers the ASL-Phono sample format:
// objects, arrays, strings (with escapes), numbers, true/false/null.

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <fstream>
#include <map>
#include <memory>
#include <sstream>
#include <string>
#include <sys/stat.h>
#include <vector>

namespace {

// ----------------------------------------------------------- tiny JSON
struct JValue;
using JPtr = std::unique_ptr<JValue>;

struct JValue {
  enum Kind { Null, Bool, Num, Str, Arr, Obj } kind = Null;
  bool b = false;
  double num = 0;
  std::string str;
  std::vector<JPtr> arr;
  std::vector<std::pair<std::string, JPtr>> obj;

  const JValue* get(const std::string& key) const {
    for (const auto& kv : obj)
      if (kv.first == key) return kv.second.get();
    return nullptr;
  }
};

// Append the UTF-8 encoding of a code point — matches what Python's
// json.loads + UTF-8 file write produces, so the TSV stays byte-identical
// to the Python builder path for non-ASCII \uXXXX escapes.
void append_utf8(std::string& out, unsigned cp) {
  if (cp < 0x80) {
    out += static_cast<char>(cp);
  } else if (cp < 0x800) {
    out += static_cast<char>(0xC0 | (cp >> 6));
    out += static_cast<char>(0x80 | (cp & 0x3F));
  } else if (cp < 0x10000) {
    out += static_cast<char>(0xE0 | (cp >> 12));
    out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
    out += static_cast<char>(0x80 | (cp & 0x3F));
  } else {
    out += static_cast<char>(0xF0 | (cp >> 18));
    out += static_cast<char>(0x80 | ((cp >> 12) & 0x3F));
    out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
    out += static_cast<char>(0x80 | (cp & 0x3F));
  }
}

// Parse exactly four hex digits at s; returns false if any is not hex.
bool hex4(const char* s, unsigned& code) {
  code = 0;
  for (int i = 0; i < 4; ++i) {
    char c = s[i];
    unsigned d;
    if (c >= '0' && c <= '9') d = c - '0';
    else if (c >= 'a' && c <= 'f') d = c - 'a' + 10;
    else if (c >= 'A' && c <= 'F') d = c - 'A' + 10;
    else return false;
    code = (code << 4) | d;
  }
  return true;
}

struct Parser {
  const char* p;
  const char* end;
  bool ok = true;

  explicit Parser(const std::string& s) : p(s.data()), end(s.data() + s.size()) {}

  void skip() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
      ++p;
  }
  bool consume(char c) {
    skip();
    if (p < end && *p == c) { ++p; return true; }
    return false;
  }

  JPtr parse() {
    skip();
    if (p >= end) { ok = false; return nullptr; }
    switch (*p) {
      case '{': return parse_obj();
      case '[': return parse_arr();
      case '"': return parse_str();
      case 't': case 'f': return parse_bool();
      case 'n': return parse_null();
      default: return parse_num();
    }
  }

  JPtr parse_obj() {
    auto v = std::make_unique<JValue>();
    v->kind = JValue::Obj;
    consume('{');
    skip();
    if (consume('}')) return v;
    while (ok) {
      skip();
      auto key = parse_str();
      if (!ok || !key) break;
      if (!consume(':')) { ok = false; break; }
      auto val = parse();
      if (!ok) break;
      v->obj.emplace_back(std::move(key->str), std::move(val));
      skip();
      if (consume(',')) continue;
      if (consume('}')) return v;
      ok = false;
      break;
    }
    return v;
  }

  JPtr parse_arr() {
    auto v = std::make_unique<JValue>();
    v->kind = JValue::Arr;
    consume('[');
    skip();
    if (consume(']')) return v;
    while (ok) {
      auto val = parse();
      if (!ok) break;
      v->arr.push_back(std::move(val));
      skip();
      if (consume(',')) continue;
      if (consume(']')) return v;
      ok = false;
      break;
    }
    return v;
  }

  JPtr parse_str() {
    skip();
    if (p >= end || *p != '"') { ok = false; return nullptr; }
    ++p;
    auto v = std::make_unique<JValue>();
    v->kind = JValue::Str;
    std::string& out = v->str;
    while (p < end && *p != '"') {
      if (*p == '\\' && p + 1 < end) {
        ++p;
        switch (*p) {
          case 'n': out += '\n'; break;
          case 't': out += '\t'; break;
          case 'r': out += '\r'; break;
          case 'b': out += '\b'; break;
          case 'f': out += '\f'; break;
          case 'u': {  // \uXXXX → UTF-8 (incl. surrogate pairs)
            unsigned code = 0;
            if (p + 4 < end && hex4(p + 1, code)) {
              p += 4;
              if (code >= 0xD800 && code <= 0xDBFF) {
                // High surrogate: expect \uDC00-\uDFFF next.
                unsigned lo = 0;
                if (p + 6 < end && p[1] == '\\' && p[2] == 'u' &&
                    hex4(p + 3, lo) && lo >= 0xDC00 && lo <= 0xDFFF) {
                  append_utf8(out, 0x10000 + ((code - 0xD800) << 10) +
                                       (lo - 0xDC00));
                  p += 6;
                } else {
                  // Lone high surrogate: Python json keeps it as an
                  // unencodable str; U+FFFD is the closest byte-level
                  // stand-in (unreachable for well-formed JSON).
                  append_utf8(out, 0xFFFD);
                }
              } else if (code >= 0xDC00 && code <= 0xDFFF) {
                append_utf8(out, 0xFFFD);  // lone low surrogate
              } else {
                append_utf8(out, code);
              }
            }
            break;
          }
          default: out += *p;
        }
      } else {
        out += *p;
      }
      ++p;
    }
    if (p < end) ++p;  // closing quote
    return v;
  }

  JPtr parse_bool() {
    auto v = std::make_unique<JValue>();
    v->kind = JValue::Bool;
    if (end - p >= 4 && std::strncmp(p, "true", 4) == 0) {
      v->b = true; p += 4;
    } else if (end - p >= 5 && std::strncmp(p, "false", 5) == 0) {
      v->b = false; p += 5;
    } else {
      ok = false;
    }
    return v;
  }

  JPtr parse_null() {
    auto v = std::make_unique<JValue>();
    if (end - p >= 4 && std::strncmp(p, "null", 4) == 0) p += 4;
    else ok = false;
    return v;
  }

  JPtr parse_num() {
    auto v = std::make_unique<JValue>();
    v->kind = JValue::Num;
    char* out = nullptr;
    v->num = std::strtod(p, &out);
    if (out == p) { ok = false; return v; }
    p = out;
    return v;
  }
};

// -------------------------------------------------- composition strategies
// (byte-compatible with the Python implementations in data/compose.py)

std::string value_of(const JValue* field) {
  // A field is null/"" or {"value": "<words>"} (nulls may have been
  // rewritten to "" upstream).
  if (!field) return "";
  if (field->kind == JValue::Obj) {
    const JValue* v = field->get("value");
    if (v && v->kind == JValue::Str) return v->str;
    return "";
  }
  return "";  // null, "" or anything falsy
}

bool is_falsy(const JValue* field) {
  return !field || field->kind == JValue::Null ||
         (field->kind == JValue::Str && field->str.empty());
}

std::vector<std::string> split(const std::string& s, char sep) {
  std::vector<std::string> out;
  std::string cur;
  for (char c : s) {
    if (c == sep) { out.push_back(cur); cur.clear(); }
    else cur += c;
  }
  out.push_back(cur);
  return out;
}

std::string abbrev(const JValue* field) {
  if (is_falsy(field)) return "";
  std::string out;
  for (const auto& word : split(value_of(field), '_'))
    if (!word.empty()) {
      // First CHARACTER, not first byte: Python's word[0] on a UTF-8
      // multi-byte lead grabs the whole code point. Lead byte tells the
      // sequence length; continuation bytes are 0b10xxxxxx.
      size_t n = 1;
      unsigned char lead = static_cast<unsigned char>(word[0]);
      if ((lead & 0xE0) == 0xC0) n = 2;
      else if ((lead & 0xF0) == 0xE0) n = 3;
      else if ((lead & 0xF8) == 0xF0) n = 4;
      out += word.substr(0, std::min(n, word.size()));
    }
  return out;
}

bool contains(const std::vector<std::string>& v, const char* w) {
  return std::find(v.begin(), v.end(), w) != v.end();
}

std::string compose_token(const JValue& frame,
                          const std::vector<std::string>& fields,
                          int strategy) {
  std::string tok;
  std::vector<std::string> parts;
  for (const auto& f : fields) {
    const JValue* field = frame.get(f);
    switch (strategy) {
      case 0: {  // all_values: value left-aligned to width 20
        std::string v = is_falsy(field) ? "" : value_of(field);
        // Python's f"{v:<20}" pads to 20 CHARACTERS; count code points
        // (bytes that are not UTF-8 continuation bytes 0b10xxxxxx).
        size_t chars = 0;
        for (char c : v)
          if ((static_cast<unsigned char>(c) & 0xC0) != 0x80) ++chars;
        if (chars < 20) v.append(20 - chars, ' ');
        parts.push_back(v);
        break;
      }
      case 1:  // as_words
        parts.push_back(abbrev(field));
        break;
      case 2: {  // as_words_norm
        std::string v = is_falsy(field) ? "" : value_of(field);
        if (f.rfind("orientation", 0) == 0 || f.rfind("movement", 0) == 0) {
          auto words = split(v, '_');
          std::string code;
          code += contains(words, "left") ? 'l'
                  : contains(words, "right") ? 'r' : '_';
          code += contains(words, "up") ? 'u'
                  : contains(words, "down") ? 'd' : '_';
          code += contains(words, "front") ? 'f'
                  : contains(words, "back") ? 'b' : '_';
          parts.push_back(code);
        } else {
          parts.push_back(v);
        }
        break;
      }
      case 3:  // as_sep_feat: python list repr of abbrevs
        parts.push_back(abbrev(field));
        break;
    }
  }
  if (strategy == 3) {
    tok = "[";
    for (size_t i = 0; i < parts.size(); ++i) {
      tok += "'" + parts[i] + "'";
      if (i + 1 < parts.size()) tok += ", ";
    }
    tok += "]";
  } else {
    for (size_t i = 0; i < parts.size(); ++i) {
      tok += parts[i];
      if (i + 1 < parts.size()) tok += "-";
    }
  }
  return tok;
}

bool read_file(const std::string& path, std::string& out) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::ostringstream ss;
  ss << f.rdbuf();
  out = ss.str();
  return true;
}

}  // namespace

extern "C" {

// Returns number of samples written, or -errno-style negative code.
long asl_build_corpus(const char* dataset_dir, const char* fields_csv,
                      long min_freq, const char* strategy,
                      const char* out_path) {
  int strat;
  if (!std::strcmp(strategy, "all_values")) strat = 0;
  else if (!std::strcmp(strategy, "as_words")) strat = 1;
  else if (!std::strcmp(strategy, "as_words_norm")) strat = 2;
  else if (!std::strcmp(strategy, "as_sep_feat")) strat = 3;
  else return -2;

  std::vector<std::string> fields = split(fields_csv, ',');

  // Scan directory for .json files:
  DIR* dir = opendir(dataset_dir);
  if (!dir) return -1;
  std::vector<std::string> files;
  while (dirent* e = readdir(dir)) {
    std::string name = e->d_name;
    if (name.size() > 5 && name.substr(name.size() - 5) == ".json")
      files.push_back(name);
  }
  closedir(dir);
  std::sort(files.begin(), files.end());

  // Group by prefix (text before first '-') and min-freq filter:
  std::map<std::string, long> group_counts;
  for (const auto& f : files) {
    std::string stem = f.substr(0, f.size() - 5);
    group_counts[stem.substr(0, stem.find('-'))]++;
  }

  std::ofstream out(out_path, std::ios::binary);
  if (!out) return -3;

  long written = 0;
  std::string buf;
  for (const auto& fname : files) {
    std::string stem = fname.substr(0, fname.size() - 5);
    if (group_counts[stem.substr(0, stem.find('-'))] < min_freq) continue;
    if (!read_file(std::string(dataset_dir) + "/" + fname, buf)) continue;
    Parser parser(buf);
    JPtr root = parser.parse();
    if (!parser.ok || !root || root->kind != JValue::Obj) continue;

    const JValue* label = root->get("label");
    const JValue* frames = root->get("frames");
    const JValue* phon = frames ? frames->get("phonology") : nullptr;
    if (!label || label->kind != JValue::Str || !phon ||
        phon->kind != JValue::Arr)
      continue;

    out << label->str << '\t' << fname << '\t';
    for (size_t i = 0; i < phon->arr.size(); ++i) {
      if (i) out << '\x1f';  // unit separator — tokens may contain spaces
      out << compose_token(*phon->arr[i], fields, strat);
    }
    out << '\n';
    ++written;
  }
  return written;
}

const char* asl_loader_version() { return "1.0"; }

}  // extern "C"
