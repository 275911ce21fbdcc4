// Minimal JSON value / parser / writer (no external deps).
//
// The reference serving stack (RASP) uses nlohmann/json for its decision
// plans, requests and logs (reference: serving/reagent/serving/core/
// Containers.h:81-272). This is a self-contained equivalent sufficient for
// the decision-service data model: null/bool/number/string/array/object.
#pragma once

#include <cassert>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <map>
#include <memory>
#include <sstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace reagent {

class Json;
using JsonArray = std::vector<Json>;
using JsonObject = std::map<std::string, Json>;

class Json {
 public:
  enum class Type { Null, Bool, Number, String, Array, Object };

  Json() : type_(Type::Null) {}
  Json(std::nullptr_t) : type_(Type::Null) {}
  Json(bool b) : type_(Type::Bool), bool_(b) {}
  Json(int v) : type_(Type::Number), num_(v) {}
  Json(int64_t v) : type_(Type::Number), num_(static_cast<double>(v)) {}
  Json(size_t v) : type_(Type::Number), num_(static_cast<double>(v)) {}
  Json(double v) : type_(Type::Number), num_(v) {}
  Json(const char* s) : type_(Type::String), str_(s) {}
  Json(std::string s) : type_(Type::String), str_(std::move(s)) {}
  Json(JsonArray a) : type_(Type::Array), arr_(std::move(a)) {}
  Json(JsonObject o) : type_(Type::Object), obj_(std::move(o)) {}

  Type type() const { return type_; }
  bool isNull() const { return type_ == Type::Null; }
  bool isBool() const { return type_ == Type::Bool; }
  bool isNumber() const { return type_ == Type::Number; }
  bool isString() const { return type_ == Type::String; }
  bool isArray() const { return type_ == Type::Array; }
  bool isObject() const { return type_ == Type::Object; }

  bool asBool() const { check(Type::Bool); return bool_; }
  double asDouble() const { check(Type::Number); return num_; }
  int64_t asInt() const { check(Type::Number); return static_cast<int64_t>(num_); }
  const std::string& asString() const { check(Type::String); return str_; }
  const JsonArray& asArray() const { check(Type::Array); return arr_; }
  JsonArray& asArray() { check(Type::Array); return arr_; }
  const JsonObject& asObject() const { check(Type::Object); return obj_; }
  JsonObject& asObject() { check(Type::Object); return obj_; }

  bool contains(const std::string& key) const {
    return type_ == Type::Object && obj_.count(key) > 0;
  }
  const Json& at(const std::string& key) const {
    check(Type::Object);
    auto it = obj_.find(key);
    if (it == obj_.end()) {
      throw std::runtime_error("Json: missing key " + key);
    }
    return it->second;
  }
  Json& operator[](const std::string& key) {
    if (type_ == Type::Null) { type_ = Type::Object; }
    check(Type::Object);
    return obj_[key];
  }
  const Json& operator[](size_t i) const { check(Type::Array); return arr_[i]; }
  size_t size() const {
    if (type_ == Type::Array) return arr_.size();
    if (type_ == Type::Object) return obj_.size();
    return 0;
  }

  // ---- serialization ------------------------------------------------------
  std::string dump() const {
    std::ostringstream os;
    write(os);
    return os.str();
  }

  static Json parse(const std::string& text) {
    size_t pos = 0;
    Json v = parseValue(text, pos);
    skipWs(text, pos);
    if (pos != text.size()) {
      throw std::runtime_error("Json: trailing characters at " + std::to_string(pos));
    }
    return v;
  }

 private:
  void check(Type t) const {
    if (type_ != t) { throw std::runtime_error("Json: wrong type access"); }
  }

  void write(std::ostringstream& os) const {
    switch (type_) {
      case Type::Null: os << "null"; break;
      case Type::Bool: os << (bool_ ? "true" : "false"); break;
      case Type::Number: {
        if (std::isfinite(num_) && num_ == static_cast<int64_t>(num_) &&
            std::abs(num_) < 1e15) {
          os << static_cast<int64_t>(num_);
        } else {
          std::ostringstream tmp;
          tmp.precision(17);
          tmp << num_;
          os << tmp.str();
        }
        break;
      }
      case Type::String: writeString(os, str_); break;
      case Type::Array: {
        os << '[';
        for (size_t i = 0; i < arr_.size(); ++i) {
          if (i) os << ',';
          arr_[i].write(os);
        }
        os << ']';
        break;
      }
      case Type::Object: {
        os << '{';
        bool first = true;
        for (const auto& kv : obj_) {
          if (!first) os << ',';
          first = false;
          writeString(os, kv.first);
          os << ':';
          kv.second.write(os);
        }
        os << '}';
        break;
      }
    }
  }

  static void writeString(std::ostringstream& os, const std::string& s) {
    os << '"';
    for (char c : s) {
      switch (c) {
        case '"': os << "\\\""; break;
        case '\\': os << "\\\\"; break;
        case '\n': os << "\\n"; break;
        case '\r': os << "\\r"; break;
        case '\t': os << "\\t"; break;
        default:
          if (static_cast<unsigned char>(c) < 0x20) {
            char buf[8];
            snprintf(buf, sizeof(buf), "\\u%04x", c);
            os << buf;
          } else {
            os << c;
          }
      }
    }
    os << '"';
  }

  static void skipWs(const std::string& t, size_t& p) {
    while (p < t.size() && (t[p] == ' ' || t[p] == '\t' || t[p] == '\n' || t[p] == '\r')) ++p;
  }

  static Json parseValue(const std::string& t, size_t& p) {
    skipWs(t, p);
    if (p >= t.size()) throw std::runtime_error("Json: unexpected end");
    char c = t[p];
    if (c == '{') return parseObject(t, p);
    if (c == '[') return parseArray(t, p);
    if (c == '"') return Json(parseString(t, p));
    if (c == 't') { expect(t, p, "true"); return Json(true); }
    if (c == 'f') { expect(t, p, "false"); return Json(false); }
    if (c == 'n') { expect(t, p, "null"); return Json(); }
    return parseNumber(t, p);
  }

  static void expect(const std::string& t, size_t& p, const char* lit) {
    size_t n = strlen(lit);
    if (t.compare(p, n, lit) != 0) {
      throw std::runtime_error("Json: bad literal at " + std::to_string(p));
    }
    p += n;
  }

  static Json parseNumber(const std::string& t, size_t& p) {
    size_t start = p;
    if (p < t.size() && (t[p] == '-' || t[p] == '+')) ++p;
    while (p < t.size() &&
           (isdigit(t[p]) || t[p] == '.' || t[p] == 'e' || t[p] == 'E' ||
            t[p] == '-' || t[p] == '+')) {
      ++p;
    }
    if (p == start) throw std::runtime_error("Json: bad number");
    return Json(std::stod(t.substr(start, p - start)));
  }

  static std::string parseString(const std::string& t, size_t& p) {
    assert(t[p] == '"');
    ++p;
    std::string out;
    while (p < t.size() && t[p] != '"') {
      char c = t[p];
      if (c == '\\') {
        ++p;
        if (p >= t.size()) break;
        char e = t[p];
        switch (e) {
          case '"': out += '"'; break;
          case '\\': out += '\\'; break;
          case '/': out += '/'; break;
          case 'n': out += '\n'; break;
          case 'r': out += '\r'; break;
          case 't': out += '\t'; break;
          case 'b': out += '\b'; break;
          case 'f': out += '\f'; break;
          case 'u': {
            if (p + 4 < t.size()) {
              int code = std::stoi(t.substr(p + 1, 4), nullptr, 16);
              if (code < 0x80) {
                out += static_cast<char>(code);
              } else if (code < 0x800) {
                out += static_cast<char>(0xC0 | (code >> 6));
                out += static_cast<char>(0x80 | (code & 0x3F));
              } else {
                out += static_cast<char>(0xE0 | (code >> 12));
                out += static_cast<char>(0x80 | ((code >> 6) & 0x3F));
                out += static_cast<char>(0x80 | (code & 0x3F));
              }
              p += 4;
            }
            break;
          }
          default: out += e;
        }
        ++p;
      } else {
        out += c;
        ++p;
      }
    }
    if (p >= t.size()) throw std::runtime_error("Json: unterminated string");
    ++p;  // closing quote
    return out;
  }

  static Json parseArray(const std::string& t, size_t& p) {
    ++p;  // [
    JsonArray arr;
    skipWs(t, p);
    if (p < t.size() && t[p] == ']') { ++p; return Json(std::move(arr)); }
    while (true) {
      arr.push_back(parseValue(t, p));
      skipWs(t, p);
      if (p >= t.size()) throw std::runtime_error("Json: unterminated array");
      if (t[p] == ',') { ++p; continue; }
      if (t[p] == ']') { ++p; break; }
      throw std::runtime_error("Json: bad array at " + std::to_string(p));
    }
    return Json(std::move(arr));
  }

  static Json parseObject(const std::string& t, size_t& p) {
    ++p;  // {
    JsonObject obj;
    skipWs(t, p);
    if (p < t.size() && t[p] == '}') { ++p; return Json(std::move(obj)); }
    while (true) {
      skipWs(t, p);
      if (p >= t.size() || t[p] != '"') {
        throw std::runtime_error("Json: expected key at " + std::to_string(p));
      }
      std::string key = parseString(t, p);
      skipWs(t, p);
      if (p >= t.size() || t[p] != ':') {
        throw std::runtime_error("Json: expected ':' at " + std::to_string(p));
      }
      ++p;
      obj[key] = parseValue(t, p);
      skipWs(t, p);
      if (p >= t.size()) throw std::runtime_error("Json: unterminated object");
      if (t[p] == ',') { ++p; continue; }
      if (t[p] == '}') { ++p; break; }
      throw std::runtime_error("Json: bad object at " + std::to_string(p));
    }
    return Json(std::move(obj));
  }

  Type type_;
  bool bool_ = false;
  double num_ = 0;
  std::string str_;
  JsonArray arr_;
  JsonObject obj_;
};

}  // namespace reagent
