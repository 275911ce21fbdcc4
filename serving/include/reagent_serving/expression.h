// Tiny arithmetic-expression evaluator over named variables.
//
// Reference: RASP embeds exprtk for reward functions and the Expression
// operator (serving/reagent/serving/operators/Expression.cpp,
// core/DecisionService.cpp:63-90). This recursive-descent evaluator covers
// + - * / ^, parentheses, unary minus, numeric literals, variables, and the
// functions min/max/abs/exp/log/sqrt.
#pragma once

#include <cmath>
#include <functional>
#include <map>
#include <stdexcept>
#include <string>
#include <vector>

namespace reagent {

class Expression {
 public:
  explicit Expression(std::string text) : text_(std::move(text)) {}

  double eval(const std::map<std::string, double>& vars) const {
    size_t pos = 0;
    double v = parseExpr(text_, pos, vars);
    skipWs(text_, pos);
    if (pos != text_.size()) {
      throw std::runtime_error("Expression: trailing input in '" + text_ + "'");
    }
    return v;
  }

 private:
  static void skipWs(const std::string& t, size_t& p) {
    while (p < t.size() && isspace(static_cast<unsigned char>(t[p]))) ++p;
  }

  static double parseExpr(const std::string& t, size_t& p,
                          const std::map<std::string, double>& vars) {
    double v = parseTerm(t, p, vars);
    while (true) {
      skipWs(t, p);
      if (p < t.size() && (t[p] == '+' || t[p] == '-')) {
        char op = t[p++];
        double rhs = parseTerm(t, p, vars);
        v = (op == '+') ? v + rhs : v - rhs;
      } else {
        return v;
      }
    }
  }

  static double parseTerm(const std::string& t, size_t& p,
                          const std::map<std::string, double>& vars) {
    double v = parsePow(t, p, vars);
    while (true) {
      skipWs(t, p);
      if (p < t.size() && (t[p] == '*' || t[p] == '/')) {
        char op = t[p++];
        double rhs = parsePow(t, p, vars);
        v = (op == '*') ? v * rhs : v / rhs;
      } else {
        return v;
      }
    }
  }

  static double parsePow(const std::string& t, size_t& p,
                         const std::map<std::string, double>& vars) {
    double base = parseUnary(t, p, vars);
    skipWs(t, p);
    if (p < t.size() && t[p] == '^') {
      ++p;
      double exp = parsePow(t, p, vars);  // right associative
      return std::pow(base, exp);
    }
    return base;
  }

  static double parseUnary(const std::string& t, size_t& p,
                           const std::map<std::string, double>& vars) {
    skipWs(t, p);
    if (p < t.size() && t[p] == '-') { ++p; return -parseUnary(t, p, vars); }
    if (p < t.size() && t[p] == '+') { ++p; return parseUnary(t, p, vars); }
    return parseAtom(t, p, vars);
  }

  static double parseAtom(const std::string& t, size_t& p,
                          const std::map<std::string, double>& vars) {
    skipWs(t, p);
    if (p >= t.size()) throw std::runtime_error("Expression: unexpected end");
    if (t[p] == '(') {
      ++p;
      double v = parseExpr(t, p, vars);
      skipWs(t, p);
      if (p >= t.size() || t[p] != ')') throw std::runtime_error("Expression: missing )");
      ++p;
      return v;
    }
    if (isdigit(static_cast<unsigned char>(t[p])) || t[p] == '.') {
      size_t start = p;
      while (p < t.size() &&
             (isdigit(static_cast<unsigned char>(t[p])) || t[p] == '.' ||
              t[p] == 'e' || t[p] == 'E' ||
              ((t[p] == '-' || t[p] == '+') && (t[p - 1] == 'e' || t[p - 1] == 'E')))) {
        ++p;
      }
      return std::stod(t.substr(start, p - start));
    }
    // identifier: variable or function call
    size_t start = p;
    while (p < t.size() &&
           (isalnum(static_cast<unsigned char>(t[p])) || t[p] == '_')) {
      ++p;
    }
    std::string name = t.substr(start, p - start);
    if (name.empty()) {
      throw std::runtime_error("Expression: bad token at " + std::to_string(p));
    }
    skipWs(t, p);
    if (p < t.size() && t[p] == '(') {
      ++p;
      std::vector<double> args;
      skipWs(t, p);
      if (p < t.size() && t[p] == ')') {
        ++p;
      } else {
        while (true) {
          args.push_back(parseExpr(t, p, vars));
          skipWs(t, p);
          if (p < t.size() && t[p] == ',') { ++p; continue; }
          if (p < t.size() && t[p] == ')') { ++p; break; }
          throw std::runtime_error("Expression: bad call args");
        }
      }
      return applyFn(name, args);
    }
    auto it = vars.find(name);
    if (it == vars.end()) {
      throw std::runtime_error("Expression: unknown variable " + name);
    }
    return it->second;
  }

  static double applyFn(const std::string& name, const std::vector<double>& a) {
    if (name == "abs" && a.size() == 1) return std::fabs(a[0]);
    if (name == "exp" && a.size() == 1) return std::exp(a[0]);
    if (name == "log" && a.size() == 1) return std::log(a[0]);
    if (name == "sqrt" && a.size() == 1) return std::sqrt(a[0]);
    if (name == "min" && a.size() == 2) return std::min(a[0], a[1]);
    if (name == "max" && a.size() == 2) return std::max(a[0], a[1]);
    throw std::runtime_error("Expression: unknown function " + name);
  }

  std::string text_;
};

}  // namespace reagent
