// Real-time windowed counters for online bandit operators.
//
// Reference: serving/reagent/serving/core/RealTimeCounter.h +
// LocalRealTimeCounter — per-key sliding windows of observed values feeding
// UCB's mean/variance estimates.
#pragma once

#include <cmath>
#include <deque>
#include <mutex>
#include <string>
#include <unordered_map>

namespace reagent {

class RealTimeCounter {
 public:
  virtual ~RealTimeCounter() = default;
  virtual int64_t getNumSamples(const std::string& key) = 0;
  virtual double getMean(const std::string& key) = 0;
  virtual double getVariance(const std::string& key) = 0;
  virtual void addValue(const std::string& key, double value) = 0;
  virtual void clear(const std::string& key) = 0;
};

class LocalRealTimeCounter : public RealTimeCounter {
 public:
  explicit LocalRealTimeCounter(size_t windowSize = 100000)
      : windowSize_(windowSize) {}

  int64_t getNumSamples(const std::string& key) override {
    std::lock_guard<std::mutex> g(mu_);
    auto it = values_.find(key);
    return it == values_.end() ? 0 : static_cast<int64_t>(it->second.size());
  }

  double getMean(const std::string& key) override {
    std::lock_guard<std::mutex> g(mu_);
    auto it = values_.find(key);
    if (it == values_.end() || it->second.empty()) return 0.0;
    double s = 0;
    for (double v : it->second) s += v;
    return s / it->second.size();
  }

  double getVariance(const std::string& key) override {
    std::lock_guard<std::mutex> g(mu_);
    auto it = values_.find(key);
    if (it == values_.end() || it->second.size() < 2) return 0.0;
    double s = 0;
    for (double v : it->second) s += v;
    double mean = s / it->second.size();
    double var = 0;
    for (double v : it->second) var += (v - mean) * (v - mean);
    return var / (it->second.size() - 1);
  }

  void addValue(const std::string& key, double value) override {
    std::lock_guard<std::mutex> g(mu_);
    auto& dq = values_[key];
    dq.push_back(value);
    if (dq.size() > windowSize_) dq.pop_front();
  }

  void clear(const std::string& key) override {
    std::lock_guard<std::mutex> g(mu_);
    values_.erase(key);
  }

 private:
  size_t windowSize_;
  std::mutex mu_;
  std::unordered_map<std::string, std::deque<double>> values_;
};

}  // namespace reagent
