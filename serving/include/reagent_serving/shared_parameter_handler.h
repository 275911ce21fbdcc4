// Shared-parameter store: operators publish/consume named parameter maps that
// evolve online (e.g. PropensityFit's learned shifts shared across replicas).
//
// Reference: serving/reagent/serving/core/SharedParameterHandler.{h,cpp} —
// a name -> {string: double} map with fetch timestamps; the reference's
// acquireLockToModifyParameter always returns true (single-process stub).
// Here the handler is actually thread-safe: a global mutex guards the map
// plus per-parameter try-locks so one writer updates while readers snapshot.
#pragma once

#include <ctime>
#include <memory>
#include <mutex>
#include <string>
#include <unordered_map>

#include "reagent_serving/containers.h"

namespace reagent {

class SharedParameterInfo {
 public:
  explicit SharedParameterInfo(std::string name) : name_(std::move(name)) {}

  time_t getLastFetchTime() const { return lastFetchTime_; }

  StringDoubleMap getValues() const {
    std::lock_guard<std::mutex> g(mu_);
    return values_;
  }

  void updateValues(StringDoubleMap values) {
    std::lock_guard<std::mutex> g(mu_);
    values_ = std::move(values);
    lastFetchTime_ = time(nullptr);
  }

  bool tryLock() { return writeLock_.try_lock(); }
  void unlock() { writeLock_.unlock(); }

 private:
  std::string name_;
  time_t lastFetchTime_ = 0;
  StringDoubleMap values_;
  mutable std::mutex mu_;
  std::mutex writeLock_;
};

class SharedParameterHandler {
 public:
  SharedParameterHandler() = default;
  virtual ~SharedParameterHandler() = default;

  virtual StringDoubleMap getValues(const std::string& name) {
    return info(name)->getValues();
  }

  virtual bool acquireLockToModifyParameter(const std::string& name) {
    return info(name)->tryLock();
  }

  virtual void releaseParameter(const std::string& name) {
    info(name)->unlock();
  }

  virtual void updateParameter(const std::string& name,
                               const StringDoubleMap& values) {
    std::shared_ptr<SharedParameterInfo> p;
    {
      std::lock_guard<std::mutex> g(mu_);
      auto it = parameters_.find(name);
      if (it == parameters_.end()) {
        throw std::runtime_error(
            "Tried to update a parameter that doesn't exist: " + name);
      }
      p = it->second;
    }
    p->updateValues(values);
  }

 protected:
  std::shared_ptr<SharedParameterInfo> info(const std::string& name) {
    std::lock_guard<std::mutex> g(mu_);
    auto it = parameters_.find(name);
    if (it == parameters_.end()) {
      it = parameters_
               .emplace(name, std::make_shared<SharedParameterInfo>(name))
               .first;
    }
    return it->second;
  }

  std::mutex mu_;
  std::unordered_map<std::string, std::shared_ptr<SharedParameterInfo>>
      parameters_;
};

}  // namespace reagent
