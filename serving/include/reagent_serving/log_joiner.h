// Decision/feedback log joining.
//
// Reference: serving/reagent/serving/core/LogJoiner.h + InMemoryLogJoiner.cpp
// — decisions and feedbacks arrive independently and are joined by request id;
// joined records are handed to a callback (and appendable to a log file).
#pragma once

#include <fstream>
#include <functional>
#include <mutex>
#include <optional>
#include <string>
#include <unordered_map>

#include "reagent_serving/containers.h"

namespace reagent {

class LogJoiner {
 public:
  using JoinedCallback = std::function<void(const DecisionWithFeedback&)>;

  virtual ~LogJoiner() = default;
  virtual void logDecision(const DecisionRequest& request,
                           const DecisionResponse& response,
                           const StringOperatorDataMap& operatorOutputs) = 0;
  virtual void logFeedback(const Feedback& feedback) = 0;
  void registerJoinedCallback(JoinedCallback cb) { callback_ = std::move(cb); }

 protected:
  JoinedCallback callback_;
};

class InMemoryLogJoiner : public LogJoiner {
 public:
  explicit InMemoryLogJoiner(const std::string& logFile = "")
      : logFile_(logFile) {}

  void logDecision(const DecisionRequest& request,
                   const DecisionResponse& response,
                   const StringOperatorDataMap& operatorOutputs) override {
    std::lock_guard<std::mutex> g(mu_);
    DecisionWithFeedback dwf;
    dwf.request = request;
    dwf.response = response;
    pending_[request.requestId] = std::move(dwf);
    (void)operatorOutputs;
  }

  void logFeedback(const Feedback& feedback) override {
    std::optional<DecisionWithFeedback> joined;
    {
      std::lock_guard<std::mutex> g(mu_);
      auto it = pending_.find(feedback.requestId);
      if (it == pending_.end()) {
        unjoinedFeedback_++;
        return;
      }
      it->second.feedback = feedback;
      joined = it->second;
      pending_.erase(it);
    }
    if (!logFile_.empty()) {
      std::lock_guard<std::mutex> g(mu_);
      std::ofstream f(logFile_, std::ios::app);
      Json j;
      j["request"] = joined->request.toJson();
      j["response"] = joined->response.toJson();
      j["feedback"] = joined->feedback->toJson();
      f << j.dump() << "\n";
    }
    if (callback_) callback_(*joined);
  }

  size_t numPending() {
    std::lock_guard<std::mutex> g(mu_);
    return pending_.size();
  }
  int64_t numUnjoinedFeedback() const { return unjoinedFeedback_; }

 private:
  std::string logFile_;
  std::mutex mu_;
  std::unordered_map<std::string, DecisionWithFeedback> pending_;
  int64_t unjoinedFeedback_ = 0;
};

}  // namespace reagent
