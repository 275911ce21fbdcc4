// The decision service: request -> DAG -> ranked actions; feedback -> reward
// -> online operator updates.
//
// Reference: serving/reagent/serving/core/DecisionService.cpp —
// attachIdAndProcess (:33-61), computeRewardAndLogFeedback (:63-129),
// DiskConfigProvider for plan loading.
#pragma once

#include <atomic>
#include <chrono>
#include <dirent.h>
#include <fstream>
#include <memory>
#include <mutex>
#include <sstream>

#include "reagent_serving/containers.h"
#include "reagent_serving/expression.h"
#include "reagent_serving/log_joiner.h"
#include "reagent_serving/operator.h"
#include "reagent_serving/operator_runner.h"
#include "reagent_serving/operators.h"
#include "reagent_serving/real_time_counter.h"

namespace reagent {

// Loads decision plans (JSON) from a directory (reference DiskConfigProvider).
class DiskConfigProvider {
 public:
  explicit DiskConfigProvider(std::string dir) : dir_(std::move(dir)) {}

  std::map<std::string, DecisionConfig> loadAll() const {
    std::map<std::string, DecisionConfig> plans;
    DIR* d = opendir(dir_.c_str());
    if (!d) return plans;
    struct dirent* e;
    while ((e = readdir(d)) != nullptr) {
      std::string fname = e->d_name;
      if (fname.size() < 6 || fname.substr(fname.size() - 5) != ".json") continue;
      std::ifstream f(dir_ + "/" + fname);
      std::stringstream ss;
      ss << f.rdbuf();
      try {
        plans[fname.substr(0, fname.size() - 5)] =
            DecisionConfig::fromJson(Json::parse(ss.str()));
      } catch (const std::exception&) {
        // skip malformed plans
      }
    }
    closedir(d);
    return plans;
  }

 private:
  std::string dir_;
};

class DecisionService {
 public:
  DecisionService(std::shared_ptr<RealTimeCounter> counter,
                  std::shared_ptr<ActionValueScorer> scorer,
                  std::shared_ptr<InMemoryLogJoiner> logJoiner,
                  std::shared_ptr<SharedParameterHandler> sharedParameterHandler =
                      std::make_shared<SharedParameterHandler>())
      : counter_(std::move(counter)),
        scorer_(std::move(scorer)),
        logJoiner_(std::move(logJoiner)),
        sharedParameterHandler_(std::move(sharedParameterHandler)) {}

  void createPlan(const std::string& name, const DecisionConfig& config) {
    std::lock_guard<std::mutex> g(mu_);
    Plan plan;
    plan.config = config;
    OperatorContext ctx{counter_.get(), scorer_.get(), sharedParameterHandler_.get()};
    StringOperatorDataMap constants;
    for (const auto& kv : config.constants) constants[kv.first] = kv.second;
    for (const auto& def : config.operators) {
      plan.operators.push_back(OperatorFactory::instance().create(
          def.opName, def.name, name, constants, ctx));
    }
    plans_[name] = std::move(plan);
  }

  void loadPlansFrom(const DiskConfigProvider& provider) {
    for (const auto& kv : provider.loadAll()) createPlan(kv.first, kv.second);
  }

  bool hasPlan(const std::string& name) {
    std::lock_guard<std::mutex> g(mu_);
    return plans_.count(name) > 0;
  }

  // Reference DecisionService.cpp:33-61.
  DecisionResponse attachIdAndProcess(DecisionRequest request) {
    auto t0 = std::chrono::steady_clock::now();
    if (request.requestId.empty()) {
      request.requestId = "req-" + std::to_string(nextId_++);
    }
    Plan* plan;
    {
      std::lock_guard<std::mutex> g(mu_);
      auto it = plans_.find(request.planName);
      if (it == plans_.end()) {
        throw std::runtime_error("Unknown plan: " + request.planName);
      }
      plan = &it->second;
    }
    StringOperatorDataMap outputs = runner_.run(
        plan->operators, plan->config.operators, plan->config.constants, request);

    // the output node is the last operator in the plan
    const std::string& outputNode = plan->config.operators.back().name;
    const Json& ranked = outputs.at(outputNode);

    DecisionResponse response;
    response.requestId = request.requestId;
    response.planName = request.planName;
    int n = plan->config.numActionsToChoose;
    if (ranked.isArray()) {
      for (size_t i = 0; i < ranked.size() && static_cast<int>(i) < n; ++i) {
        ActionDetails a;
        a.name = ranked[i].at("name").asString();
        a.propensity = ranked[i].at("propensity").asDouble();
        response.actions.push_back(a);
      }
    } else if (ranked.isObject()) {
      // terminal operator emitted a score map (e.g. Softmax as root):
      // rank by score descending, scores serve as propensities
      std::vector<std::pair<std::string, double>> scored;
      for (const auto& kv : ranked.asObject()) {
        scored.emplace_back(kv.first, kv.second.asDouble());
      }
      std::sort(scored.begin(), scored.end(),
                [](const auto& a, const auto& b) { return a.second > b.second; });
      for (size_t i = 0; i < scored.size() && static_cast<int>(i) < n; ++i) {
        ActionDetails a;
        a.name = scored[i].first;
        a.propensity = scored[i].second;
        response.actions.push_back(a);
      }
    }
    response.durationMs =
        std::chrono::duration<double, std::milli>(
            std::chrono::steady_clock::now() - t0)
            .count();

    {
      std::lock_guard<std::mutex> g(mu_);
      plan->history[request.requestId] = {outputs, ranked};
    }
    logJoiner_->logDecision(request, response, outputs);
    return response;
  }

  // Reference DecisionService.cpp:63-129.
  void computeRewardAndLogFeedback(Feedback feedback) {
    Plan* plan;
    {
      std::lock_guard<std::mutex> g(mu_);
      auto it = plans_.find(feedback.planName);
      if (it == plans_.end()) {
        throw std::runtime_error("Unknown plan: " + feedback.planName);
      }
      plan = &it->second;
    }
    if (!feedback.computedReward) {
      double reward;
      if (!plan->config.rewardFunction.empty()) {
        Expression expr(plan->config.rewardFunction);
        reward = expr.eval(feedback.metrics);
      } else if (plan->config.rewardAggregator == "max") {
        reward = -1e300;
        for (const auto& kv : feedback.metrics) reward = std::max(reward, kv.second);
      } else {  // sum (default)
        reward = 0;
        for (const auto& kv : feedback.metrics) reward += kv.second;
      }
      feedback.computedReward = reward;
    }
    // deliver feedback to each operator with its past inputs/output
    PastDecision past;
    bool found = false;
    {
      std::lock_guard<std::mutex> g(mu_);
      auto it = plan->history.find(feedback.requestId);
      if (it != plan->history.end()) {
        past = it->second;
        found = true;
      }
    }
    if (found) {
      for (size_t i = 0; i < plan->operators.size(); ++i) {
        const auto& def = plan->config.operators[i];
        StringOperatorDataMap pastInputs;
        for (const auto& dep : def.inputDepMap) {
          auto oit = past.outputs.find(dep.second);
          if (oit != past.outputs.end()) pastInputs[dep.first] = oit->second;
        }
        const Json& pastOutput = past.outputs.count(def.name)
                                     ? past.outputs.at(def.name)
                                     : past.finalOutput;
        plan->operators[i]->giveFeedback(feedback, pastInputs, pastOutput);
      }
    }
    logJoiner_->logFeedback(feedback);
  }

 private:
  struct PastDecision {
    StringOperatorDataMap outputs;
    Json finalOutput;
  };
  struct Plan {
    DecisionConfig config;
    std::vector<std::shared_ptr<Operator>> operators;
    std::unordered_map<std::string, PastDecision> history;
  };

  std::shared_ptr<RealTimeCounter> counter_;
  std::shared_ptr<ActionValueScorer> scorer_;
  std::shared_ptr<InMemoryLogJoiner> logJoiner_;
  std::shared_ptr<SharedParameterHandler> sharedParameterHandler_;
  OperatorRunner runner_;
  std::mutex mu_;
  std::map<std::string, Plan> plans_;
  std::atomic<int64_t> nextId_{1};
};

}  // namespace reagent
