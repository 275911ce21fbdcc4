// The operator library.
//
// Reference: serving/reagent/serving/operators/*.cpp — Ucb (UCB1 with
// real-time counters + batched feedback, Ucb.cpp:36-111), EpsilonGreedyRanker,
// SoftmaxRanker, Softmax, Frechet (Frechet-sort exploration), PropensityFit,
// Expression (exprtk there), ActionValueScoring, InputFromRequest.
#pragma once

#include <algorithm>
#include <cmath>
#include <mutex>
#include <random>

#include "reagent_serving/action_value_scorer.h"
#include "reagent_serving/expression.h"
#include "reagent_serving/operator.h"
#include "reagent_serving/real_time_counter.h"

namespace reagent {

inline StringDoubleMap toDoubleMap(const Json& j) {
  StringDoubleMap m;
  for (const auto& kv : j.asObject()) m[kv.first] = kv.second.asDouble();
  return m;
}

inline Json fromDoubleMap(const StringDoubleMap& m) {
  JsonObject o;
  for (const auto& kv : m) o[kv.first] = Json(kv.second);
  return Json(o);
}

// ranked action list encoding: [{"name":..., "propensity":...}, ...]
inline Json rankedActionList(
    const std::vector<std::pair<std::string, double>>& actions) {
  JsonArray arr;
  for (const auto& a : actions) {
    Json e;
    e["name"] = a.first;
    e["propensity"] = a.second;
    arr.push_back(e);
  }
  return Json(arr);
}

// ---------------------------------------------------------------------------

class InputFromRequest : public Operator {
 public:
  InputFromRequest(const std::string& name, const std::string& planName,
                   const StringOperatorDataMap& constants, const OperatorContext&)
      : Operator(name, planName, constants) {}

  OperatorData run(const DecisionRequest& request,
                   const StringOperatorDataMap&) override {
    return request.input;
  }
};

class Softmax : public Operator {
 public:
  Softmax(const std::string& name, const std::string& planName,
          const StringOperatorDataMap& constants, const OperatorContext&)
      : Operator(name, planName, constants) {}

  OperatorData run(const DecisionRequest&,
                   const StringOperatorDataMap& in) override {
    double temp = in.count("temperature") ? in.at("temperature").asDouble() : 1.0;
    StringDoubleMap values = toDoubleMap(in.at("values"));
    double maxV = -1e300;
    for (const auto& kv : values) maxV = std::max(maxV, kv.second / temp);
    double z = 0;
    StringDoubleMap out;
    for (const auto& kv : values) {
      double e = std::exp(kv.second / temp - maxV);
      out[kv.first] = e;
      z += e;
    }
    for (auto& kv : out) kv.second /= z;
    return fromDoubleMap(out);
  }
};

class SoftmaxRanker : public Operator {
 public:
  SoftmaxRanker(const std::string& name, const std::string& planName,
                const StringOperatorDataMap& constants, const OperatorContext&)
      : Operator(name, planName, constants), gen_(std::random_device{}()) {}

  // Sample a full ranking by iterative softmax (reference SoftmaxRanker.cpp).
  OperatorData run(const DecisionRequest&,
                   const StringOperatorDataMap& in) override {
    double temp = in.count("temperature") ? in.at("temperature").asDouble() : 1.0;
    StringDoubleMap values = toDoubleMap(in.at("values"));
    std::vector<std::pair<std::string, double>> ranked;
    std::lock_guard<std::mutex> g(mu_);
    while (!values.empty()) {
      double maxV = -1e300;
      for (const auto& kv : values) maxV = std::max(maxV, kv.second / temp);
      std::vector<std::string> names;
      std::vector<double> probs;
      double z = 0;
      for (const auto& kv : values) {
        names.push_back(kv.first);
        double e = std::exp(kv.second / temp - maxV);
        probs.push_back(e);
        z += e;
      }
      std::discrete_distribution<int> dist(probs.begin(), probs.end());
      int pick = dist(gen_);
      ranked.push_back({names[pick], probs[pick] / z});
      values.erase(names[pick]);
    }
    return rankedActionList(ranked);
  }

 private:
  std::mutex mu_;
  std::mt19937 gen_;
};

class EpsilonGreedyRanker : public Operator {
 public:
  EpsilonGreedyRanker(const std::string& name, const std::string& planName,
                      const StringOperatorDataMap& constants, const OperatorContext&)
      : Operator(name, planName, constants), gen_(std::random_device{}()) {}

  OperatorData run(const DecisionRequest&,
                   const StringOperatorDataMap& in) override {
    double epsilon = in.count("epsilon") ? in.at("epsilon").asDouble() : 0.1;
    StringDoubleMap values = toDoubleMap(in.at("values"));
    std::vector<std::pair<std::string, double>> ranked;
    std::lock_guard<std::mutex> g(mu_);
    std::uniform_real_distribution<double> unif(0, 1);
    while (!values.empty()) {
      size_t n = values.size();
      std::string pick;
      double prop;
      if (unif(gen_) < epsilon) {
        std::uniform_int_distribution<size_t> d(0, n - 1);
        auto it = values.begin();
        std::advance(it, d(gen_));
        pick = it->first;
        prop = epsilon / n;
      } else {
        auto best = std::max_element(
            values.begin(), values.end(),
            [](const auto& a, const auto& b) { return a.second < b.second; });
        pick = best->first;
        prop = (1 - epsilon) + epsilon / n;
      }
      ranked.push_back({pick, prop});
      values.erase(pick);
    }
    return rankedActionList(ranked);
  }

 private:
  std::mutex mu_;
  std::mt19937 gen_;
};

class Frechet : public Operator {
 public:
  Frechet(const std::string& name, const std::string& planName,
          const StringOperatorDataMap& constants, const OperatorContext&)
      : Operator(name, planName, constants), gen_(std::random_device{}()) {}

  // Frechet-sort exploration: perturb scores with Gumbel(0, 1/shape) noise
  // and sort descending (reference operators/Frechet.cpp).
  OperatorData run(const DecisionRequest&,
                   const StringOperatorDataMap& in) override {
    double shape = in.count("rho") ? in.at("rho").asDouble()
                   : (in.count("shape") ? in.at("shape").asDouble() : 1.0);
    StringDoubleMap values = toDoubleMap(in.at("values"));
    std::vector<std::pair<std::string, double>> perturbed;
    {
      std::lock_guard<std::mutex> g(mu_);
      std::uniform_real_distribution<double> unif(1e-12, 1.0);
      for (const auto& kv : values) {
        double gumbel = -std::log(-std::log(unif(gen_))) / shape;
        perturbed.push_back({kv.first, std::log(std::max(kv.second, 1e-12)) + gumbel});
      }
    }
    std::sort(perturbed.begin(), perturbed.end(),
              [](const auto& a, const auto& b) { return a.second > b.second; });
    std::vector<std::pair<std::string, double>> ranked;
    for (const auto& p : perturbed) ranked.push_back({p.first, 1.0});
    return rankedActionList(ranked);
  }

 private:
  std::mutex mu_;
  std::mt19937 gen_;
};

class ExpressionOp : public Operator {
 public:
  ExpressionOp(const std::string& name, const std::string& planName,
               const StringOperatorDataMap& constants, const OperatorContext&)
      : Operator(name, planName, constants) {}

  // equation applied per action over map-valued variables
  // (reference operators/Expression.cpp).
  OperatorData run(const DecisionRequest&,
                   const StringOperatorDataMap& in) override {
    std::string eq = in.at("equation").asString();
    Expression expr(eq);
    // collect variable maps: every other input is a {action: value} map
    std::map<std::string, StringDoubleMap> varMaps;
    std::vector<std::string> actions;
    for (const auto& kv : in) {
      if (kv.first == "equation") continue;
      varMaps[kv.first] = toDoubleMap(kv.second);
      if (actions.empty()) {
        for (const auto& av : varMaps[kv.first]) actions.push_back(av.first);
      }
    }
    StringDoubleMap out;
    for (const auto& action : actions) {
      std::map<std::string, double> vars;
      for (const auto& vm : varMaps) {
        auto it = vm.second.find(action);
        vars[vm.first] = it == vm.second.end() ? 0.0 : it->second;
      }
      out[action] = expr.eval(vars);
    }
    return fromDoubleMap(out);
  }
};

class Ucb : public Operator {
 public:
  Ucb(const std::string& name, const std::string& planName,
      const StringOperatorDataMap& constants, const OperatorContext& ctx)
      : Operator(name, planName, constants),
        counter_(ctx.counter),
        gen_(std::random_device{}()) {}

  std::string armKey(const std::string& arm) const {
    return planName_ + "/" + name_ + "/" + arm;
  }
  std::string batchKey(const std::string& arm) const {
    return planName_ + "/" + name_ + "/batch/" + arm;
  }

  // UCB1 (reference Ucb.cpp:36-90).
  OperatorData run(const DecisionRequest& request,
                   const StringOperatorDataMap& in) override {
    std::string method =
        in.count("method") ? in.at("method").asString() : "UCB1";
    if (method != "UCB1") {
      throw std::runtime_error("Only UCB1 is implemented");
    }
    std::vector<std::string> arms = request.actionNames;
    int64_t totalPulls = 0;
    std::vector<double> mean(arms.size()), pulls(arms.size());
    std::vector<std::string> armsWithoutPulls;
    for (size_t a = 0; a < arms.size(); ++a) {
      auto key = armKey(arms[a]);
      mean[a] = counter_->getMean(key);
      pulls[a] = static_cast<double>(counter_->getNumSamples(key));
      totalPulls += static_cast<int64_t>(pulls[a]);
      if (pulls[a] == 0) armsWithoutPulls.push_back(arms[a]);
    }
    std::string armToPull;
    double propensity = 1.0;
    if (armsWithoutPulls.empty()) {
      double logTotal = std::log(static_cast<double>(totalPulls));
      double best = -1e300;
      for (size_t a = 0; a < arms.size(); ++a) {
        double score = mean[a] + std::sqrt(2 * logTotal / pulls[a]);
        if (score > best) { best = score; armToPull = arms[a]; }
      }
    } else {
      std::lock_guard<std::mutex> g(mu_);
      std::uniform_int_distribution<size_t> d(0, armsWithoutPulls.size() - 1);
      armToPull = armsWithoutPulls[d(gen_)];
      propensity = 1.0 / armsWithoutPulls.size();
    }
    return rankedActionList({{armToPull, propensity}});
  }

  // Batched counter updates (reference Ucb.cpp:94-111).
  void giveFeedback(const Feedback& feedback,
                    const StringOperatorDataMap& pastInputs,
                    const OperatorData& pastOutput) override {
    int batchSize = 1;
    if (pastInputs.count("batch_size")) {
      batchSize = static_cast<int>(pastInputs.at("batch_size").asInt());
    }
    if (!feedback.computedReward || !pastOutput.isArray() || pastOutput.size() == 0) {
      return;
    }
    std::string armName = pastOutput[0].at("name").asString();
    counter_->addValue(batchKey(armName), *feedback.computedReward);
    if (counter_->getNumSamples(batchKey(armName)) % batchSize == 0) {
      counter_->addValue(armKey(armName), counter_->getMean(batchKey(armName)));
      counter_->clear(batchKey(armName));
    }
  }

  double getArmExpectation(const std::string& arm) {
    return counter_->getMean(armKey(arm));
  }

 private:
  RealTimeCounter* counter_;
  std::mutex mu_;
  std::mt19937 gen_;
};

class PropensityFit : public Operator {
 public:
  PropensityFit(const std::string& name, const std::string& planName,
                const StringOperatorDataMap& constants, const OperatorContext& ctx)
      : Operator(name, planName, constants),
        counter_(ctx.counter),
        sharedParameterHandler_(ctx.sharedParameterHandler) {}

  // Shift scores so realized serving propensities approach targets.  Shifts
  // live in the SharedParameterHandler so replicas share one online state
  // (reference operators/PropensityFit.cpp:30,72-110).
  OperatorData run(const DecisionRequest&,
                   const StringOperatorDataMap& in) override {
    StringDoubleMap input = toDoubleMap(in.at("input"));
    StringDoubleMap shifts = sharedParameterHandler_->getValues(parameterName());
    StringDoubleMap out;
    for (const auto& kv : input) {
      auto it = shifts.find(kv.first);
      out[kv.first] = kv.second + (it == shifts.end() ? 0.0 : it->second);
    }
    return fromDoubleMap(out);
  }

  void giveFeedback(const Feedback& feedback,
                    const StringOperatorDataMap& pastInputs,
                    const OperatorData&) override {
    // move the shift of the served action toward the target propensity
    if (!pastInputs.count("targets") || feedback.actionName.empty()) return;
    StringDoubleMap targets = toDoubleMap(pastInputs.at("targets"));
    auto it = targets.find(feedback.actionName);
    if (it == targets.end()) return;
    counter_->addValue(shiftKey(feedback.actionName), it->second - 1.0);
    const std::string pname = parameterName();
    if (sharedParameterHandler_->acquireLockToModifyParameter(pname)) {
      StringDoubleMap shifts = sharedParameterHandler_->getValues(pname);
      shifts[feedback.actionName] = counter_->getMean(shiftKey(feedback.actionName));
      sharedParameterHandler_->updateParameter(pname, shifts);
      sharedParameterHandler_->releaseParameter(pname);
    }
  }

  double getShift(const std::string& action) {
    auto shifts = sharedParameterHandler_->getValues(parameterName());
    auto it = shifts.find(action);
    return it == shifts.end() ? 0.0 : it->second;
  }

 private:
  std::string parameterName() const {
    return "Parameter_Store_" + planName_ + "/" + name_;
  }
  std::string shiftKey(const std::string& action) const {
    return planName_ + "/" + name_ + "/shift/" + action;
  }
  RealTimeCounter* counter_;
  SharedParameterHandler* sharedParameterHandler_;
};

class ActionValueScoring : public Operator {
 public:
  ActionValueScoring(const std::string& name, const std::string& planName,
                     const StringOperatorDataMap& constants, const OperatorContext& ctx)
      : Operator(name, planName, constants), scorer_(ctx.scorer) {}

  // Score the request's context features with the exported model
  // (reference core/PytorchActionValueScorer.cpp:11-91).
  OperatorData run(const DecisionRequest& request,
                   const StringOperatorDataMap& in) override {
    std::string modelPath = in.at("model_path").asString();
    std::map<int64_t, double> contextFeatures;
    if (request.input.isObject() && request.input.contains("context_features")) {
      for (const auto& kv : request.input.at("context_features").asObject()) {
        contextFeatures[std::stoll(kv.first)] = kv.second.asDouble();
      }
    }
    return fromDoubleMap(scorer_->predict(contextFeatures, modelPath));
  }

 private:
  ActionValueScorer* scorer_;
};

REGISTER_OPERATOR(InputFromRequest, "InputFromRequest")
REGISTER_OPERATOR(Softmax, "Softmax")
REGISTER_OPERATOR(SoftmaxRanker, "SoftmaxRanker")
REGISTER_OPERATOR(EpsilonGreedyRanker, "EpsilonGreedyRanker")
REGISTER_OPERATOR(Frechet, "Frechet")
REGISTER_OPERATOR(ExpressionOp, "Expression")
REGISTER_OPERATOR(Ucb, "Ucb")
REGISTER_OPERATOR(PropensityFit, "PropensityFit")
REGISTER_OPERATOR(ActionValueScoring, "ActionValueScoring")

}  // namespace reagent
