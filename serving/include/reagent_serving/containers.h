// Decision-service data model.
//
// Reference: serving/reagent/serving/core/Containers.h:81-272 —
// OperatorDefinition, Constant, DecisionConfig, DecisionRequest,
// DecisionResponse, Feedback, DecisionWithFeedback; serialized as JSON.
#pragma once

#include <map>
#include <optional>
#include <string>
#include <unordered_map>
#include <vector>

#include "reagent_serving/json.h"

namespace reagent {

// Operator input/output values: the dynamic value type flowing through the DAG.
using OperatorData = Json;
using StringOperatorDataMap = std::unordered_map<std::string, OperatorData>;
using StringDoubleMap = std::map<std::string, double>;

struct OperatorDefinition {
  std::string name;       // node name in the DAG
  std::string opName;     // registered operator type
  std::map<std::string, std::string> inputDepMap;  // input arg -> upstream node/constant

  static OperatorDefinition fromJson(const Json& j) {
    OperatorDefinition d;
    d.name = j.at("name").asString();
    d.opName = j.at("op_name").asString();
    if (j.contains("input_dep_map")) {
      for (const auto& kv : j.at("input_dep_map").asObject()) {
        d.inputDepMap[kv.first] = kv.second.asString();
      }
    }
    return d;
  }
};

struct ConstantValue {
  std::string name;
  Json value;
};

struct DecisionConfig {
  std::vector<OperatorDefinition> operators;
  std::map<std::string, Json> constants;
  std::string rewardFunction;        // expression over feedback metrics
  std::string rewardAggregator;      // "sum" | "max" (ref DecisionService.cpp:75)
  int numActionsToChoose = 1;

  static DecisionConfig fromJson(const Json& j) {
    DecisionConfig c;
    for (const auto& op : j.at("operators").asArray()) {
      c.operators.push_back(OperatorDefinition::fromJson(op));
    }
    if (j.contains("constants")) {
      for (const auto& kv : j.at("constants").asObject()) {
        // constants may be {"name":..., "value":...} or direct values
        if (kv.second.isObject() && kv.second.contains("value")) {
          c.constants[kv.first] = kv.second.at("value");
        } else {
          c.constants[kv.first] = kv.second;
        }
      }
    }
    if (j.contains("reward_function")) {
      c.rewardFunction = j.at("reward_function").asString();
    }
    if (j.contains("reward_aggregator")) {
      c.rewardAggregator = j.at("reward_aggregator").asString();
    }
    if (j.contains("num_actions_to_choose")) {
      c.numActionsToChoose = static_cast<int>(j.at("num_actions_to_choose").asInt());
    }
    return c;
  }
};

struct DecisionRequest {
  std::string requestId;    // attached by the service if absent
  std::string planName;
  std::vector<std::string> actionNames;
  Json input;               // free-form request payload (context features etc.)

  static DecisionRequest fromJson(const Json& j) {
    DecisionRequest r;
    if (j.contains("request_id")) r.requestId = j.at("request_id").asString();
    r.planName = j.at("plan_name").asString();
    if (j.contains("actions")) {
      const Json& acts = j.at("actions");
      if (acts.isObject() && acts.contains("names")) {
        for (const auto& a : acts.at("names").asArray()) {
          r.actionNames.push_back(a.asString());
        }
      } else if (acts.isArray()) {
        for (const auto& a : acts.asArray()) r.actionNames.push_back(a.asString());
      }
    }
    if (j.contains("input")) r.input = j.at("input");
    return r;
  }

  Json toJson() const {
    Json j;
    j["request_id"] = requestId;
    j["plan_name"] = planName;
    JsonArray names;
    for (const auto& a : actionNames) names.push_back(Json(a));
    j["actions"] = Json(JsonObject{{"names", Json(names)}});
    j["input"] = input;
    return j;
  }
};

struct ActionDetails {
  std::string name;
  double propensity = 0;
};

struct DecisionResponse {
  std::string requestId;
  std::string planName;
  std::vector<ActionDetails> actions;
  double durationMs = 0;

  Json toJson() const {
    Json j;
    j["request_id"] = requestId;
    j["plan_name"] = planName;
    JsonArray acts;
    for (const auto& a : actions) {
      Json aj;
      aj["name"] = a.name;
      aj["propensity"] = a.propensity;
      acts.push_back(aj);
    }
    j["actions"] = Json(acts);
    j["duration_ms"] = durationMs;
    return j;
  }
};

struct Feedback {
  std::string requestId;
  std::string planName;
  std::string actionName;
  StringDoubleMap metrics;  // metric name -> value
  std::optional<double> computedReward;

  static Feedback fromJson(const Json& j) {
    Feedback f;
    f.requestId = j.at("request_id").asString();
    if (j.contains("plan_name")) f.planName = j.at("plan_name").asString();
    if (j.contains("action_name")) f.actionName = j.at("action_name").asString();
    if (j.contains("metrics")) {
      for (const auto& kv : j.at("metrics").asObject()) {
        f.metrics[kv.first] = kv.second.asDouble();
      }
    }
    if (j.contains("computed_reward")) {
      f.computedReward = j.at("computed_reward").asDouble();
    }
    return f;
  }

  Json toJson() const {
    Json j;
    j["request_id"] = requestId;
    j["plan_name"] = planName;
    j["action_name"] = actionName;
    JsonObject m;
    for (const auto& kv : metrics) m[kv.first] = Json(kv.second);
    j["metrics"] = Json(m);
    if (computedReward) j["computed_reward"] = *computedReward;
    return j;
  }
};

struct DecisionWithFeedback {
  DecisionRequest request;
  DecisionResponse response;
  std::optional<Feedback> feedback;
};

}  // namespace reagent
