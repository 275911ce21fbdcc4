// Operator base + factory registry.
//
// Reference: serving/reagent/serving/core/Operator.h, OperatorFactory.h
// (REGISTER_OPERATOR macro, operators/Ucb.cpp:117).
#pragma once

#include <functional>
#include <memory>
#include <string>
#include <unordered_map>

#include "reagent_serving/containers.h"
#include "reagent_serving/shared_parameter_handler.h"

namespace reagent {

class DecisionService;  // fwd

class Operator {
 public:
  Operator(std::string name, std::string planName,
           const StringOperatorDataMap& constants)
      : name_(std::move(name)), planName_(std::move(planName)) {
    (void)constants;
  }
  virtual ~Operator() = default;

  // Execute with resolved named inputs; return the node's output value.
  virtual OperatorData run(const DecisionRequest& request,
                           const StringOperatorDataMap& namedInputs) = 0;

  // Online learning hook (reference core/DecisionService.cpp:91-129).
  virtual void giveFeedback(const Feedback& feedback,
                            const StringOperatorDataMap& pastInputs,
                            const OperatorData& pastOutput) {
    (void)feedback; (void)pastInputs; (void)pastOutput;
  }

  const std::string& getName() const { return name_; }

 protected:
  std::string name_;
  std::string planName_;
};

class RealTimeCounter;
class ActionValueScorer;

struct OperatorContext {
  RealTimeCounter* counter = nullptr;
  ActionValueScorer* scorer = nullptr;
  SharedParameterHandler* sharedParameterHandler = nullptr;
};

class OperatorFactory {
 public:
  using Creator = std::function<std::shared_ptr<Operator>(
      const std::string& name, const std::string& planName,
      const StringOperatorDataMap& constants, const OperatorContext& ctx)>;

  static OperatorFactory& instance() {
    static OperatorFactory f;
    return f;
  }

  void registerOp(const std::string& opName, Creator creator) {
    creators_[opName] = std::move(creator);
  }

  std::shared_ptr<Operator> create(const std::string& opName,
                                   const std::string& name,
                                   const std::string& planName,
                                   const StringOperatorDataMap& constants,
                                   const OperatorContext& ctx) const {
    auto it = creators_.find(opName);
    if (it == creators_.end()) {
      throw std::runtime_error("Unknown operator type: " + opName);
    }
    return it->second(name, planName, constants, ctx);
  }

  bool has(const std::string& opName) const { return creators_.count(opName) > 0; }

 private:
  std::unordered_map<std::string, Creator> creators_;
};

#define REGISTER_OPERATOR(CLASS, NAME)                                        \
  namespace {                                                                 \
  struct CLASS##Registrar {                                                   \
    CLASS##Registrar() {                                                      \
      ::reagent::OperatorFactory::instance().registerOp(                      \
          NAME,                                                               \
          [](const std::string& name, const std::string& planName,            \
             const ::reagent::StringOperatorDataMap& constants,               \
             const ::reagent::OperatorContext& ctx) {                         \
            return std::make_shared<CLASS>(name, planName, constants, ctx);   \
          });                                                                 \
    }                                                                         \
  };                                                                          \
  static CLASS##Registrar CLASS##_registrar_instance;                         \
  }
}  // namespace reagent
