// Operator-DAG executor.
//
// Reference: serving/reagent/serving/core/OperatorRunner.cpp:8-85 — builds a
// cpp-taskflow graph from operator dependencies and runs nodes in parallel on
// a thread pool with a 30s timeout.  This implementation runs a topological
// wavefront on std::async tasks: every node whose inputs are ready executes
// concurrently; same dependency semantics, no third-party scheduler.
#pragma once

#include <chrono>
#include <future>
#include <map>
#include <memory>
#include <set>
#include <stdexcept>
#include <string>
#include <vector>

#include "reagent_serving/containers.h"
#include "reagent_serving/operator.h"

namespace reagent {

class OperatorRunner {
 public:
  explicit OperatorRunner(int timeoutSec = 30) : timeoutSec_(timeoutSec) {}

  // Returns every node's output keyed by node name.
  StringOperatorDataMap run(
      const std::vector<std::shared_ptr<Operator>>& operators,
      const std::vector<OperatorDefinition>& defs,
      const std::map<std::string, Json>& constants,
      const DecisionRequest& request) {
    std::map<std::string, std::shared_ptr<Operator>> opByName;
    for (const auto& op : operators) opByName[op->getName()] = op;

    StringOperatorDataMap outputs;
    for (const auto& kv : constants) outputs[kv.first] = kv.second;

    std::set<std::string> done;
    std::set<std::string> remaining;
    std::map<std::string, OperatorDefinition> defByName;
    for (const auto& d : defs) {
      remaining.insert(d.name);
      defByName[d.name] = d;
    }

    auto deadline =
        std::chrono::steady_clock::now() + std::chrono::seconds(timeoutSec_);

    while (!remaining.empty()) {
      // collect ready nodes
      std::vector<std::string> ready;
      for (const auto& name : remaining) {
        const auto& d = defByName[name];
        bool ok = true;
        for (const auto& dep : d.inputDepMap) {
          const std::string& src = dep.second;
          if (remaining.count(src) && src != name) { ok = false; break; }
          if (!outputs.count(src) && defByName.count(src)) { ok = false; break; }
          if (!outputs.count(src) && !defByName.count(src)) {
            throw std::runtime_error("Unknown dependency '" + src + "' of node " + name);
          }
        }
        if (ok) ready.push_back(name);
      }
      if (ready.empty()) {
        throw std::runtime_error("Operator DAG has a cycle or unmet dependency");
      }
      // run the wavefront in parallel (reference: taskflow threads)
      std::vector<std::future<std::pair<std::string, OperatorData>>> futures;
      for (const auto& name : ready) {
        const auto& d = defByName[name];
        StringOperatorDataMap namedInputs;
        for (const auto& dep : d.inputDepMap) {
          namedInputs[dep.first] = outputs.at(dep.second);
        }
        auto op = opByName.at(name);
        futures.push_back(std::async(
            std::launch::async,
            [op, namedInputs, &request, name]() {
              return std::make_pair(name, op->run(request, namedInputs));
            }));
      }
      for (auto& f : futures) {
        if (f.wait_until(deadline) != std::future_status::ready) {
          throw std::runtime_error("Operator DAG timed out");
        }
        auto [name, out] = f.get();
        outputs[name] = std::move(out);
        remaining.erase(name);
        done.insert(name);
      }
    }
    return outputs;
  }

 private:
  int timeoutSec_;
};

}  // namespace reagent
