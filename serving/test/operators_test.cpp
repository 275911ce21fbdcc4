// Per-operator tests + DAG robustness (reference:
// serving/reagent/serving/test/EpsilonGreedyRanker_test.cpp, Frechet_test.cpp,
// PropensityFit_test.cpp, InputFromRequest_test.cpp — gtest there; plain
// asserts here to stay dependency-free).
#include <atomic>
#include <cassert>
#include <chrono>
#include <cmath>
#include <iostream>
#include <map>
#include <thread>

#include "reagent_serving/decision_service.h"
#include "reagent_serving/json.h"
#include "reagent_serving/operator_runner.h"
#include "reagent_serving/operators.h"

using namespace reagent;

#define CHECK_NEAR(a, b, tol)                                              \
  do {                                                                     \
    if (std::fabs((a) - (b)) > (tol)) {                                    \
      std::cerr << "FAIL " << __LINE__ << ": " << (a) << " != " << (b)     \
                << std::endl;                                              \
      std::abort();                                                        \
    }                                                                      \
  } while (0)

#define CHECK(cond)                                                        \
  do {                                                                     \
    if (!(cond)) {                                                         \
      std::cerr << "FAIL " << __LINE__ << ": " #cond << std::endl;         \
      std::abort();                                                        \
    }                                                                      \
  } while (0)

void testInputFromRequest() {
  OperatorContext ctx;
  InputFromRequest op("inp", "plan", {}, ctx);
  DecisionRequest req;
  req.input = Json(JsonObject{{"k", Json(7.0)}});
  Json out = op.run(req, {});
  CHECK_NEAR(out.at("k").asDouble(), 7.0, 1e-12);
  std::cout << "testInputFromRequest OK" << std::endl;
}

void testEpsilonGreedyRankerGreedy() {
  // epsilon = 0: deterministic descending sort, propensity 1 - eps + eps/n
  OperatorContext ctx;
  EpsilonGreedyRanker op("egr", "plan", {}, ctx);
  StringOperatorDataMap in;
  in["epsilon"] = Json(0.0);
  in["values"] =
      Json(JsonObject{{"a", Json(1.0)}, {"b", Json(3.0)}, {"c", Json(2.0)}});
  DecisionRequest req;
  Json out = op.run(req, in);
  CHECK(out.size() == 3);
  CHECK(out[0].at("name").asString() == "b");
  CHECK(out[1].at("name").asString() == "c");
  CHECK(out[2].at("name").asString() == "a");
  CHECK_NEAR(out[0].at("propensity").asDouble(), 1.0, 1e-12);
  std::cout << "testEpsilonGreedyRankerGreedy OK" << std::endl;
}

void testEpsilonGreedyRankerExploration() {
  // epsilon = 1: first pick uniform over the 3 arms
  OperatorContext ctx;
  EpsilonGreedyRanker op("egr", "plan", {}, ctx);
  std::map<std::string, int> firstCounts;
  const int N = 900;
  for (int t = 0; t < N; ++t) {
    StringOperatorDataMap in;
    in["epsilon"] = Json(1.0);
    in["values"] =
        Json(JsonObject{{"a", Json(1.0)}, {"b", Json(3.0)}, {"c", Json(2.0)}});
    DecisionRequest req;
    Json out = op.run(req, in);
    firstCounts[out[0].at("name").asString()]++;
    CHECK_NEAR(out[0].at("propensity").asDouble(), 1.0 / 3.0, 1e-12);
  }
  for (const auto& kv : firstCounts) {
    CHECK(kv.second > N / 3 - 120 && kv.second < N / 3 + 120);
  }
  std::cout << "testEpsilonGreedyRankerExploration OK" << std::endl;
}

void testFrechetOrderingStatistics() {
  // strong shape -> ordering follows scores; weak shape -> heavy exploration
  OperatorContext ctx;
  DecisionRequest req;
  auto topCount = [&](double shape) {
    Frechet op("fr", "plan", {}, ctx);
    int best = 0;
    for (int t = 0; t < 500; ++t) {
      StringOperatorDataMap in;
      in["shape"] = Json(shape);
      in["values"] =
          Json(JsonObject{{"a", Json(1.0)}, {"b", Json(4.0)}, {"c", Json(2.0)}});
      Json out = op.run(req, in);
      if (out[0].at("name").asString() == "b") best++;
    }
    return best;
  };
  int strong = topCount(20.0);
  int weak = topCount(0.3);
  CHECK(strong > 470);           // gumbel noise /20 barely perturbs log-scores
  CHECK(weak < 450 && weak > 150);  // real exploration but still score-biased
  std::cout << "testFrechetOrderingStatistics OK (strong=" << strong
            << " weak=" << weak << ")" << std::endl;
}

void testPropensityFit() {
  auto counter = std::make_shared<LocalRealTimeCounter>();
  SharedParameterHandler handler;
  OperatorContext ctx;
  ctx.counter = counter.get();
  ctx.sharedParameterHandler = &handler;
  PropensityFit op("pf", "plan", {}, ctx);

  // before any feedback: identity
  StringOperatorDataMap in;
  in["input"] = Json(JsonObject{{"a", Json(1.0)}, {"b", Json(2.0)}});
  DecisionRequest req;
  Json out = op.run(req, in);
  CHECK_NEAR(out.at("a").asDouble(), 1.0, 1e-12);

  // feedback with target propensity 0.8 for the served action "a":
  // shift -> mean(target - 1) = -0.2
  Feedback fb;
  fb.actionName = "a";
  StringOperatorDataMap pastInputs;
  pastInputs["targets"] = Json(JsonObject{{"a", Json(0.8)}, {"b", Json(0.2)}});
  op.giveFeedback(fb, pastInputs, Json());
  CHECK_NEAR(op.getShift("a"), -0.2, 1e-9);

  out = op.run(req, in);
  CHECK_NEAR(out.at("a").asDouble(), 0.8, 1e-9);
  CHECK_NEAR(out.at("b").asDouble(), 2.0, 1e-12);

  // repeated feedback for "b" with target 0.2 -> shift -0.8
  fb.actionName = "b";
  op.giveFeedback(fb, pastInputs, Json());
  op.giveFeedback(fb, pastInputs, Json());
  CHECK_NEAR(op.getShift("b"), -0.8, 1e-9);
  std::cout << "testPropensityFit OK" << std::endl;
}

namespace {
class SleepOp : public Operator {
 public:
  using Operator::Operator;
  OperatorData run(const DecisionRequest&,
                   const StringOperatorDataMap&) override {
    std::this_thread::sleep_for(std::chrono::milliseconds(1500));
    return Json(1.0);
  }
};
}  // namespace

void testDagTimeout() {
  OperatorRunner runner(/*timeoutSec=*/1);
  auto op = std::make_shared<SleepOp>("slow", "plan", StringOperatorDataMap{});
  OperatorDefinition def;
  def.name = "slow";
  def.opName = "Sleep";
  DecisionRequest req;
  bool threw = false;
  try {
    runner.run({op}, {def}, {}, req);
  } catch (const std::exception& e) {
    threw = std::string(e.what()).find("timed out") != std::string::npos;
  }
  CHECK(threw);
  std::cout << "testDagTimeout OK" << std::endl;
}

void testConcurrentRequests() {
  // hammer one Ucb plan from 8 threads (request + feedback interleaved);
  // the service must stay consistent: every response carries a valid arm
  // and the decision/feedback log join stays balanced.
  auto counter = std::make_shared<LocalRealTimeCounter>();
  auto scorer = std::make_shared<MlpActionValueScorer>();
  auto joiner = std::make_shared<InMemoryLogJoiner>();
  DecisionService service(counter, scorer, joiner);

  Json plan;
  plan["operators"] = Json(JsonArray{Json(JsonObject{
      {"name", Json("ucb")},
      {"op_name", Json("Ucb")},
      {"input_dep_map", Json(JsonObject{{"method", Json("method")}})},
  })});
  plan["constants"] = Json(JsonObject{{"method", Json("UCB1")}});
  plan["reward_aggregator"] = Json("sum");
  service.createPlan("mab", DecisionConfig::fromJson(plan));

  const int kThreads = 8, kPerThread = 50;
  std::atomic<int> ok{0};
  std::vector<std::thread> threads;
  for (int t = 0; t < kThreads; ++t) {
    threads.emplace_back([&service, &ok] {
      for (int i = 0; i < kPerThread; ++i) {
        DecisionRequest req;
        req.planName = "mab";
        req.actionNames = {"x", "y", "z"};
        DecisionResponse resp = service.attachIdAndProcess(req);
        if (resp.actions.size() == 1 &&
            (resp.actions[0].name == "x" || resp.actions[0].name == "y" ||
             resp.actions[0].name == "z")) {
          ok++;
        }
        Feedback fb;
        fb.requestId = resp.requestId;
        fb.planName = "mab";
        fb.actionName = resp.actions[0].name;
        fb.metrics["reward"] = resp.actions[0].name == "y" ? 1.0 : 0.0;
        service.computeRewardAndLogFeedback(fb);
      }
    });
  }
  for (auto& th : threads) th.join();
  CHECK(ok == kThreads * kPerThread);
  CHECK(joiner->numPending() == 0);  // every decision joined with feedback
  std::cout << "testConcurrentRequests OK (" << ok << " requests)" << std::endl;
}

int main() {
  testInputFromRequest();
  testEpsilonGreedyRankerGreedy();
  testEpsilonGreedyRankerExploration();
  testFrechetOrderingStatistics();
  testPropensityFit();
  testDagTimeout();
  testConcurrentRequests();
  std::cout << "ALL OPERATOR TESTS PASSED" << std::endl;
  return 0;
}
