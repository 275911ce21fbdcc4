// C++ serving tests (reference: serving/reagent/serving/test/*_test.cpp,
// gtest there; plain asserts here to stay dependency-free).
#include <atomic>
#include <cassert>
#include <cmath>
#include <iostream>
#include <sstream>
#include <thread>

#include "reagent_serving/decision_service.h"
#include "reagent_serving/expression.h"
#include "reagent_serving/json.h"
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

void testJson() {
  Json j = Json::parse(R"({"a": 1.5, "b": [1, 2, "x"], "c": {"d": true}, "e": null})");
  CHECK_NEAR(j.at("a").asDouble(), 1.5, 1e-12);
  CHECK(j.at("b").size() == 3);
  CHECK(j.at("b")[2].asString() == "x");
  CHECK(j.at("c").at("d").asBool());
  CHECK(j.at("e").isNull());
  Json round = Json::parse(j.dump());
  CHECK_NEAR(round.at("a").asDouble(), 1.5, 1e-12);
  // escapes
  Json s = Json::parse(R"("a\"b\nc")");
  CHECK(s.asString() == "a\"b\nc");
  std::cout << "testJson OK" << std::endl;
}

void testExpression() {
  Expression e("reward * 2 + max(a, b) - abs(-3)");
  double v = e.eval({{"reward", 1.5}, {"a", 1.0}, {"b", 4.0}});
  CHECK_NEAR(v, 3.0 + 4.0 - 3.0, 1e-12);
  CHECK_NEAR(Expression("2 ^ 3 ^ 2").eval({}), 512.0, 1e-9);  // right assoc
  CHECK_NEAR(Expression("(1 + 2) * 3 / 2").eval({}), 4.5, 1e-12);
  std::cout << "testExpression OK" << std::endl;
}

void testSoftmaxOperator() {
  OperatorContext ctx;
  Softmax op("smx", "plan", {}, ctx);
  StringOperatorDataMap in;
  in["temperature"] = Json(1.0);
  in["values"] = Json(JsonObject{{"a", Json(1.0)}, {"b", Json(1.0)}});
  DecisionRequest req;
  Json out = op.run(req, in);
  CHECK_NEAR(out.at("a").asDouble(), 0.5, 1e-9);
  std::cout << "testSoftmaxOperator OK" << std::endl;
}

void testUcbConvergence() {
  // UCB1 should concentrate pulls on the best arm
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

  int bestPulls = 0;
  for (int t = 0; t < 400; ++t) {
    DecisionRequest req;
    req.planName = "mab";
    req.actionNames = {"bad", "good"};
    DecisionResponse resp = service.attachIdAndProcess(req);
    CHECK(resp.actions.size() == 1);
    bool good = resp.actions[0].name == "good";
    if (t >= 300 && good) bestPulls++;
    Feedback fb;
    fb.requestId = resp.requestId;
    fb.planName = "mab";
    fb.actionName = resp.actions[0].name;
    fb.metrics["reward"] = good ? 1.0 : 0.1;
    service.computeRewardAndLogFeedback(fb);
  }
  CHECK(bestPulls > 80);  // >80% of the last 100 pulls on the good arm
  std::cout << "testUcbConvergence OK (" << bestPulls << "/100 on best arm)"
            << std::endl;
}

void testDagAndExpression() {
  auto counter = std::make_shared<LocalRealTimeCounter>();
  auto scorer = std::make_shared<MlpActionValueScorer>();
  auto joiner = std::make_shared<InMemoryLogJoiner>();
  DecisionService service(counter, scorer, joiner);

  // input -> expression(double it) -> softmax ranker
  Json plan;
  plan["operators"] = Json(JsonArray{
      Json(JsonObject{{"name", Json("inp")}, {"op_name", Json("InputFromRequest")}}),
      Json(JsonObject{
          {"name", Json("doubled")},
          {"op_name", Json("Expression")},
          {"input_dep_map",
           Json(JsonObject{{"equation", Json("eq")}, {"x", Json("inp")}})},
      }),
      Json(JsonObject{
          {"name", Json("ranked")},
          {"op_name", Json("EpsilonGreedyRanker")},
          {"input_dep_map",
           Json(JsonObject{{"values", Json("doubled")}, {"epsilon", Json("eps")}})},
      }),
  });
  plan["constants"] = Json(JsonObject{{"eq", Json("x * 2")}, {"eps", Json(0.0)}});
  plan["num_actions_to_choose"] = Json(2);
  service.createPlan("dag", DecisionConfig::fromJson(plan));

  DecisionRequest req;
  req.planName = "dag";
  req.actionNames = {"a", "b"};
  req.input = Json(JsonObject{{"a", Json(1.0)}, {"b", Json(3.0)}});
  DecisionResponse resp = service.attachIdAndProcess(req);
  CHECK(resp.actions.size() == 2);
  CHECK(resp.actions[0].name == "b");  // greedy: 3*2 > 1*2
  std::cout << "testDagAndExpression OK" << std::endl;
}

void testLogJoiner() {
  InMemoryLogJoiner joiner;
  int joined = 0;
  joiner.registerJoinedCallback([&](const DecisionWithFeedback& dwf) {
    joined++;
    CHECK(dwf.feedback.has_value());
    CHECK(dwf.request.requestId == dwf.feedback->requestId);
  });
  DecisionRequest req;
  req.requestId = "r1";
  DecisionResponse resp;
  resp.requestId = "r1";
  joiner.logDecision(req, resp, {});
  CHECK(joiner.numPending() == 1);
  Feedback fb;
  fb.requestId = "r1";
  joiner.logFeedback(fb);
  CHECK(joined == 1);
  CHECK(joiner.numPending() == 0);
  std::cout << "testLogJoiner OK" << std::endl;
}

static void test_shared_parameter_handler() {
  reagent::SharedParameterHandler handler;
  // unknown parameter reads as empty (auto-registered on first touch)
  CHECK(handler.getValues("shifts").empty());
  CHECK(handler.acquireLockToModifyParameter("shifts"));
  handler.updateParameter("shifts", {{"action_a", 0.5}, {"action_b", -0.25}});
  handler.releaseParameter("shifts");
  auto values = handler.getValues("shifts");
  CHECK(values.size() == 2);
  CHECK(values.at("action_a") == 0.5);
  // second writer can't take the lock while the first holds it
  CHECK(handler.acquireLockToModifyParameter("shifts"));
  CHECK(!handler.acquireLockToModifyParameter("shifts"));
  handler.releaseParameter("shifts");
  // updating a never-seen parameter throws
  bool threw = false;
  try {
    handler.updateParameter("never_seen", {{"x", 1.0}});
  } catch (const std::exception&) {
    threw = true;
  }
  CHECK(threw);
  // concurrent readers while a writer updates (smoke for data races)
  std::atomic<bool> stop{false};
  std::thread writer([&] {
    for (int i = 0; i < 1000; i++) {
      handler.updateParameter("shifts", {{"action_a", double(i)}});
    }
    stop = true;
  });
  std::thread reader([&] {
    while (!stop) {
      auto v = handler.getValues("shifts");
      CHECK(v.empty() || v.count("action_a"));
    }
  });
  writer.join();
  stop = true;
  reader.join();
  std::cout << "test_shared_parameter_handler OK" << std::endl;
}

int main() {
  testJson();
  testExpression();
  testSoftmaxOperator();
  testLogJoiner();
  testDagAndExpression();
  testUcbConvergence();
  test_shared_parameter_handler();
  std::cout << "ALL SERVING TESTS PASSED" << std::endl;
  return 0;
}
