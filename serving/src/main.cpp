// RASP-equivalent CLI server.
//
// Reference: serving/reagent/serving/cli/Main.cpp:15-37 — wires
// DiskConfigProvider + scorer + InMemoryLogJoiner + LocalRealTimeCounter and
// serves POST /api/request + POST /api/feedback on port 3000.
#include <csignal>
#include <cstdlib>
#include <iostream>

#include "reagent_serving/decision_service.h"
#include "reagent_serving/http_server.h"

using namespace reagent;

static HttpServer* g_server = nullptr;

int main(int argc, char** argv) {
  int port = 3000;
  std::string planDir = "plans";
  std::string logFile;
  for (int i = 1; i < argc - 1; ++i) {
    std::string a = argv[i];
    if (a == "--port") port = std::atoi(argv[++i]);
    else if (a == "--plans") planDir = argv[++i];
    else if (a == "--log") logFile = argv[++i];
  }

  auto counter = std::make_shared<LocalRealTimeCounter>();
  auto scorer = std::make_shared<MlpActionValueScorer>();
  auto joiner = std::make_shared<InMemoryLogJoiner>(logFile);
  DecisionService service(counter, scorer, joiner);
  service.loadPlansFrom(DiskConfigProvider(planDir));

  HttpServer server(port);
  g_server = &server;
  server.route("/api/request", [&service](const std::string& body) {
    DecisionRequest req = DecisionRequest::fromJson(Json::parse(body));
    return service.attachIdAndProcess(req).toJson().dump();
  });
  server.route("/api/feedback", [&service](const std::string& body) {
    Feedback fb = Feedback::fromJson(Json::parse(body));
    service.computeRewardAndLogFeedback(fb);
    return std::string("{\"status\":\"ok\"}");
  });
  server.route("/healthz", [](const std::string&) {
    return std::string("{\"status\":\"healthy\"}");
  });

  if (!server.start()) {
    std::cerr << "Failed to bind port " << port << std::endl;
    return 1;
  }
  std::cout << "reagent-serving listening on 127.0.0.1:" << port
            << " (plans: " << planDir << ")" << std::endl;
  signal(SIGINT, [](int) { if (g_server) g_server->stop(); std::exit(0); });
  while (true) {
    std::this_thread::sleep_for(std::chrono::seconds(1));
  }
  return 0;
}
