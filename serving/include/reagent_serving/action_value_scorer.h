// Model scorer: loads the reagent_tpu export artifact and runs the MLP.
//
// Reference: serving/reagent/serving/core/PytorchActionValueScorer.cpp:11-91 —
// loads TorchScript by model id, builds dense (value, presence) input from the
// request context, returns action -> Q map.  Here the artifact is the
// framework-free (manifest.json + weights.bin) export produced by
// reagent_tpu/prediction/predictor_wrapper.py, and the forward pass plus the
// normalization (CONTINUOUS/BINARY) is implemented natively.
#pragma once

#include <cmath>
#include <cstdio>
#include <fstream>
#include <map>
#include <mutex>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

#include "reagent_serving/containers.h"
#include "reagent_serving/json.h"

namespace reagent {

class ActionValueScorer {
 public:
  virtual ~ActionValueScorer() = default;
  // context features: feature_id -> value; returns action name -> score.
  virtual StringDoubleMap predict(const std::map<int64_t, double>& contextFeatures,
                                  const std::string& modelPath) = 0;
};

struct NormalizationParam {
  std::string featureType;
  double mean = 0, stddev = 1;
  double boxcoxLambda = 0, boxcoxShift = 0;
  bool hasBoxcox = false;
  std::vector<double> quantiles;
  std::vector<int64_t> possibleValues;
  double minValue = 0, maxValue = 0;
};

// Loads + caches exported MLP artifacts; plain C++ forward pass.
class MlpActionValueScorer : public ActionValueScorer {
 public:
  StringDoubleMap predict(const std::map<int64_t, double>& contextFeatures,
                          const std::string& modelPath) override {
    const Model& m = load(modelPath);
    // build normalized input in sorted-feature order
    std::vector<double> x;
    x.reserve(m.sortedFeatures.size());
    for (size_t i = 0; i < m.sortedFeatures.size(); ++i) {
      int64_t fid = m.sortedFeatures[i];
      auto it = contextFeatures.find(fid);
      double present = (it != contextFeatures.end()) ? 1.0 : 0.0;
      double raw = present ? it->second : 0.0;
      x.push_back(normalize(raw, m.norm.at(fid)) * present);
    }
    // forward
    std::vector<double> h = x;
    for (size_t l = 0; l < m.layers.size(); ++l) {
      const Layer& L = m.layers[l];
      std::vector<double> out(L.out, 0.0);
      for (int j = 0; j < L.out; ++j) {
        double acc = L.bias[j];
        for (int i = 0; i < L.in; ++i) acc += h[i] * L.kernel[i * L.out + j];
        out[j] = acc;
      }
      const std::string& act = m.activations[l];
      if (act == "relu") {
        for (auto& v : out) v = v > 0 ? v : 0;
      } else if (act == "leaky_relu") {
        for (auto& v : out) v = v > 0 ? v : 0.01 * v;
      } else if (act == "tanh") {
        for (auto& v : out) v = std::tanh(v);
      }
      h = std::move(out);
    }
    StringDoubleMap result;
    for (size_t a = 0; a < m.actionNames.size() && a < h.size(); ++a) {
      result[m.actionNames[a]] = h[a];
    }
    return result;
  }

 private:
  struct Layer {
    int in = 0, out = 0;
    std::vector<float> kernel;  // [in * out], row major
    std::vector<float> bias;
  };
  struct Model {
    std::vector<std::string> actionNames;
    std::vector<int64_t> sortedFeatures;
    std::unordered_map<int64_t, NormalizationParam> norm;
    std::vector<Layer> layers;
    std::vector<std::string> activations;
  };

  static double normalize(double v, const NormalizationParam& p) {
    if (p.featureType == "BINARY") return v != 0 ? 1.0 : 0.0;
    if (p.featureType == "PROBABILITY") {
      double c = std::min(std::max(v, 1e-5), 1 - 1e-5);
      return -std::log(1.0 / c - 1.0);
    }
    if (p.featureType == "BOXCOX" && p.hasBoxcox) {
      double shifted = std::max(v + p.boxcoxShift, 1e-6);
      double bx = (std::pow(shifted, p.boxcoxLambda) - 1.0) / p.boxcoxLambda;
      return clamp((bx - p.mean) / p.stddev);
    }
    if (p.featureType == "QUANTILE" && !p.quantiles.empty()) {
      const auto& q = p.quantiles;
      if (v <= q.front()) return 0.0;
      if (v >= q.back()) return 1.0;
      size_t k = 0;
      while (k + 1 < q.size() && q[k + 1] <= v) ++k;
      double frac = (v - q[k]) / std::max(q[k + 1] - q[k], 1e-6);
      return clamp((k + frac) / (q.size() - 1));
    }
    if (p.featureType == "DO_NOT_PREPROCESS") return v;
    // CONTINUOUS default
    return clamp((v - p.mean) / p.stddev);
  }

  static double clamp(double v) {
    const double M = 11.513;
    return std::min(std::max(v, -M), M);
  }

  const Model& load(const std::string& path) {
    std::lock_guard<std::mutex> g(mu_);
    auto it = cache_.find(path);
    if (it != cache_.end()) return it->second;

    std::ifstream mf(path + "/manifest.json");
    if (!mf) throw std::runtime_error("cannot open " + path + "/manifest.json");
    std::stringstream ss;
    ss << mf.rdbuf();
    Json manifest = Json::parse(ss.str());

    Model m;
    for (const auto& a : manifest.at("action_names").asArray()) {
      m.actionNames.push_back(a.asString());
    }
    for (const auto& f : manifest.at("sorted_features").asArray()) {
      m.sortedFeatures.push_back(f.asInt());
    }
    for (const auto& kv : manifest.at("normalization").asObject()) {
      Json p = Json::parse(kv.second.asString());
      NormalizationParam np;
      np.featureType = p.at("feature_type").asString();
      if (p.contains("mean") && p.at("mean").isNumber()) np.mean = p.at("mean").asDouble();
      if (p.contains("stddev") && p.at("stddev").isNumber()) np.stddev = p.at("stddev").asDouble();
      if (p.contains("boxcox_lambda") && p.at("boxcox_lambda").isNumber()) {
        np.boxcoxLambda = p.at("boxcox_lambda").asDouble();
        np.hasBoxcox = true;
      }
      if (p.contains("boxcox_shift") && p.at("boxcox_shift").isNumber()) {
        np.boxcoxShift = p.at("boxcox_shift").asDouble();
      }
      if (p.contains("quantiles") && p.at("quantiles").isArray()) {
        for (const auto& q : p.at("quantiles").asArray()) np.quantiles.push_back(q.asDouble());
      }
      m.norm[std::stoll(kv.first)] = np;
    }
    for (const auto& a : manifest.at("activations").asArray()) {
      m.activations.push_back(a.asString());
    }

    std::ifstream wf(path + "/weights.bin", std::ios::binary);
    if (!wf) throw std::runtime_error("cannot open " + path + "/weights.bin");
    for (const auto& lj : manifest.at("layers").asArray()) {
      Layer L;
      L.in = static_cast<int>(lj.at("in").asInt());
      L.out = static_cast<int>(lj.at("out").asInt());
      L.kernel.resize(static_cast<size_t>(L.in) * L.out);
      L.bias.resize(L.out);
      wf.read(reinterpret_cast<char*>(L.kernel.data()), L.kernel.size() * sizeof(float));
      wf.read(reinterpret_cast<char*>(L.bias.data()), L.bias.size() * sizeof(float));
      if (!wf) throw std::runtime_error("weights.bin truncated");
      m.layers.push_back(std::move(L));
    }
    auto [ins, ok] = cache_.emplace(path, std::move(m));
    return ins->second;
  }

  std::mutex mu_;
  std::unordered_map<std::string, Model> cache_;
};

}  // namespace reagent
