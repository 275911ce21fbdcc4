"""Example decision-plan application: one plan per operator family.

Reference: serving/reagent/serving/config/applications/example/example.py —
author plans in python, export to JSON consumed by the C++ decision service.

Run:  python examples/decision_plans/example.py <output_dir>
Then: ./serving/build/reagent_serving --plans <output_dir>
"""

from __future__ import annotations

import sys

from reagent_tpu.serving import (
    DecisionPlanBuilder,
    EpsilonGreedyRanker,
    Frechet,
    InputFromRequest,
    Softmax,
    SoftmaxRanker,
    Ucb,
    export_plan,
)


def softmax_decision_plan():
    op = Softmax(temperature=1.0, values={"action1": 10.0, "action2": 20.0})
    return DecisionPlanBuilder().set_root(op).build()


def softmaxranker_decision_plan():
    op = SoftmaxRanker(temperature=1.0, values={"Bacon": 1.1, "Ribs": 1.0})
    return DecisionPlanBuilder().set_root(op).build()


def epsilongreedyranker_decision_plan():
    op = EpsilonGreedyRanker(epsilon=0.1, values={"action1": 10.0, "action2": 20.0})
    return DecisionPlanBuilder().set_root(op).build()


def frechet_decision_plan():
    op = Frechet(rho=0.5, gamma=1.0, values={"action1": 10.0, "action2": 20.0})
    return DecisionPlanBuilder().set_root(op).build()


def ucb_decision_plan():
    op = Ucb(method="UCB1")
    return DecisionPlanBuilder().set_root(op).build()


def input_from_request_decision_plan():
    op = Softmax(temperature=1.0, values=InputFromRequest())
    return DecisionPlanBuilder().set_root(op).build()


PLANS = {
    "softmax": softmax_decision_plan,
    "softmax_ranker": softmaxranker_decision_plan,
    "epsilon_greedy_ranker": epsilongreedyranker_decision_plan,
    "frechet": frechet_decision_plan,
    "ucb": ucb_decision_plan,
    "input_from_request": input_from_request_decision_plan,
}


def main(out_dir: str) -> None:
    import os

    os.makedirs(out_dir, exist_ok=True)
    for name, make in PLANS.items():
        export_plan(make(), f"{out_dir}/{name}.json")
        print(f"exported {out_dir}/{name}.json")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/reagent_tpu_plans")
