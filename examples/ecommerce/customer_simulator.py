"""E-commerce demo: a simulated customer population hitting the decision service.

Reference: serving/examples/ecommerce/customer_simulator.py + docs/rasp_tutorial.rst
(heuristic plan baseline ~0.363 average reward over 1000 requests).

Usage:
    # 1. author plans
    python -m examples.ecommerce.customer_simulator --make-plans --plans-dir plans/
    # 2. run the C++ server:  serving/build/reagent_serving --plans plans/
    # 3. simulate:
    python -m examples.ecommerce.customer_simulator --simulate --port 3000
"""

from __future__ import annotations

import argparse
import os
import random

from reagent_tpu.serving import (
    DecisionPlanBuilder,
    DecisionServiceClient,
    EpsilonGreedyRanker,
    Expression,
    InputFromRequest,
    SoftmaxRanker,
    Ucb,
    export_plan,
)

# Three store layouts; customers prefer "electronics" with p=0.6 etc.
ACTIONS = ["electronics", "clothing", "groceries"]
PURCHASE_PROBS = {"electronics": 0.5, "clothing": 0.25, "groceries": 0.35}


def make_plans(plans_dir: str) -> None:
    os.makedirs(plans_dir, exist_ok=True)

    # heuristic: rank fixed scores through softmax exploration
    heuristic = (
        DecisionPlanBuilder()
        .set_root(
            SoftmaxRanker(
                values=Expression(equation="x", x=InputFromRequest()), temperature=0.2
            )
        )
        .set_reward_function("purchase")
    )
    export_plan(heuristic, os.path.join(plans_dir, "heuristic.json"))

    # multi-armed bandit: online UCB1
    mab = (
        DecisionPlanBuilder()
        .set_root(Ucb(method="UCB1", batch_size=4))
        .set_reward_function("purchase")
    )
    export_plan(mab, os.path.join(plans_dir, "multi_armed_bandit.json"))

    # epsilon-greedy over request-supplied scores
    egreedy = (
        DecisionPlanBuilder()
        .set_root(EpsilonGreedyRanker(values=InputFromRequest(), epsilon=0.1))
        .set_reward_function("purchase")
    )
    export_plan(egreedy, os.path.join(plans_dir, "epsilon_greedy.json"))
    print(f"wrote plans to {plans_dir}")


def simulate(plan: str, port: int, num_requests: int, seed: int = 0) -> float:
    rng = random.Random(seed)
    client = DecisionServiceClient(port=port)
    assert client.healthy(), "decision service is not running"
    total_reward = 0.0
    for i in range(num_requests):
        scores = {a: rng.random() for a in ACTIONS}
        resp = client.request(plan, ACTIONS, input=scores)
        action = resp["actions"][0]["name"]
        purchase = 1.0 if rng.random() < PURCHASE_PROBS[action] else 0.0
        total_reward += purchase
        client.feedback(resp["request_id"], plan, action, {"purchase": purchase})
    avg = total_reward / num_requests
    print(f"plan={plan} avg reward over {num_requests} requests: {avg:.3f}")
    return avg


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--make-plans", action="store_true")
    p.add_argument("--plans-dir", default="plans")
    p.add_argument("--simulate", action="store_true")
    p.add_argument("--plan", default="multi_armed_bandit")
    p.add_argument("--port", type=int, default=3000)
    p.add_argument("--num-requests", type=int, default=1000)
    args = p.parse_args()
    if args.make_plans:
        make_plans(args.plans_dir)
    if args.simulate:
        simulate(args.plan, args.port, args.num_requests)
