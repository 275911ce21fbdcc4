"""Combinatorial optimizers over discrete parameter spaces.

Reference: reagent/lite/optimizer.py:95-1686 — ComboOptimizerBase API
(sample_internal / update_params / optimize_step / best_solutions),
RandomSearch (:276), GumbelSoftmax (:557), PolicyGradient (:665),
QLearning (:797), Bayesian MLP ensembler (:1238); nevergrad wrapper (:368).

The parameter space is ``{name: [choice, ...]}`` (the reference uses
nevergrad's ng.p.Dict of Choices).  ``obj_func`` maps a dict of sampled
choice-index arrays to a [batch, 1] cost tensor (minimized).
"""

from __future__ import annotations

import heapq
import itertools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jax.Array

BATCH_SIZE = 512
MAX_NUM_BEST_SOLUTIONS = 50
ANNEAL_RATE = 0.9997


class BestResultsQueue:
    """Keep the k lowest-cost solutions (reference optimizer.py:95-126)."""

    def __init__(self, max_len: int = MAX_NUM_BEST_SOLUTIONS):
        self.max_len = max_len
        self._heap: List[Tuple[float, int, Dict]] = []  # max-heap by -cost
        self._counter = itertools.count()

    def insert(self, reward: float, sol: Dict) -> None:
        # store negative so heap root is the WORST kept solution
        heapq.heappush(self._heap, (-reward, next(self._counter), sol))
        if len(self._heap) > self.max_len:
            heapq.heappop(self._heap)

    def topk(self, k: int) -> List[Tuple[float, Dict]]:
        items = sorted(self._heap, key=lambda t: -t[0])
        return [(-neg, sol) for neg, _, sol in items[:k]]


class ComboOptimizerBase:
    def __init__(
        self,
        param: Dict[str, Sequence[Any]],
        obj_func: Optional[Callable[[Dict[str, Array]], Array]] = None,
        batch_size: int = BATCH_SIZE,
        seed: int = 0,
    ) -> None:
        self.param = {k: list(v) for k, v in param.items()}
        self.obj_func = obj_func
        self.batch_size = batch_size
        self.rng = np.random.default_rng(seed)
        self.jrng = jax.random.PRNGKey(seed)
        self.best_sols = BestResultsQueue()
        self.last_sample_internal_res = None
        self._init()

    def _init(self) -> None:
        pass

    def _next_key(self) -> Array:
        self.jrng, k = jax.random.split(self.jrng)
        return k

    # -- API (reference :177-275) -------------------------------------------

    def optimize_step(self) -> Tuple:
        assert self.obj_func is not None, "obj_func not provided"
        sampled = self.sample_internal(self.batch_size)
        sampled_solutions = sampled[0]
        cost = np.asarray(self.obj_func(sampled_solutions)).reshape(-1)
        self.update_params(jnp.asarray(cost))
        for i in range(len(cost)):
            self.best_sols.insert(
                float(cost[i]), {k: int(v[i]) for k, v in sampled_solutions.items()}
            )
        return sampled_solutions, cost

    def best_solutions(self, k: int = 1) -> List[Tuple[float, Dict]]:
        return self.best_sols.topk(k)

    def sample_internal(self, batch_size: Optional[int] = None) -> Tuple:
        raise NotImplementedError

    def update_params(self, cost: Array) -> None:
        raise NotImplementedError

    def sample(self, batch_size: int, temperature: float = 1.0) -> Dict[str, Array]:
        """Sample from the learned sampling distribution."""
        return self.sample_internal(batch_size)[0]

    def indices_to_raw_choices(self, sampled: Dict[str, Array]) -> List[Dict[str, Any]]:
        n = len(next(iter(sampled.values())))
        return [
            {k: self.param[k][int(sampled[k][i])] for k in sampled} for i in range(n)
        ]


class RandomSearchOptimizer(ComboOptimizerBase):
    """Uniform (or given-distribution) random sampling (reference :276-366)."""

    def __init__(self, param, obj_func=None, batch_size=BATCH_SIZE,
                 sampling_weights: Optional[Dict[str, np.ndarray]] = None, seed=0):
        self.sampling_weights = sampling_weights
        super().__init__(param, obj_func, batch_size, seed)

    def sample_internal(self, batch_size: Optional[int] = None) -> Tuple:
        bs = batch_size or self.batch_size
        sampled = {}
        for k, choices in self.param.items():
            if self.sampling_weights and k in self.sampling_weights:
                p = np.asarray(self.sampling_weights[k], dtype=np.float64)
                p = p / p.sum()
                sampled[k] = jnp.asarray(self.rng.choice(len(choices), bs, p=p))
            else:
                sampled[k] = jnp.asarray(self.rng.integers(0, len(choices), bs))
        self.last_sample_internal_res = (sampled,)
        return (sampled,)

    def update_params(self, cost: Array) -> None:
        pass  # random search learns nothing


class LogitBasedComboOptimizerBase(ComboOptimizerBase):
    """Learnable per-parameter logits (reference :499-555)."""

    def __init__(self, param, obj_func=None, batch_size=BATCH_SIZE,
                 learning_rate: float = 0.1, anneal_rate: float = 1.0,
                 temperature: float = 1.0, min_temperature: float = 0.1, seed=0):
        self.learning_rate = learning_rate
        self.anneal_rate = anneal_rate
        self.temperature = temperature
        self.min_temperature = min_temperature
        super().__init__(param, obj_func, batch_size, seed)

    def _init(self) -> None:
        self.logits = {
            k: jnp.zeros(len(v), jnp.float32) for k, v in self.param.items()
        }
        self.opt = optax.adam(self.learning_rate)
        self.opt_state = self.opt.init(self.logits)

    def sample(self, batch_size: int, temperature: float = 1.0) -> Dict[str, Array]:
        out = {}
        for k, logits in self.logits.items():
            out[k] = jax.random.categorical(
                self._next_key(), jnp.broadcast_to(logits / temperature, (batch_size, logits.shape[0])),
                axis=1,
            )
        return out


class GumbelSoftmaxOptimizer(LogitBasedComboOptimizerBase):
    """Differentiable sampling via Gumbel-softmax (reference :557-664).

    The objective must accept soft one-hot inputs; gradients flow through the
    relaxed samples into the logits.
    """

    def sample_internal(self, batch_size: Optional[int] = None) -> Tuple:
        bs = batch_size or self.batch_size
        key = self._next_key()
        soft = {}
        for i, (k, logits) in enumerate(self.logits.items()):
            g = -jnp.log(-jnp.log(
                jax.random.uniform(jax.random.fold_in(key, i), (bs, logits.shape[0]), minval=1e-20, maxval=1.0)
            ))
            soft[k] = jax.nn.softmax((logits + g) / self.temperature, axis=-1)
        self.last_sample_internal_res = (soft,)
        return (soft,)

    def optimize_step(self) -> Tuple:
        assert self.obj_func is not None
        bs = self.batch_size
        key = self._next_key()

        def loss_fn(logits):
            soft = {}
            for i, (k, lg) in enumerate(logits.items()):
                g = -jnp.log(-jnp.log(
                    jax.random.uniform(jax.random.fold_in(key, i), (bs, lg.shape[0]), minval=1e-20, maxval=1.0)
                ))
                soft[k] = jax.nn.softmax((lg + g) / self.temperature, axis=-1)
            cost = self.obj_func(soft)
            return jnp.mean(cost), soft

        (mean_cost, soft), grads = jax.value_and_grad(loss_fn, has_aux=True)(self.logits)
        updates, self.opt_state = self.opt.update(grads, self.opt_state, self.logits)
        self.logits = optax.apply_updates(self.logits, updates)
        self.temperature = max(self.temperature * self.anneal_rate, self.min_temperature)
        hard = {k: jnp.argmax(v, axis=1) for k, v in soft.items()}
        cost_arr = np.full(bs, float(mean_cost))
        for i in range(bs):
            self.best_sols.insert(float(mean_cost), {k: int(v[i]) for k, v in hard.items()})
        return hard, cost_arr

    def update_params(self, cost: Array) -> None:
        pass  # folded into optimize_step (gradient-through-sampling)


class PolicyGradientOptimizer(LogitBasedComboOptimizerBase):
    """REINFORCE over the sampling distribution (reference :665-795)."""

    def sample_internal(self, batch_size: Optional[int] = None) -> Tuple:
        bs = batch_size or self.batch_size
        sampled, log_probs = {}, []
        for k, logits in self.logits.items():
            idx = jax.random.categorical(
                self._next_key(), jnp.broadcast_to(logits, (bs, logits.shape[0])), axis=1
            )
            sampled[k] = idx
        self.last_sample_internal_res = (sampled,)
        return (sampled,)

    def update_params(self, cost: Array) -> None:
        sampled = self.last_sample_internal_res[0]
        cost = cost.reshape(-1)
        adv = cost - jnp.mean(cost)

        def loss_fn(logits):
            total = 0.0
            for k, lg in logits.items():
                logp = jax.nn.log_softmax(lg)
                total = total + jnp.mean(adv * logp[sampled[k]])
            return total  # minimize E[adv * logp] -> decrease prob of high cost

        grads = jax.grad(loss_fn)(self.logits)
        updates, self.opt_state = self.opt.update(grads, self.opt_state, self.logits)
        self.logits = optax.apply_updates(self.logits, updates)
        self.last_sample_internal_res = None


class QLearningOptimizer(ComboOptimizerBase):
    """Sequential choice as an MDP: pick params one at a time with a Q-net
    (reference :797-1046, simplified to a per-parameter independent Q table
    with epsilon-greedy exploration)."""

    def __init__(self, param, obj_func=None, batch_size=BATCH_SIZE,
                 learning_rate: float = 0.1, epsilon: float = 0.2, seed=0):
        self.learning_rate = learning_rate
        self.epsilon = epsilon
        super().__init__(param, obj_func, batch_size, seed)

    def _init(self) -> None:
        # Q[k][i] = expected -cost of choosing i for param k
        self.q = {k: np.zeros(len(v)) for k, v in self.param.items()}
        self.counts = {k: np.zeros(len(v)) for k, v in self.param.items()}

    def sample_internal(self, batch_size: Optional[int] = None) -> Tuple:
        bs = batch_size or self.batch_size
        sampled = {}
        for k, q in self.q.items():
            greedy = int(np.argmax(q))
            idx = np.where(
                self.rng.uniform(size=bs) < self.epsilon,
                self.rng.integers(0, len(q), bs),
                greedy,
            )
            sampled[k] = jnp.asarray(idx)
        self.last_sample_internal_res = (sampled,)
        return (sampled,)

    def update_params(self, cost: Array) -> None:
        sampled = self.last_sample_internal_res[0]
        cost = np.asarray(cost).reshape(-1)
        for k in self.q:
            idx = np.asarray(sampled[k])
            for i, c in zip(idx, cost):
                self.counts[k][i] += 1
                lr = self.learning_rate
                self.q[k][i] += lr * ((-c) - self.q[k][i])
        self.last_sample_internal_res = None

    def sample(self, batch_size: int, temperature: float = 1.0) -> Dict[str, Array]:
        return {
            k: jnp.full(batch_size, int(np.argmax(q)), jnp.int32)
            for k, q in self.q.items()
        }


class BayesianMLPEnsemblerOptimizer(ComboOptimizerBase):
    """Bayesian optimization with an MLP-ensemble surrogate (reference :1238).

    Acquisition: sample candidates, each ensemble member predicts cost, pick
    candidates with the lowest sampled predictions (Thompson-style).
    """

    def __init__(self, param, obj_func=None, batch_size=BATCH_SIZE,
                 num_ensemble: int = 5, candidate_pool: int = 1024,
                 learning_rate: float = 1e-2, train_steps: int = 20, seed=0):
        self.num_ensemble = num_ensemble
        self.candidate_pool = candidate_pool
        self.learning_rate = learning_rate
        self.train_steps = train_steps
        super().__init__(param, obj_func, batch_size, seed)

    def _init(self) -> None:
        self.dim = sum(len(v) for v in self.param.values())
        rng = np.random.default_rng(1)
        self.weights = [
            (rng.normal(0, 0.3, (self.dim, 32)), np.zeros(32),
             rng.normal(0, 0.3, (32, 1)), np.zeros(1))
            for _ in range(self.num_ensemble)
        ]
        self.xs: List[np.ndarray] = []
        self.ys: List[float] = []

    def _encode(self, sampled: Dict[str, Array]) -> np.ndarray:
        parts = []
        for k, choices in self.param.items():
            onehot = np.eye(len(choices))[np.asarray(sampled[k])]
            parts.append(onehot)
        return np.concatenate(parts, axis=1)

    def _predict(self, member, x):
        w1, b1, w2, b2 = member
        h = np.maximum(x @ w1 + b1, 0)
        return (h @ w2 + b2).reshape(-1)

    def _train_member(self, mi):
        x = np.stack(self.xs)
        y = np.array(self.ys)
        w1, b1, w2, b2 = self.weights[mi]
        # bootstrap resample per member
        idx = self.rng.integers(0, len(x), len(x))
        xb, yb = x[idx], y[idx]
        lr = self.learning_rate
        for _ in range(self.train_steps):
            h = np.maximum(xb @ w1 + b1, 0)
            pred = (h @ w2 + b2).reshape(-1)
            err = (pred - yb)[:, None] / len(xb)
            gw2 = h.T @ err
            gb2 = err.sum(0)
            gh = err @ w2.T * (h > 0)
            gw1 = xb.T @ gh
            gb1 = gh.sum(0)
            w1 -= lr * gw1; b1 -= lr * gb1; w2 -= lr * gw2; b2 -= lr * gb2
        self.weights[mi] = (w1, b1, w2, b2)

    def sample_internal(self, batch_size: Optional[int] = None) -> Tuple:
        bs = batch_size or self.batch_size
        # propose random candidates, rank by a random member's prediction
        cand = {
            k: jnp.asarray(self.rng.integers(0, len(v), self.candidate_pool))
            for k, v in self.param.items()
        }
        if self.xs:
            x = self._encode(cand)
            member = self.weights[self.rng.integers(0, self.num_ensemble)]
            pred = self._predict(member, x)
            order = np.argsort(pred)[:bs]
        else:
            order = np.arange(bs)
        sampled = {k: v[jnp.asarray(order)] for k, v in cand.items()}
        self.last_sample_internal_res = (sampled,)
        return (sampled,)

    def update_params(self, cost: Array) -> None:
        sampled = self.last_sample_internal_res[0]
        x = self._encode(sampled)
        y = np.asarray(cost).reshape(-1)
        self.xs.extend(list(x))
        self.ys.extend(list(y))
        for mi in range(self.num_ensemble):
            self._train_member(mi)
        self.last_sample_internal_res = None


class NeverGradOptimizer(ComboOptimizerBase):
    """Wrapper over nevergrad (reference :368-498); nevergrad is not baked
    into this image, so construction raises with a clear message."""

    def __init__(self, *args, **kwargs):
        try:
            import nevergrad  # noqa: F401
        except ImportError as e:
            raise ImportError(
                "nevergrad is not installed in this environment; use "
                "RandomSearchOptimizer / PolicyGradientOptimizer / "
                "BayesianMLPEnsemblerOptimizer instead"
            ) from e
        super().__init__(*args, **kwargs)


class LinearBayesianByBackprop:
    """Variational Bayesian linear regression head (reference :1418-1477).

    Each weight has a Gaussian posterior (mu, rho) trained by the local
    reparameterization trick; forward() draws one posterior sample.  Pure
    functional JAX: params live in a dict, forward/elbo are jittable.
    """

    def __init__(self, input_dim: int, prior_sigma: float = 1.0, seed: int = 0):
        self.input_dim = input_dim
        self.prior_sigma = prior_sigma
        key = jax.random.PRNGKey(seed)
        self.params = {
            "w_mu": 0.1 * jax.random.normal(key, (input_dim, 1)),
            "w_rho": jnp.full((input_dim, 1), -3.0),
            "b_mu": jnp.zeros((1,)),
            "b_rho": jnp.full((1,), -3.0),
        }

    @staticmethod
    def forward(params, x, rng):
        w_sigma = jax.nn.softplus(params["w_rho"])
        b_sigma = jax.nn.softplus(params["b_rho"])
        kw, kb = jax.random.split(rng)
        w = params["w_mu"] + w_sigma * jax.random.normal(kw, params["w_mu"].shape)
        b = params["b_mu"] + b_sigma * jax.random.normal(kb, params["b_mu"].shape)
        return (x @ w + b).reshape(-1)

    def kl(self, params):
        total = 0.0
        for mu_k, rho_k in (("w_mu", "w_rho"), ("b_mu", "b_rho")):
            mu, sigma = params[mu_k], jax.nn.softplus(params[rho_k])
            total = total + jnp.sum(
                jnp.log(self.prior_sigma / sigma)
                + (sigma**2 + mu**2) / (2 * self.prior_sigma**2)
                - 0.5
            )
        return total


class MLPBayesianByBackprop(LinearBayesianByBackprop):
    """Variational Bayesian one-hidden-layer MLP (reference :1479-1545)."""

    def __init__(self, input_dim: int, hidden: int = 32, prior_sigma: float = 1.0, seed: int = 0):
        self.input_dim = input_dim
        self.prior_sigma = prior_sigma
        key1, key2 = jax.random.split(jax.random.PRNGKey(seed))
        self.params = {
            "w_mu": 0.1 * jax.random.normal(key1, (input_dim, hidden)),
            "w_rho": jnp.full((input_dim, hidden), -3.0),
            "b_mu": jnp.zeros((hidden,)),
            "b_rho": jnp.full((hidden,), -3.0),
            "w2_mu": 0.1 * jax.random.normal(key2, (hidden, 1)),
            "w2_rho": jnp.full((hidden, 1), -3.0),
            "b2_mu": jnp.zeros((1,)),
            "b2_rho": jnp.full((1,), -3.0),
        }

    @staticmethod
    def forward(params, x, rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        w = params["w_mu"] + jax.nn.softplus(params["w_rho"]) * jax.random.normal(k1, params["w_mu"].shape)
        b = params["b_mu"] + jax.nn.softplus(params["b_rho"]) * jax.random.normal(k2, params["b_mu"].shape)
        w2 = params["w2_mu"] + jax.nn.softplus(params["w2_rho"]) * jax.random.normal(k3, params["w2_mu"].shape)
        b2 = params["b2_mu"] + jax.nn.softplus(params["b2_rho"]) * jax.random.normal(k4, params["b2_mu"].shape)
        h = jax.nn.relu(x @ w + b)
        return (h @ w2 + b2).reshape(-1)

    def kl(self, params):
        total = 0.0
        for mu_k, rho_k in (
            ("w_mu", "w_rho"), ("b_mu", "b_rho"), ("w2_mu", "w2_rho"), ("b2_mu", "b2_rho"),
        ):
            mu, sigma = params[mu_k], jax.nn.softplus(params[rho_k])
            total = total + jnp.sum(
                jnp.log(self.prior_sigma / sigma)
                + (sigma**2 + mu**2) / (2 * self.prior_sigma**2)
                - 0.5
            )
        return total


class BayesianByBackpropOptimizer(ComboOptimizerBase):
    """BANANAS-style Bayesian optimization with a Bayes-by-backprop surrogate
    (reference :1547-1686, method of arXiv:1910.11858).

    sample(): mutate the best solutions found so far (random mutation of a
    temperature-scaled fraction of variables), then keep the candidates whose
    Thompson-sampled (independent posterior draw) predicted cost is lowest.
    update_params(): fit the surrogate by maximizing the ELBO (MSE + KL).
    """

    def __init__(self, param, obj_func=None, batch_size=BATCH_SIZE,
                 surrogate: str = "mlp", start_temp: float = 1.0,
                 min_temp: float = 0.1, anneal_rate: float = ANNEAL_RATE,
                 num_mutations: int = 50, learning_rate: float = 1e-2,
                 train_steps: int = 50, kl_weight: float = 1e-3, seed=0):
        if num_mutations < 2:
            raise ValueError("number of mutations should be more than 1")
        self.surrogate_kind = surrogate
        self.temp = start_temp
        self.min_temp = min_temp
        self.anneal_rate = anneal_rate
        self.num_mutations = num_mutations
        self.learning_rate = learning_rate
        self.train_steps = train_steps
        self.kl_weight = kl_weight
        super().__init__(param, obj_func, batch_size, seed)

    def _init(self) -> None:
        self.dim = sum(len(v) for v in self.param.values())
        if self.surrogate_kind == "linear":
            self.net = LinearBayesianByBackprop(self.dim)
        else:
            self.net = MLPBayesianByBackprop(self.dim)
        self.opt = optax.adam(self.learning_rate)
        self.opt_state = self.opt.init(self.net.params)
        self.xs: List[np.ndarray] = []
        self.ys: List[float] = []

        net_forward, net_kl, kl_weight = self.net.forward, self.net.kl, self.kl_weight

        @jax.jit
        def _train_step(params, opt_state, x, y, rng):
            def loss_fn(p):
                pred = net_forward(p, x, rng)
                return jnp.mean((pred - y) ** 2) + kl_weight * net_kl(p)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._train_step = _train_step

    def _encode(self, sampled: Dict[str, Array]) -> np.ndarray:
        parts = []
        for k, choices in self.param.items():
            parts.append(np.eye(len(choices))[np.asarray(sampled[k])])
        return np.concatenate(parts, axis=1)

    def _mutate(self, bs: int) -> Dict[str, Array]:
        best = [sol for _, sol in self.best_solutions(self.num_mutations)]
        if not best:
            return {
                k: jnp.asarray(self.rng.integers(0, len(v), bs))
                for k, v in self.param.items()
            }
        picks = [best[self.rng.integers(0, len(best))] for _ in range(bs)]
        keys = sorted(self.param.keys())
        n_mut = max(1, int(self.temp * len(keys)))
        out = {k: np.array([p[k] for p in picks]) for k in keys}
        for i in range(bs):
            for k in self.rng.choice(keys, n_mut, replace=False):
                out[k][i] = self.rng.integers(0, len(self.param[k]))
        return {k: jnp.asarray(v) for k, v in out.items()}

    def sample_internal(self, batch_size: Optional[int] = None) -> Tuple:
        bs = batch_size or self.batch_size
        cand = self._mutate(max(bs * 4, self.num_mutations))
        if self.xs:
            x = jnp.asarray(self._encode(cand))
            pred = np.asarray(self.net.forward(self.net.params, x, self._next_key()))
            order = np.argsort(pred)[:bs]
        else:
            order = np.arange(bs)
        sampled = {k: v[jnp.asarray(order)] for k, v in cand.items()}
        self.last_sample_internal_res = (sampled,)
        return (sampled,)

    def update_params(self, cost: Array) -> None:
        sampled = self.last_sample_internal_res[0]
        self.xs.extend(list(self._encode(sampled)))
        self.ys.extend(list(np.asarray(cost).reshape(-1)))
        x = jnp.asarray(np.stack(self.xs))
        y = jnp.asarray(np.array(self.ys))
        params, opt_state = self.net.params, self.opt_state
        loss = None
        for _ in range(self.train_steps):
            params, opt_state, loss = self._train_step(
                params, opt_state, x, y, self._next_key()
            )
        self.net.params, self.opt_state = params, opt_state
        self.last_predictor_loss_mean = float(loss) if loss is not None else None
        self.temp = max(self.min_temp, self.temp * self.anneal_rate)
        self.last_sample_internal_res = None
