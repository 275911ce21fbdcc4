"""Per-algorithm reporters (reference: reagent/reporting/*.py)."""

from __future__ import annotations

from reagent_tpu.core.tracker import MeanAggregator, ValueListObserver
from reagent_tpu.reporting.reporter_base import ReporterBase


def _mk(keys):
    return {
        "value_list_observers": {"cpe_details": ValueListObserver("cpe_details")},
        "aggregating_observers": {k: MeanAggregator(k) for k in keys},
    }


class DiscreteDQNReporter(ReporterBase):
    """Reference: reporting/discrete_dqn_reporter.py."""

    def __init__(self):
        kw = _mk(
            [
                "td_loss", "reward_loss", "q_values_mean", "q_taken_mean",
                "reward_mean", "cpe_td_loss",
            ]
        )
        super().__init__(**kw)


class ActorCriticReporter(ReporterBase):
    """Reference: reporting/actor_critic_reporter.py."""

    def __init__(self):
        super().__init__(
            **_mk(["q1_loss", "q2_loss", "actor_loss", "alpha_loss", "value_loss"])
        )


class TD3Reporter(ReporterBase):
    def __init__(self):
        super().__init__(**_mk(["q1_loss", "q2_loss", "actor_loss", "target_q_mean"]))


class ParametricDQNReporter(ReporterBase):
    def __init__(self):
        super().__init__(**_mk(["td_loss", "reward_loss", "q_mean"]))


class SlateQReporter(ReporterBase):
    def __init__(self):
        super().__init__(**_mk(["td_loss", "q_mean"]))


class Seq2SlateReporter(ReporterBase):
    """Ranking trainer validation metrics (the reference logs these from
    seq2slate_trainer.py:231-236 and :276-279 into its lightning reporter;
    the OSS tree has no dedicated reporter class, so the key set is ours)."""

    def __init__(self):
        kw = _mk(
            [
                "obj_loss", "baseline_loss", "ips_mean", "clamped_ips_mean",
                "kl_loss", "eval_baseline_loss",
            ]
        )
        kw["value_list_observers"].update(
            {
                k: ValueListObserver(k)
                for k in (
                    "eval_advantages",
                    "logged_slate_rank_probs",
                    "ranked_slate_rank_probs",
                    "eval_data_pages_g",
                    "eval_data_pages_ng",
                )
            }
        )
        super().__init__(**kw)


class WorldModelReporter(ReporterBase):
    def __init__(self):
        super().__init__(**_mk(["loss", "gmm", "bce", "mse"]))


class DiscreteCRRReporter(ReporterBase):
    """Reference: reporting/discrete_crr_reporter.py."""

    def __init__(self):
        super().__init__(
            **_mk(["q1_loss", "q2_loss", "actor_loss", "actor_q1_mean", "td_loss"])
        )


class RewardNetworkReporter(ReporterBase):
    """Reference: reporting/reward_network_reporter.py."""

    def __init__(self):
        super().__init__(**_mk(["loss", "unweighted_loss", "eval_loss"]))


class Seq2RewardReporter(ReporterBase):
    """Reference: reporting/seq2reward_reporter.py."""

    def __init__(self):
        super().__init__(
            **_mk(["mse_loss", "step_entropy_loss", "q_values_mean", "eval_mse_loss"])
        )


class Seq2RewardCompressReporter(Seq2RewardReporter):
    """Reference: reporting/seq2reward_reporter.py:106."""

    def __init__(self):
        ReporterBase.__init__(
            self,
            **_mk(
                ["mse_loss", "accuracy", "eval_mse_loss", "eval_accuracy",
                 "eval_q_values_mean", "eval_action_distribution"]
            ),
        )
