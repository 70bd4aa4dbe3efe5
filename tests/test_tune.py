"""Hyperparameter-search tests — native TPE sampler + median pruner
(the reference's optuna `--sampler tpe --pruner median`,
rl/tune_hyperparameters.py:26-33). Synthetic objectives only: fast,
deterministic, no env."""

import numpy as np
import pytest

from humanoid_mujoco_tpu.rl.tune import (MedianPruner, RandomSampler, Study,
                                         TPESampler, TrialPruned)


def _quadratic_objective(trial):
    """Max at x=0.3 (log-space param), y='b'."""
    x = trial.suggest_float("x", 1e-3, 1.0, log=True)
    y = trial.suggest_categorical("y", ("a", "b", "c"))
    bonus = {"a": 0.0, "b": 0.5, "c": 0.1}[y]
    return -((np.log10(x) - np.log10(0.3)) ** 2) + bonus


class TestTPE:
    def test_beats_random_on_quadratic(self):
        def best_of(sampler):
            study = Study(sampler=sampler, pruner=MedianPruner(
                n_startup_trials=10**9))  # pruning off
            study.optimize(_quadratic_objective, n_trials=40,
                           verbose=False)
            return study.best_trial["value"]

        tpe = np.mean([best_of(TPESampler(seed=s)) for s in range(3)])
        rnd = np.mean([best_of(RandomSampler(seed=s)) for s in range(3)])
        # TPE must find a near-optimal value and not lose to random
        assert tpe > -0.05
        assert tpe >= rnd - 1e-9

    def test_exploits_good_region(self):
        """After startup, TPE concentrates suggestions near the max."""
        study = Study(sampler=TPESampler(n_startup_trials=10, seed=1),
                      pruner=MedianPruner(n_startup_trials=10**9))
        study.optimize(_quadratic_objective, n_trials=50, verbose=False)
        late = [t["params"]["x"] for t in study.trials[30:]]
        # majority of late suggestions within ~one decade of x*=0.3
        close = np.mean([abs(np.log10(v) - np.log10(0.3)) < 0.5
                         for v in late])
        assert close >= 0.5

    def test_categorical_picks_winning_choice(self):
        study = Study(sampler=TPESampler(n_startup_trials=8, seed=2),
                      pruner=MedianPruner(n_startup_trials=10**9))
        study.optimize(_quadratic_objective, n_trials=40, verbose=False)
        late = [t["params"]["y"] for t in study.trials[25:]]
        assert late.count("b") > len(late) // 2


class TestMedianPruner:
    def test_prunes_bad_curves(self):
        """Trials with a low first-step value get pruned once enough
        completed curves exist."""
        def objective(trial):
            x = trial.suggest_float("x", 0.0, 1.0)
            for step in range(1, 4):
                trial.report(x * step, step=step)
                if trial.should_prune():
                    raise TrialPruned()
            return 3.0 * x

        study = Study(sampler=RandomSampler(seed=3),
                      pruner=MedianPruner(n_startup_trials=4,
                                          n_warmup_steps=1))
        study.optimize(objective, n_trials=30, verbose=False)
        states = [t["state"] for t in study.trials]
        pruned = [t for t in study.trials if t["state"] == "PRUNED"]
        completed = [t for t in study.trials if t["state"] == "COMPLETE"]
        assert len(pruned) >= 5
        # pruned trials are (on median) worse draws than completed ones
        assert (np.median([t["params"]["x"] for t in pruned])
                < np.median([t["params"]["x"] for t in completed]))

    def test_warmup_and_startup_gates(self):
        p = MedianPruner(n_startup_trials=2, n_warmup_steps=2)
        assert not p.should_prune(1, -100.0, [{1: 0.0}, {1: 0.0}])  # warmup
        assert not p.should_prune(2, -100.0, [{2: 0.0}])            # startup
        assert p.should_prune(2, -100.0, [{2: 0.0}, {2: 1.0}])

    def test_best_trial_ignores_pruned(self):
        def objective(trial):
            x = trial.suggest_float("x", 0.0, 1.0)
            trial.report(x, step=1)
            if trial.should_prune():
                raise TrialPruned()
            return x

        study = Study(sampler=RandomSampler(seed=4),
                      pruner=MedianPruner(n_startup_trials=3,
                                          n_warmup_steps=1))
        best = study.optimize(objective, n_trials=20, verbose=False)
        assert best["state"] == "COMPLETE"
        assert best["value"] == max(t["value"] for t in study.trials
                                    if t["state"] == "COMPLETE")
