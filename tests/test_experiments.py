"""Experiment-layer smoke tests: every script imports, and the cheap
entry points run end to end (the full thesis figures are produced by
running the scripts directly)."""
import importlib

import numpy as np
import pytest


SCRIPTS = [
    "results.bioreactor_openloop.batch_production_growth",
    "results.bioreactor_openloop.ss2ss",
    "results.bioreactor_openloop.step_tests",
    "results.bioreactor_closedloop.no_noise",
    "results.bioreactor_closedloop.with_noise",
    "results.bioreactor_closedloop.performance_vs_control_period",
    "results.bioreactor_closedloop.mpc_run_seq",
    "results.pf_openloop.pf_run_seq",
    "results.pf_openloop.pf_power",
    "results.pf_closedloop.bioreactor_performance_pf",
    "results.gsf_openloop.gsf_run_seq",
    "results.gsf_openloop.gsf_power",
    "results.gsf_closedloop.bioreactor_performance_gsf",
    "results.print_latex.state_meas_noise",
    "results.print_latex.controller_params",
]


@pytest.mark.parametrize("mod", SCRIPTS)
def test_imports(mod):
    importlib.import_module(mod)


def test_no_noise_short():
    no_noise = importlib.import_module("results.bioreactor_closedloop.no_noise")
    ts, ys, lin_model, K, us, dt_control, biass, end_time = no_noise.simulate(
        end_time=5, dt_control=1
    )
    assert np.isfinite(ys).all() and np.isfinite(us).all()


def test_staged_openloop_short():
    from results._common import openloop_staged_run

    ts, us, xs, ys, ys_meas = openloop_staged_run(
        end_time=30,
        schedule=[(25.0, np.array([0.0, 0.0])), (np.inf, np.array([0.06, 0.2]))],
        X0=[3000 / 180, 1 / 24.6, 0.0, 0.0, 0.0],
        noisy=True,
    )
    assert ys.shape == (len(ts), 5)
    assert np.isfinite(ys_meas).all()


def test_run_seq_tiny():
    from results._filter_bench import run_seq

    times = run_seq("pf", "step", 64, 3, gpu=False)
    assert times.shape == (3,)
    assert (times > 0).all()


def test_print_latex_runs(capsys):
    importlib.import_module("results.print_latex.state_meas_noise").main()
    importlib.import_module("results.print_latex.controller_params").main()
    out = capsys.readouterr().out
    assert "matrix" in out or "\\" in out
