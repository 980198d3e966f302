"""Config-layer tests."""
import numpy as np

from gpu_se_tpu import config


def test_defaults_match_canonical_rig():
    cfg = config.SimConfig()
    assert cfg.mpc.P == 300 and cfg.mpc.M == 200
    assert cfg.filter.n_particles == 2**15


def test_horizons_follow_dt_control():
    # Python float floor: 300 // 0.1 == 2999.0 — the reference computes
    # horizons the same way (int(300 // dt_control), sim_base.py:76), so
    # the "P=3000" configuration is actually P=2999 there too.
    mpc = config.MPCConfig(dt_control=0.1)
    assert mpc.P == 2999 and mpc.M == 1999
    mpc = config.MPCConfig(dt_control=30)
    assert mpc.P == 10 and mpc.M == 6


def test_build_rig():
    cfg = config.SimConfig(
        filter=config.FilterConfig(n_particles=64),
        mpc=config.MPCConfig(dt_control=2),
    )
    bioreactor, lin_model, K, est = config.build_rig(cfg)
    assert K.P == 150
    assert est.N_particles == 64
    assert np.isfinite(bioreactor.X).all()
