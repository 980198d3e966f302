# first line: 17
@PickleJar.pickle(path="gsf/closedloop")
def get_sim_summary(N_particles, dt_control, dt_predict, monte_carlo=0, end_time=50):
    s = sim.Simulation(
        int(N_particles), dt_control, dt_predict, end_time, pf=False,
        seed=monte_carlo,
    )
    t0 = time.perf_counter()
    s.simulate()
    runtime = time.perf_counter() - t0
    return dict(
        performance=float(s.performance),
        mpc_frac=float(s.mpc_frac),
        predict_count=s.predict_count,
        update_count=s.update_count,
        runtime=runtime,
        covariance_point_size=np.asarray(s.covariance_point_size),
        ts=s.ts,
    )
