# first line: 18
@PickleJar.pickle(path="bioreactor")
def step_test(percent, dt):
    """Open-loop response to a scaled constant input
    (cf. step_tests.py:12-45 in the reference)."""
    end_time = 300
    ts = np.linspace(0, end_time, int(end_time // dt))
    bioreactor, lin_model, _, _ = sim.get_parts()
    u = np.array([0.06, 0.2]) * np.asarray(percent)
    ys = [bioreactor.outputs(u)]
    for _ in ts[1:]:
        bioreactor.step(ts[1], u)
        ys.append(bioreactor.outputs(u).copy())
    return ts, np.array(ys)
