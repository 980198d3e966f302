# first line: 40
@RunSequences.vectorize
@PickleJar.pickle(path="gsf/raw")
def sigma_points_run_seq(N, runs, gpu):
    """Sigma-point generation alone (batched Cholesky + spread,
    cf. gsf_run_seq.py:139-173 in the reference)."""
    import jax

    from gpu_se_tpu.filters import gs_ukf

    state, _ = build("gsf", N, gpu)
    # chain through the state (first sigma point == mean) so successive
    # calls see fresh inputs and nothing is cache-served
    sp = jax.jit(lambda s: s.replace(means=gs_ukf.get_sigma_points(s)[:, 0, :]))
    return time_op(sp, state, runs)
