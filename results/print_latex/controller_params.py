"""LaTeX dump of the MPC tuning matrices
(cf. /root/reference/results/print_latex/controller_params.py)."""
import numpy as np
import sympy

from gpu_se_tpu import sim


def main():
    _, _, K, _ = sim.get_parts()
    sympy.print_latex(sympy.Matrix(np.diag(K.Q).T))
    sympy.print_latex(sympy.Matrix(np.diag(K.R).T))


if __name__ == "__main__":
    main()
