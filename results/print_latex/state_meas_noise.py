"""LaTeX dump of the noise tuning matrices.

Re-creation of /root/reference/results/print_latex/state+meas_noise.py,
fixed for the bitrotted ``*_device`` attribute names (SURVEY.md App. A).
"""
import numpy as np
import sympy

from gpu_se_tpu import sim


def main():
    state_pdf, measurement_pdf = sim.get_noise()
    sympy.print_latex(sympy.Matrix(np.diag(np.asarray(state_pdf.covariances[0]))).T)
    sympy.print_latex(sympy.Matrix(np.asarray(measurement_pdf.means[0])).T)
    sympy.print_latex(sympy.Matrix(np.asarray(measurement_pdf.means[1])).T)
    sympy.print_latex(sympy.Matrix(np.diag(np.asarray(measurement_pdf.covariances[0]))).T)
    sympy.print_latex(sympy.Matrix(np.diag(np.asarray(measurement_pdf.covariances[1]))).T)
    sympy.print_latex(sympy.Matrix(np.asarray(measurement_pdf.weights)).T)


if __name__ == "__main__":
    main()
