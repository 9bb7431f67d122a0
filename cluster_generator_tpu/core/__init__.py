"""Core runtime (L1'): constants, units boundary, quadrature, interpolation,
cosmology, grids, config and logging.  See SURVEY.md §7 step 1."""

from . import constants
from .config import cgparams
from .constants import G, X_H, kboltz, keV, km_s, kpc_to_cm, mp, mu, mue
from .cosmology import Cosmology, default_cosmology
from .grid import log_radius_grid
from .interp import CubicSpline, cubic_spline, interp, spline_eval
from .logging import devLogger, mylog
from .quadrature import (
    cumtrapz,
    cumulative_integral,
    integrate_from,
    integrate_mass,
    integrate_tail_to_inf,
)

__all__ = [
    "constants", "cgparams", "G", "X_H", "kboltz", "keV", "km_s", "kpc_to_cm",
    "mp", "mu", "mue", "Cosmology", "default_cosmology", "log_radius_grid",
    "CubicSpline", "cubic_spline", "interp", "spline_eval", "devLogger",
    "mylog", "cumtrapz", "cumulative_integral", "integrate_from",
    "integrate_mass", "integrate_tail_to_inf",
]
