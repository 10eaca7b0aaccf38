"""Molecular-oxygen line parameters (Rosenkranz model family).

40-line table: 34 lines of the 60-GHz spin-rotation complex + 118.75 GHz +
5 sub-mm lines, with first-order Rosenkranz line mixing.

Provenance: transcribed from the published description of P. W. Rosenkranz's
`o2abs.f` (Rosenkranz 1995, "Absorption of microwaves by atmospheric gases";
line mixing per Rosenkranz 1988; widths/mixing refreshed in the 2017+ releases
per Tretyakov et al. 2005 / Koshelev et al. 2016).  The reference pipeline
consumes these via PyRTlib (/root/reference/python_src/proc/
PyRTlib_processing.py:121-151); nothing here is copied from the reference
repo, which contains no spectroscopy.

Units:
  F     [GHz]     line frequency
  S300  [Hz*cm^2] intensity at 300 K
  BE    [-]       E_lower/(k*300K) coefficient: S = S300*exp(-BE*(theta-1))
  W300  [GHz/bar] pressure-broadened width at 300 K
  Y300  [1/bar]   first-order mixing coefficient at 300 K
  V     [1/bar]   temperature dependence of mixing: Y = Y300 + V*(theta-1)
Nonresonant Debye term: WB300 [GHz/bar] width, exponent X.
"""

from dataclasses import dataclass, field

import numpy as np

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


@dataclass(frozen=True)
class O2Model:
    """One O2 absorption model: line table + nonresonant term."""

    name: str
    f: np.ndarray = field(default_factory=lambda: _F.copy())
    s300: np.ndarray = field(default_factory=lambda: _S300.copy())
    be: np.ndarray = field(default_factory=lambda: _BE.copy())
    w300: np.ndarray = field(default_factory=lambda: _W300.copy())
    y300: np.ndarray = field(default_factory=lambda: _Y300.copy())
    v: np.ndarray = field(default_factory=lambda: _V.copy())
    # Second-order mixing (G: intensity coupling, DNU: pressure shift of the
    # band) — structure for the R19+/R24 models; zero where not publicly
    # tabulated.
    g: np.ndarray = field(default_factory=lambda: np.zeros(N_O2_LINES))
    dnu: np.ndarray = field(default_factory=lambda: np.zeros(N_O2_LINES))
    # Nonresonant Debye term.
    wb300: float = 0.56
    x: float = 0.80
    # Water-vapor broadening efficiency relative to dry air in the density
    # term (1.1 in R98; 1.2 in the 2017+ releases per Koshelev et al.).
    h2o_factor: float = 1.1


def _updated_widths_2005() -> np.ndarray:
    """60-GHz widths refreshed per Tretyakov et al. (2005) for the N<=13
    lines (values beyond N=13 and sub-mm carried at their R98 values)."""
    w = _W300.copy()
    w[:14] = [1.688, 1.703, 1.513, 1.495, 1.433, 1.408, 1.353, 1.353,
              1.303, 1.319, 1.262, 1.265, 1.238, 1.217]
    return w


O2_R98 = O2Model(name="R98")

_W2005 = _updated_widths_2005()
O2_R17 = O2Model(name="R17", w300=_W2005, h2o_factor=1.2)
O2_R20 = O2Model(name="R20", w300=_W2005, h2o_factor=1.2)
O2_R24 = O2Model(name="R24", w300=_W2005, h2o_factor=1.2)

# Remaining members of the nine-model sweep (old_merge2nc.py:417-435).
# O2 changed far less often than H2O across the Rosenkranz releases:
# R03 still carries the 1995 widths / 1.1 vapor factor; the 2016+ releases
# all use the Tretyakov (2005) 60-GHz widths and the Koshelev 1.2 factor.
# The speed-dependent variants differ from their parents in H2O only.
O2_R03 = O2Model(name="R03")
O2_R16 = O2Model(name="R16", w300=_W2005, h2o_factor=1.2)
O2_R19 = O2Model(name="R19", w300=_W2005, h2o_factor=1.2)

O2_MODELS = {
    "R98": O2_R98, "R03": O2_R03, "R16": O2_R16, "R17": O2_R17,
    "R19": O2_R19, "R19SD": O2_R19, "R20": O2_R20, "R20SD": O2_R20,
    "R24": O2_R24,
}
