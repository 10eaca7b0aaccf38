"""Sky classification: clear/cloudy flags and dataset splits.

Reproduces the reference's three-source cloud flag
(/root/reference/python_src/plot_scripts/x_analysis_script_MARCH26.py:82-163)
and the clear-sky split of the main analysis
(multi_campaign_plots_and_ana.py:103-151):

  * primary: an external cloud-flag product (time, elevation), e.g. the MLNN
    retrieval the reference reindexes within a 30-min tolerance
  * fallback where the primary is NaN: mean MWR LWP > 0.005 kg m^-2
  * override: radiosonde-derived LWP (Crop=0) > 0.2 kg m^-2 -> cloudy
"""

from __future__ import annotations

import numpy as np

from ..constants import hatpro
from ..data.dataset import Dataset, Variable

LWP_CLEAR_THRESHOLD = 0.005   # kg/m^2 (multi_campaign_plots_and_ana.py:32)
LWP_RS_OVERRIDE = 0.2         # kg/m^2 (x_analysis_script_MARCH26.py:101-112)


def mean_mwr_lwp(ds: Dataset) -> np.ndarray:
    """Mean over instruments of nansum-per-instrument LWP (the reference's
    water_sum, x_analysis_script_MARCH26.py:128-138)."""
    vals = []
    for inst in ("Dwdhat", "Foghat", "Sunhat", "Tophat", "Joyhat", "Hamhat"):
        name = f"{inst}_LWP"
        if name in ds:
            vals.append(np.nansum(np.nan_to_num(
                ds[name].data[:, None]), axis=1))
    if not vals:
        return np.zeros(ds.dims.get("time", 0))
    return np.nanmean(np.stack(vals), axis=0)


def add_cloud_flag(ds: Dataset, external_flag: np.ndarray | None = None,
                   thres_lwp: float = LWP_CLEAR_THRESHOLD,
                   rs_override: float = LWP_RS_OVERRIDE) -> Dataset:
    """Attach `cloud_flag (time, elevation)` in {0 clear, 1 cloudy}.

    external_flag: optional (time, elevation) float array with NaN where the
    external product has no coverage (the MLNN role).
    """
    n_time = ds.dims["time"]
    n_elev = ds.dims.get("elevation", hatpro.N_ELEVATIONS)

    lwp_flag = (mean_mwr_lwp(ds) > thres_lwp).astype(float)     # (time,)
    lwp_flag2d = np.tile(lwp_flag[:, None], (1, n_elev))

    if external_flag is None:
        combined = lwp_flag2d
    else:
        combined = np.array(external_flag, float)
        nan = np.isnan(combined)
        combined[nan] = lwp_flag2d[nan]

    if "LWP_radiosonde" in ds:
        rs = ds["LWP_radiosonde"].data[:, 0]                     # Crop=0
        liquid = (np.nan_to_num(rs) > rs_override)[:, None]
        combined = np.where(liquid, 1.0, combined)

    ds["cloud_flag"] = Variable(
        ("time", "elevation"), combined.astype(np.int32),
        {"long_name": "Cloud flag (external primary, LWP + radiosonde-liquid "
                      "fallback)",
         "flag_values": "0, 1", "flag_meanings": "clear cloudy"})
    return ds


def split_clear_cloudy(ds: Dataset, thres_lwp: float = LWP_CLEAR_THRESHOLD):
    """(ds_clear, ds_cloudy) by mean MWR LWP (clear_sky_dataset,
    multi_campaign_plots_and_ana.py:103-151)."""
    lwp = mean_mwr_lwp(ds)
    clear = lwp <= thres_lwp
    return ds.sel_mask("time", clear), ds.sel_mask("time", ~clear)


def sky_mask(ds: Dataset, sky: str, elevation_index: int) -> np.ndarray:
    """(time,) bool mask for "clear" | "cloudy" | "all" at one elevation from
    the per-elevation cloud_flag (apply_sky_mask,
    x_colorplot_by_elevs_and_chans_MARCH26.py:145-171)."""
    if sky == "all" or "cloud_flag" not in ds:
        return np.ones(ds.dims["time"], bool)
    flag = ds["cloud_flag"].data[:, elevation_index]
    return flag == 0 if sky == "clear" else flag == 1
