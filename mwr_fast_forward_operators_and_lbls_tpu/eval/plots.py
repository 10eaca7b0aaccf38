"""Plot suite: the reference's L4 figure families on the analysis dataset.

Re-implements the plot types of /root/reference/python_src/plot_scripts/
(multi_campaign_plots_and_ana.py, x_plot_std_bars.py,
x_colorplot_by_elevs_and_chans_MARCH26.py, x_line_plots_by_elev_MARCH26.py,
x_clear_sky_percentage_per_elev_MARCH26.py, plot_TB-scatter_MWR.py) against
this framework's Deviations_* variables:

  * per-channel std/rmse bars and bias lines per elevation, with the
    +-0.5 K acceptance guide-lines (final_zenith_plots.py:160-162)
  * bias +- std envelope lines
  * channel x elevation heatmaps of bias / std / rmse / Pearson-r with
    symlog/log color scales (x_colorplot...:207,246)
  * model-vs-reference TB scatter with bias/r/RMSE text box
  * clear-sky percentage per elevation bars

All figures are written via the Agg backend; every function takes data, an
output path, and returns the path (no global state).
"""

from __future__ import annotations

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
from matplotlib.colors import LogNorm, SymLogNorm  # noqa: E402

from ..constants import hatpro
from . import stats as stats_mod

CHANNEL_LABELS = [f"{f:.2f}" for f in hatpro.HATPRO_FREQS_GHZ]
ACCEPTANCE_K = 0.5   # the +-0.5 K guide-lines


def _finish(fig, path):
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return path


def plot_std_bars(dev_by_label: dict, path: str, metric: str = "std",
                  title: str = ""):
    """Grouped per-channel bars of std or rmse for several deviation arrays
    (each (n_samples, 14)); plot_std_bars / plot_rmse_bars
    (multi_campaign_plots_and_ana.py:190-224, x_plot_std_bars.py:126-192)."""
    fig, ax = plt.subplots(figsize=(10, 4))
    labels = list(dev_by_label)
    width = 0.8 / max(len(labels), 1)
    xs = np.arange(hatpro.N_CHANNELS)
    for k, lab in enumerate(labels):
        st = stats_mod.deviation_stats(np.asarray(dev_by_label[lab]), axis=0)
        ax.bar(xs + k * width, np.asarray(st[metric]), width, label=lab)
    ax.set_yscale("log")
    ax.set_ylim(0.05, 30)
    ax.axhline(ACCEPTANCE_K, color="gray", ls="--", lw=0.8)
    ax.set_xticks(xs + 0.4 - width / 2)
    ax.set_xticklabels(CHANNEL_LABELS, rotation=45)
    ax.set_xlabel("channel frequency [GHz]")
    ax.set_ylabel(f"{metric} [K]")
    ax.set_title(title)
    ax.legend(fontsize=8)
    return _finish(fig, path)


def plot_bias_lines(dev_by_label: dict, path: str, title: str = "",
                    ylim: float = 3.0, with_std: bool = False):
    """Per-channel bias lines (optionally +- std fill) with +-0.5 K
    guide-lines (plot_bias_lines / plot_bias_std_lines,
    multi_campaign_plots_and_ana.py:228-323)."""
    fig, ax = plt.subplots(figsize=(10, 4))
    xs = np.arange(hatpro.N_CHANNELS)
    for lab, dev in dev_by_label.items():
        st = stats_mod.deviation_stats(np.asarray(dev), axis=0)
        bias = np.asarray(st["bias"])
        line, = ax.plot(xs, bias, marker="o", ms=3, label=lab)
        if with_std:
            std = np.asarray(st["std"])
            ax.fill_between(xs, bias - std, bias + std, alpha=0.2,
                            color=line.get_color())
    for y in (-ACCEPTANCE_K, ACCEPTANCE_K):
        ax.axhline(y, color="gray", ls="--", lw=0.8)
    ax.axhline(0, color="black", lw=0.8)
    ax.set_ylim(-ylim, ylim)
    ax.set_xticks(xs)
    ax.set_xticklabels(CHANNEL_LABELS, rotation=45)
    ax.set_xlabel("channel frequency [GHz]")
    ax.set_ylabel("bias [K]")
    ax.set_title(title)
    ax.legend(fontsize=8)
    return _finish(fig, path)


def plot_chan_elev_heatmap(dev: np.ndarray, path: str, metric: str = "bias",
                           title: str = "",
                           elevations=hatpro.ELEVATIONS_DEG):
    """Channel x elevation pcolormesh of a statistic of dev (time, chan,
    elev); symlog diverging scale for bias, log for std/rmse, linear for r
    and n (create_plot_by_chan_and_ele,
    x_colorplot_by_elevs_and_chans_MARCH26.py:193-400)."""
    dev = np.asarray(dev)
    if metric not in ("bias", "std", "rmse", "n"):
        raise ValueError(f"metric {metric!r}; use plot_corr_heatmap for r")
    st = stats_mod.deviation_stats(dev, axis=0)
    grid = np.asarray(st[metric], float)

    fig, ax = plt.subplots(figsize=(7, 5))
    if metric == "bias":
        norm = SymLogNorm(linthresh=0.25, vmin=-15, vmax=15)
        cmap = "RdBu_r"
    elif metric in ("std", "rmse"):
        norm = LogNorm(vmin=0.25, vmax=15)
        cmap = "viridis"
        grid = np.clip(grid, 0.25, None)
    else:
        norm = None
        cmap = "viridis"
    mesh = ax.pcolormesh(np.arange(grid.shape[1] + 1),
                         np.arange(grid.shape[0] + 1),
                         grid, norm=norm, cmap=cmap)
    fig.colorbar(mesh, ax=ax, label=f"{metric} [K]" if metric != "r" else "r")
    ax.set_xticks(np.arange(grid.shape[1]) + 0.5)
    ax.set_xticklabels([f"{e:g}" for e in elevations[:grid.shape[1]]],
                       rotation=45)
    ax.set_yticks(np.arange(grid.shape[0]) + 0.5)
    ax.set_yticklabels(CHANNEL_LABELS[:grid.shape[0]], fontsize=7)
    ax.set_xlabel("elevation [deg]")
    ax.set_ylabel("channel [GHz]")
    ax.set_title(title)
    return _finish(fig, path)


def plot_corr_heatmap(values: np.ndarray, reference: np.ndarray, path: str,
                      title: str = "", elevations=hatpro.ELEVATIONS_DEG):
    """Channel x elevation Pearson-r heatmap between model and reference TBs
    (time, chan, elev) (the xr.corr panel of
    x_colorplot_by_elevs_and_chans_MARCH26.py:404-418)."""
    r = np.asarray(stats_mod.pearson_r(np.asarray(values),
                                       np.asarray(reference), axis=0))
    fig, ax = plt.subplots(figsize=(7, 5))
    mesh = ax.pcolormesh(np.arange(r.shape[1] + 1), np.arange(r.shape[0] + 1),
                         r, vmin=0.0, vmax=1.0, cmap="viridis")
    fig.colorbar(mesh, ax=ax, label="Pearson r")
    ax.set_xticks(np.arange(r.shape[1]) + 0.5)
    ax.set_xticklabels([f"{e:g}" for e in elevations[:r.shape[1]]], rotation=45)
    ax.set_yticks(np.arange(r.shape[0]) + 0.5)
    ax.set_yticklabels(CHANNEL_LABELS[:r.shape[0]], fontsize=7)
    ax.set_xlabel("elevation [deg]")
    ax.set_ylabel("channel [GHz]")
    ax.set_title(title)
    return _finish(fig, path)


def plot_tb_scatter(values: np.ndarray, reference: np.ndarray, path: str,
                    xlabel: str = "reference TB [K]",
                    ylabel: str = "model TB [K]", title: str = ""):
    """Model-vs-reference scatter with bias/r/RMSE box (derive_statistics /
    plot_tb_scatter_per_channel, plot_TB-scatter_MWR.py:57-112)."""
    v = np.asarray(values).ravel()
    r = np.asarray(reference).ravel()
    valid = np.isfinite(v) & np.isfinite(r)
    v, r = v[valid], r[valid]
    st = stats_mod.deviation_stats(v - r)
    corr = float(stats_mod.pearson_r(v, r))
    fig, ax = plt.subplots(figsize=(5, 5))
    ax.scatter(r, v, s=4, alpha=0.4)
    lo, hi = (min(r.min(), v.min()), max(r.max(), v.max())) if v.size else (0, 1)
    ax.plot([lo, hi], [lo, hi], "k--", lw=0.8)
    ax.text(0.03, 0.97,
            f"n = {v.size}\nbias = {float(st['bias']):.2f} K\n"
            f"r = {corr:.3f}\nRMSE = {float(st['rmse']):.2f} K",
            transform=ax.transAxes, va="top", fontsize=8,
            bbox=dict(boxstyle="round", fc="white", alpha=0.7))
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    return _finish(fig, path)


def plot_clear_sky_fraction(cloud_flag: np.ndarray, path: str,
                            elevations=hatpro.ELEVATIONS_DEG,
                            title: str = "clear-sky fraction per elevation"):
    """% clear timesteps per elevation (plot_clear_sky_fraction,
    x_clear_sky_percentage_per_elev_MARCH26.py:111-170)."""
    flag = np.asarray(cloud_flag)
    frac = 100.0 * np.mean(flag == 0, axis=0)
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.bar(np.arange(frac.size), frac)
    ax.set_xticks(np.arange(frac.size))
    ax.set_xticklabels([f"{e:g}" for e in elevations[:frac.size]])
    ax.set_xlabel("elevation [deg]")
    ax.set_ylabel("clear timesteps [%]")
    ax.set_ylim(0, 100)
    ax.set_title(title)
    return _finish(fig, path)


def plot_model_vs_model_by_iwv(dev_x: np.ndarray, dev_y: np.ndarray,
                               iwv: np.ndarray, path: str,
                               xlabel: str = "model A deviations from R24 [K]",
                               ylabel: str = "model B deviations from R24 [K]",
                               title: str = "", channel: int | None = None):
    """Departure-vs-departure scatter of two models (each vs the same LBL
    reference), colored by IWV (armsgb_vs_rttov_by_IWV,
    multi_campaign_plots_and_ana.py:903-1041).

    `dev_x`/`dev_y` are (time, chan) or (time, chan, elev) deviation arrays;
    `iwv` is (time,).  With `channel=None` all channels are pooled (13 K
    square axes when the data fits); with a channel index, the reference's
    band-dependent axis length applies (13 K for K-band channels 0-6, 4 K
    for V-band channels 7-13)."""
    dx = np.asarray(dev_x, float)
    dy = np.asarray(dev_y, float)
    iw = np.asarray(iwv, float)
    if dx.ndim == 3:                       # (time, chan, elev) -> stack elevs
        n_elev = dx.shape[2]
        dx = np.moveaxis(dx, 2, 1).reshape(-1, dx.shape[1])
        dy = np.moveaxis(dy, 2, 1).reshape(-1, dy.shape[1])
        iw = np.repeat(iw, n_elev)
    if channel is not None:
        x = dx[:, channel]
        y = dy[:, channel]
        colors = iw
        axis_len = 13.0 if channel <= 6 else 4.0
    else:
        x = dx.ravel(order="F")            # channel-major like np.tile(iwv, 14)
        y = dy.ravel(order="F")
        colors = np.tile(iw, dx.shape[1])
        axis_len = 13.0
    valid = np.isfinite(x) & np.isfinite(y) & np.isfinite(colors)
    x, y, colors = x[valid], y[valid], colors[valid]
    # Cap the collection size: beyond ~20k alpha-blended points the extra
    # draws change no pixels but dominate render time at campaign scale.
    # Deterministic stride, announced in the title — never a silent drop.
    max_points = 20_000
    subtitle = ""
    if x.size > max_points:
        stride = -(-x.size // max_points)
        subtitle = f"\n(every {stride}th of {x.size} points)"
        x, y, colors = x[::stride], y[::stride], colors[::stride]

    fig, ax = plt.subplots(figsize=(6, 5))
    sc = ax.scatter(x, y, c=colors, cmap="viridis", s=12, alpha=0.7)
    ax.axvline(0, color="black", ls="--", lw=1)
    ax.axhline(0, color="black", ls="--", lw=1)
    in_x = x.size == 0 or np.nanmax(np.abs(x)) < axis_len + 1
    in_y = y.size == 0 or np.nanmax(np.abs(y)) < axis_len + 1
    if in_y:
        ax.set_ylim(-axis_len, axis_len)
    if in_x:
        ax.set_xlim(-axis_len, axis_len)
    if in_x and in_y:
        ax.set_aspect("equal")
    fig.colorbar(sc, ax=ax, label="IWV [kg m$^{-2}$]")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    if subtitle:
        ax.set_title(title + subtitle, fontsize=10)
    else:
        ax.set_title(title)
    return _finish(fig, path)


def plot_departures_vs_iwv(dev: np.ndarray, iwv: np.ndarray, path: str,
                           ylabel: str = "TB departure [K]", title: str = "",
                           channel: int | None = None,
                           elevation_index: int | None = None):
    """Deviations vs IWV scatter (plot_departures_vs_iwv /
    x_devs_by_IWV.py:140-501).

    `dev` is (time, chan) or (time, chan, elev).  The reference produces the
    pooled plot plus per-channel and per-elevation stratifications; select
    them with `channel` and/or `elevation_index` (None pools the axis)."""
    d = np.asarray(dev, float)
    iw = np.asarray(iwv, float)
    if d.ndim == 3 and elevation_index is not None:
        d = d[:, :, elevation_index]
    if channel is not None:
        d = d[:, channel:channel + 1]
    d = d.reshape(d.shape[0], -1)
    n_cols = min(d.shape[1], 64)
    fig, ax = plt.subplots(figsize=(6, 4))
    # One collection for all columns (a per-column scatter loop costs one
    # draw + autoscale pass per column — ~10x slower for identical pixels).
    ax.scatter(np.tile(iw, n_cols), d[:, :n_cols].ravel(order="F"),
               s=4, alpha=0.3, color="tab:blue")
    ax.axhline(0, color="black", lw=0.8)
    ax.set_xlabel("IWV [kg m$^{-2}$]")
    ax.set_ylabel(ylabel)
    ax.set_title(title)
    return _finish(fig, path)


def standard_report(ds, outdir: str, dev_names: list | None = None) -> list:
    """Generate the standard figure set for an analysis dataset: bars, bias
    lines, heatmaps per deviation family + clear-sky fraction.  Returns the
    list of written paths (the reference's per-campaign loop,
    multi_campaign_plots_and_ana.py:1047-1208, reduced to one call)."""
    import os

    os.makedirs(outdir, exist_ok=True)
    paths = []
    if dev_names is None:
        dev_names = [n for n in ds if n.startswith("Deviations_")]
    zenith_devs = {}
    for name in dev_names:
        dev = ds[name].data            # (time, chan, elev)
        zenith_devs[name.replace("Deviations_", "")] = dev[..., 0]
        for metric in ("bias", "std", "rmse"):
            paths.append(plot_chan_elev_heatmap(
                dev, f"{outdir}/{name}_{metric}_heatmap.png", metric,
                title=name))
    if zenith_devs:
        paths.append(plot_std_bars(
            zenith_devs, f"{outdir}/std_bars_zenith.png", "std",
            "std per channel (zenith)"))
        paths.append(plot_bias_lines(
            zenith_devs, f"{outdir}/bias_lines_zenith.png",
            "bias per channel (zenith)", with_std=True))
    if "cloud_flag" in ds:
        paths.append(plot_clear_sky_fraction(
            ds["cloud_flag"].data, f"{outdir}/clear_sky_fraction.png"))

    # Model-vs-model departure scatter colored by IWV for every pair of
    # model deviation families that share the LBL reference — the
    # armsgb_vs_rttov_by_IWV family (multi_campaign_plots_and_ana.py:903-1041).
    iwv_names = [n for n in ds if n.endswith("_IWV")]
    model_devs = [n for n in dev_names if n.endswith("_R24")
                  and not any(inst in n for inst in
                              ("hat", "Hat"))]  # exclude MWR-vs-ref families
    if iwv_names and len(model_devs) >= 2:
        iwv = np.asarray(ds[iwv_names[0]].data, float)
        for a in range(len(model_devs)):
            for b in range(a + 1, len(model_devs)):
                na, nb = model_devs[a], model_devs[b]
                la = na.replace("Deviations_", "").replace("_R24", "")
                lb = nb.replace("Deviations_", "").replace("_R24", "")
                paths.append(plot_model_vs_model_by_iwv(
                    ds[na].data, ds[nb].data, iwv,
                    f"{outdir}/{la}_vs_{lb}_by_IWV.png",
                    xlabel=f"{la} deviations from R24 [K]",
                    ylabel=f"{lb} deviations from R24 [K]",
                    title=f"{la} vs {lb} departures by IWV"))
    return paths
