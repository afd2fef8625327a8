"""Stratified violin plots of neighborhood coefficients.

Mirrors reference ``plotting/_strat.py:10-44``: one violin per stratum
(e.g. cluster), gradient-filled top to bottom with a diverging colormap by
clipping a vertical-gradient image to each violin body.
"""

from __future__ import annotations

import matplotlib.pyplot as plt
import numpy as np
from matplotlib.patches import PathPatch
from matplotlib.path import Path


def violinplot(data, stratification, key="coef", ax=None, cmap="seismic",
               **kwargs):
    """Violin of ``data.obs[key]`` values per level of ``data.obs[stratification]``."""
    if ax is None:
        ax = plt.gca()
    kwargs_ = {
        "widths": 0.9,
        "showmeans": False,
        "showextrema": False,
        "showmedians": False,
    }
    kwargs_.update(kwargs)

    bins = data.obs[stratification].unique()
    groups = [
        np.asarray(data.obs.loc[data.obs[stratification] == v, key].dropna())
        for v in bins
    ]
    violins = ax.violinplot(groups, np.arange(len(bins)), **kwargs_)

    (ymin, ymax), (xmin, xmax) = ax.get_ylim(), ax.get_xlim()
    ny = 1000
    gradient = np.tile(np.linspace(0, 1, ny), (1, 1)).T

    for violin in violins["bodies"]:
        path = Path(violin.get_paths()[0].vertices)
        patch = PathPatch(path, facecolor="none", edgecolor="none")
        ax.add_patch(patch)
        ax.imshow(gradient, origin="lower", extent=[xmin, xmax, ymin, ymax],
                  aspect="auto", cmap=cmap, clip_path=patch)

    ax.set_xticks(np.arange(len(bins)))
    ax.set_xticklabels(bins)
    ax.set_xlabel(stratification)
    ax.set_ylabel("Neighborhood Coefficient")
    return ax
