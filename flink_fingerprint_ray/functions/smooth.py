"""LOWESS smoothing (M7 analog).

The reference wraps ``statsmodels.nonparametric.smoothers_lowess``
(``src/data_input/helpers.py:141-190``) with
``frac = window_minutes / len(series)`` and 3 robustness iterations;
the call site is commented out (``process_odr.py:943``), so this is a
parity port of DEAD code — implemented from Cleveland (1979), the
public algorithm statsmodels implements, because statsmodels is not in
this environment:

- per point: k = ceil(frac·n) nearest neighbors (contiguous window for
  the uniformly spaced series the reference feeds it), tricube distance
  weights, weighted linear fit evaluated at the point;
- ``it`` robustness passes reweighting by bisquare of the residuals
  (6·median|r| scale).

Runs inside a per-key ``grouped_map`` sweep: one series per (key), a
few thousand resampled points — the per-point loop is bounded by the
series length, never by the corpus.
"""

from __future__ import annotations

import numpy as np


def lowess_smooth(y: np.ndarray, frac: float, it: int = 3) -> np.ndarray:
    """Robust LOWESS of a uniformly spaced series; returns same-length
    smoothed values.  NaNs propagate (mask them out first, like the
    reference does)."""
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    if n < 3:
        return y.copy()
    x = np.arange(n, dtype=np.float64)
    k = int(max(2, min(n, np.ceil(frac * n))))
    starts = np.clip(np.arange(n) - k // 2, 0, n - k)
    delta = np.ones(n)
    out = y.copy()
    for _ in range(it + 1):
        for i in range(n):
            lo = int(starts[i])
            xi = x[lo:lo + k]
            yi = y[lo:lo + k]
            d = np.abs(xi - i)
            dmax = d.max()
            if dmax <= 0:
                out[i] = yi.mean()
                continue
            w = (1.0 - np.minimum(d / dmax, 1.0) ** 3) ** 3
            wd = w * delta[lo:lo + k]
            sw = wd.sum()
            if sw > 0:
                w = wd
            else:
                # every neighbor is robustness-zeroed (dense outlier
                # cluster): fall back to the pure tricube fit — NEVER to
                # y[i], which would zero the residual and hand the
                # outlier its full weight back next pass
                sw = w.sum()
            xm = (w * xi).sum() / sw
            ym = (w * yi).sum() / sw
            dxc = xi - xm
            b_den = (w * dxc * dxc).sum()
            b = ((w * dxc * (yi - ym)).sum() / b_den) if b_den > 1e-12 else 0.0
            out[i] = ym + b * (i - xm)
        r = y - out
        tiny = 1e-12 * max(1.0, float(np.max(np.abs(y))))
        mad = np.median(np.abs(r))
        # a (near-)zero median with real residuals elsewhere happens when
        # most of the series fits exactly (e.g. linear data + isolated
        # outliers) — fall back to the mean so the bisquare can still
        # downweight the outliers; machine-epsilon dust counts as zero
        scale = 6.0 * (mad if mad > tiny else float(np.mean(np.abs(r))))
        # converged (all residuals are fp dust): without this guard the
        # bisquare zero-weights points over noise and a window can
        # collapse to one effective point
        if scale <= tiny:
            break
        delta = np.clip(1.0 - (r / scale) ** 2, 0.0, 1.0) ** 2
    return out


def lowess_smooth_df(df, window_points: int = 5, cols=None, exclude_cols=None, it: int = 3):
    """Reference-shaped wrapper (helpers.py:141-190): smooth selected
    numeric columns of a time-indexed frame; frac = window/len; columns
    with < 3 finite points pass through; non-finite cells stay NaN."""
    import pandas as pd

    if exclude_cols is None:
        exclude_cols = []
    if cols is None:
        cols = [c for c in df.columns if c not in exclude_cols]
    out = df.copy()
    n = len(out)
    if n == 0:
        return out
    frac = min(1.0, max(0.01, window_points / max(n, 1)))
    for c in cols:
        if not pd.api.types.is_numeric_dtype(out[c]):
            continue
        y = out[c].to_numpy(dtype=np.float64)
        mask = np.isfinite(y)
        if mask.sum() < 3:
            continue
        sm = np.full_like(y, np.nan)
        sm[mask] = lowess_smooth(y[mask], frac=frac, it=it)
        out[c] = sm
    return out
