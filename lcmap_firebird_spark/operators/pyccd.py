"""pyccd-shaped multi-band change detection — the reference's U3 leg
with its exact output schema.

Reference: ccdc/pyccd.py — `detect()` runs lcmap-pyccd over one
pixel's 8-band time series (:151-168), `rdd()` flatMaps it
(:171-183), and `format()` shapes each change model into the
40-field dict (:106-148) with ordinal→ISO date rendering
(:113-115) and the sentinel default segment when no model is found
(:99-103, via `default()`).

Spark-native form: the input is already dense-wide (one row per
pixel, arrays aligned to `dates` — ccdc/timeseries.py:33-45), so
detection is a pure MAP: `mapInPandas`, one pixel row in → N segment
rows out, ZERO shuffles. The reference's flatMap shape, kept — but
visible to Catalyst and Arrow-batched.

Model simplification vs lcmap-pyccd (documented, intentional): OLS
line per band instead of Lasso-on-harmonics; break when the
cross-band mean normalized residual of `peek` consecutive clear
observations exceeds `chi` (pyccd's consecutive-observation test,
aggregated across bands). Harmonic terms are a round-2 extension —
the schema, masking, sentinel, and date semantics are exact.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import date, timedelta

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..schemas import segment_schema

# band-array column → reference 2-letter prefix (ccdc/pyccd.py:39-81)
BAND_MAP = {
    "blues": "bl",
    "greens": "gr",
    "reds": "re",
    "nirs": "ni",
    "swir1s": "s1",
    "swir2s": "s2",
    "thermals": "th",
}

# clear-observation PIXELQA codes (reference fixtures use 66/322 as
# clear, 1 as fill — ccdc/timeseries.py:104-115, FIXTURES.md §2)
CLEAR_QA = frozenset({0, 66, 68, 322, 324})

_EPOCH = date(1, 1, 1)


def _iso(ordinal: int) -> str:
    return (_EPOCH + timedelta(days=int(ordinal) - 1)).isoformat()


def _fit(ts: np.ndarray, vs: np.ndarray) -> tuple[float, float, float]:
    n = len(ts)
    if n < 2:
        return 0.0, (float(vs[0]) if n else 0.0), 0.0
    tm, vm = ts.mean(), vs.mean()
    dt = ts - tm
    denom = float((dt * dt).sum())
    slope = float((dt * (vs - vm)).sum() / denom) if denom > 0 else 0.0
    inter = float(vm - slope * tm)
    resid = vs - (slope * ts + inter)
    return slope, inter, float(np.sqrt((resid * resid).sum() / max(n - 2, 1)))


def _segment_row(
    keys: dict,
    ts: np.ndarray,
    band_vals: dict[str, np.ndarray],
    start: int,
    end: int,
    bday: int | None,
    chprob: float,
    peek_slice: slice | None,
    all_dates: np.ndarray,
    mask: np.ndarray,
) -> dict:
    """One 40-field segment dict (pyccd.format, ccdc/pyccd.py:106-148)."""
    row = dict(keys)
    row["sday"] = _iso(ts[start])
    row["eday"] = _iso(ts[end - 1])
    row["bday"] = _iso(bday) if bday is not None else None
    row["chprob"] = float(chprob)
    row["curqa"] = int(end - start)
    for col, pre in BAND_MAP.items():
        vs = band_vals[col]
        slope, inter, rmse = _fit(ts[start:end], vs[start:end])
        if peek_slice is not None:
            pred = slope * ts[peek_slice] + inter
            mag = float(np.abs(vs[peek_slice] - pred).mean())
        else:
            mag = None
        row[f"{pre}mag"] = mag
        row[f"{pre}rmse"] = float(rmse)
        row[f"{pre}coef"] = [float(slope)]
        row[f"{pre}int"] = float(inter)
    row["rfrawp"] = None
    row["dates"] = [_iso(d) for d in all_dates]
    row["mask"] = [int(m) for m in mask]
    return row


def detect(ard: DataFrame, min_obs: int = 6, chi: float = 3.0, peek: int = 3) -> DataFrame:
    """Dense-wide ARD → 40-field segments (mapInPandas, no shuffle).

    Every pixel emits ≥1 row: detected segments plus a trailing open
    segment, or the sentinel when fewer than `min_obs` clear
    observations exist (pyccd.default semantics, ccdc/pyccd.py:99-103
    — sday/eday/bday = '0001-01-01')."""
    schema = segment_schema(True)
    band_cols = list(BAND_MAP)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for rec in pdf.to_dict("records"):
                out.extend(_detect_pixel(rec))
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    def _detect_pixel(rec: dict) -> list[dict]:
        keys = {k: rec[k] for k in ("cx", "cy", "px", "py")}
        dates_all = np.asarray(rec["dates"], dtype="int64")
        order = np.argsort(dates_all, kind="stable")  # arrays arrive DESC
        dates_sorted = dates_all[order]
        qas = np.asarray(rec["qas"], dtype="int64")[order]
        mask = np.isin(qas, list(CLEAR_QA)).astype("int64")
        clear = mask.astype(bool)
        ts = dates_sorted[clear].astype("float64")
        bands = {
            c: np.asarray(rec[c], dtype="float64")[order][clear]
            for c in band_cols
        }
        if len(ts) < min_obs:  # sentinel (pyccd.py:99-103)
            row = dict(keys)
            row.update(
                {
                    "sday": "0001-01-01",
                    "eday": "0001-01-01",
                    "bday": "0001-01-01",
                    "chprob": 0.0,
                    "curqa": int(len(ts)),
                    "rfrawp": None,
                    "dates": [_iso(d) for d in dates_sorted],
                    "mask": [int(m) for m in mask],
                }
            )
            for pre in BAND_MAP.values():
                row.update(
                    {
                        f"{pre}mag": None,
                        f"{pre}rmse": None,
                        f"{pre}coef": None,
                        f"{pre}int": None,
                    }
                )
            return [row]

        rows: list[dict] = []
        start, i, n = 0, min_obs, len(ts)
        while i < n:
            fits = {c: _fit(ts[start:i], bands[c][start:i]) for c in band_cols}
            if i - start >= min_obs and i + peek <= n:
                # cross-band mean normalized residual over the peek
                # window (pyccd's consecutive-obs test, aggregated)
                scores = np.zeros(peek)
                for c in band_cols:
                    slope, inter, rmse = fits[c]
                    pred = slope * ts[i : i + peek] + inter
                    scores += np.abs(bands[c][i : i + peek] - pred) / max(
                        rmse, 1e-6
                    )
                scores /= len(band_cols)
                broke = bool((scores > chi).all())
            else:
                broke = False
            if broke:
                rows.append(
                    _segment_row(
                        keys, ts, bands, start, i, int(ts[i]), 1.0,
                        slice(i, i + peek), dates_sorted, mask,
                    )
                )
                start = i
                i = start + min_obs
            else:
                i += 1
        rows.append(
            _segment_row(
                keys, ts, bands, start, n, None, 0.0, None, dates_sorted, mask
            )
        )
        return rows

    return ard.mapInPandas(kernel, schema)


def chip_table(segments: DataFrame) -> DataFrame:
    """Chip projection under the exact reference schema
    (ccdc/chip.py:25-36: select cx, cy, dates)."""
    from ..schemas import chip_schema
    from .relational import conform

    return conform(segments, chip_schema()).dropDuplicates(["cx", "cy"])


def pixel_table(segments: DataFrame) -> DataFrame:
    """Pixel projection (ccdc/pixel.py:24-35: cx, cy, px, py, mask)."""
    from ..schemas import pixel_schema
    from .relational import conform

    return conform(segments, pixel_schema()).dropDuplicates(
        ["cx", "cy", "px", "py"]
    )


def segment_table(segments: DataFrame) -> DataFrame:
    """Segment projection (ccdc/segment.py:59-70: 38 cols, drops
    dates + mask)."""
    from ..schemas import segment_schema as seg_schema
    from .relational import conform

    return conform(segments, seg_schema(False))


import sys as _sys  # noqa: E402

import pyspark.cloudpickle as _cloudpickle  # noqa: E402

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
