"""MATLAB .mat syntrack ingestion (reference: tcdb/etl/syntracks.py:203-269
``loadmat`` + recursive struct dict-ify + ``toSyntrackObjects``).

scipy is not in this image, so the loadmat path is import-gated; the
long-format conversion is pure and tested against a deterministic fake.
At scale the .mat files would land in a raw zone and be read via
``spark.read.format("binaryFile")`` + ``mapInPandas`` with this same
per-struct conversion.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from tcdb_spark.schemas import SYNTRACK_SCHEMA

try:  # pragma: no cover - scipy absent in this image
    from scipy.io import loadmat  # type: ignore

    HAS_SCIPY = True
except Exception:  # pragma: no cover
    loadmat = None
    HAS_SCIPY = False


def structs_to_rows(structs: list[dict[str, Any]]) -> list[tuple]:
    """Flatten syntrack dicts (model, init, ens, annual_id, storm_name,
    hour[], lat[], lon[], wind[], mslp[]) into long-format rows. NaNs map
    to None (np.nan/np.datetime64('NaT') sentinels -> SQL NULL,
    SURVEY.md §1.3)."""
    import math

    rows = []
    for s in structs:
        hours = s["hour"]
        for i, h in enumerate(hours):
            def _get(key):
                seq = s.get(key)
                if seq is None or i >= len(seq):
                    return None
                v = float(seq[i]) if seq[i] is not None else None
                return None if (v is not None and math.isnan(v)) else v

            rows.append(
                (
                    str(s["model"]),
                    s["init"],
                    int(s["ens"]),
                    int(s.get("annual_id", 0)),
                    s.get("storm_name"),
                    int(h),
                    _get("lat"),
                    _get("lon"),
                    _get("wind"),
                    _get("mslp"),
                )
            )
    return rows


def read_mat_ensemble(spark: SparkSession, path: str) -> DataFrame:
    """Driver-side .mat load -> long-format DataFrame. Requires scipy."""
    if not HAS_SCIPY:  # pragma: no cover
        raise NotImplementedError(
            "scipy.io.loadmat is not available in this image; use "
            "fake_ensemble_df for tests or install scipy at deploy time"
        )
    raw = loadmat(path, struct_as_record=False, squeeze_me=True)  # pragma: no cover
    raise NotImplementedError(  # pragma: no cover
        "wire the site-specific .mat struct layout here (reference: "
        "tcdb/etl/syntracks.py:203-269)"
    )


def fake_ensemble_df(
    spark: SparkSession,
    model: str = "ECMWF",
    n_ens: int = 8,
    n_steps: int = 5,
    init=None,
) -> DataFrame:
    """Deterministic synthetic ensemble (test stand-in for loadmat):
    member e starts at (10 + e*0.5, -40 - e*0.5) moving NW, member n_ens-1
    all-NaN (exercises the empty-track filter), member 0 pre-assigned
    annual_id=1."""
    import datetime as dt

    init = init or dt.datetime(2022, 9, 1, 0, 0, 0)
    structs = []
    for e in range(n_ens):
        if e == n_ens - 1:
            structs.append(
                {
                    "model": model, "init": init, "ens": e, "annual_id": 0,
                    "storm_name": None, "hour": [i * 6 for i in range(n_steps)],
                    "lat": [float("nan")] * n_steps, "lon": [float("nan")] * n_steps,
                    "wind": [float("nan")] * n_steps, "mslp": [float("nan")] * n_steps,
                }
            )
            continue
        structs.append(
            {
                "model": model, "init": init, "ens": e,
                "annual_id": 1 if e == 0 else 0,
                "storm_name": "TEST" if e == 0 else None,
                "hour": [i * 6 for i in range(n_steps)],
                "lat": [10.0 + e * 0.5 + i * 0.4 for i in range(n_steps)],
                "lon": [-40.0 - e * 0.5 - i * 0.5 for i in range(n_steps)],
                "wind": [30.0 + e + 2.0 * i for i in range(n_steps)],
                "mslp": [1005.0 - e - i for i in range(n_steps)],
            }
        )
    return spark.createDataFrame(structs_to_rows(structs), SYNTRACK_SCHEMA)
