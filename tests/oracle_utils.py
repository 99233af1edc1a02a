"""Order-insensitive cross-engine comparison, mirroring the driver gate:
row count + column names + value equality after canonical normalization
(columns sorted by name, floats rounded, timestamps → ISO strings)."""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import pandas as pd


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 9)
    if isinstance(v, Decimal):
        return round(float(v), 9)
    # date and midnight-timestamp normalize identically, mirroring the
    # driver's comparator (scripts/driver_sim.py _norm) exactly.
    if isinstance(v, (pd.Timestamp, datetime, date)):
        return pd.Timestamp(v).isoformat()
    if isinstance(v, (list, tuple)) or str(type(v)).find("ndarray") >= 0:
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "asDict"):  # pyspark Row
        return tuple((k, _norm_cell(x)) for k, x in v.asDict().items())
    if isinstance(v, dict):
        return tuple((k, _norm_cell(x)) for k, x in v.items())
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return v

def normalize(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    df = df[cols]
    df = df.astype(object).where(pd.notnull(df), None)
    rows = sorted(
        (tuple(_norm_cell(v) for v in row) for row in df.itertuples(index=False, name=None)),
        key=repr,
    )
    return cols, rows


def assert_parity(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, key: str) -> None:
    scols, srows = normalize(spark_pdf)
    dcols, drows = normalize(duck_pdf)
    assert scols == dcols, f"{key}: column mismatch spark={scols} duck={dcols}"
    assert len(srows) == len(drows), (
        f"{key}: row count mismatch spark={len(srows)} duck={len(drows)}"
    )
    for i, (a, b) in enumerate(zip(srows, drows)):
        assert a == b, f"{key}: row {i} mismatch\n  spark={a}\n  duck ={b}"
