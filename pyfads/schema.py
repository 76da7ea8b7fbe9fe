"""Schemas: the reference's taxi-ride record, the FADS interval output.

The reference declares schemas as hand-built ``TypeInformation[]`` arrays
(TransactionGeneralizationJob.java:42-53) and rewrites QID positions to
``TUPLE(DOUBLE, DOUBLE)`` in the Generalizer's produced type
(Generalizer.java:259-269).  We use named ``StructField``s, and flatten each
QID interval to ``<col>_lo`` / ``<col>_hi`` double columns — hashable by the
DuckDB oracle and friendlier to parquet/column pruning than a struct.
"""

from __future__ import annotations

from pyspark.sql import types as T

from pyfads.config import FADSConfig

__all__ = ["TAXI_RIDE_SCHEMA", "TAXI_CSV_TOKEN_ORDER", "fads_output_schema"]

# The 11-column taxi-ride record (NYCTaxiRideSource.java:189-203).
TAXI_RIDE_SCHEMA = T.StructType(
    [
        T.StructField("rideId", T.LongType(), False),
        T.StructField("taxiId", T.LongType(), False),
        T.StructField("driverId", T.LongType(), False),
        T.StructField("isStart", T.BooleanType(), False),
        T.StructField("startTime", T.LongType(), False),  # epoch millis
        T.StructField("endTime", T.LongType(), False),  # epoch millis
        T.StructField("startLon", T.DoubleType(), False),
        T.StructField("startLat", T.DoubleType(), False),
        T.StructField("endLon", T.DoubleType(), False),
        T.StructField("endLat", T.DoubleType(), False),
        T.StructField("passengerCnt", T.ShortType(), False),
    ]
)

# Raw CSV token order, which differs from the tuple order
# (NYCTaxiRideSource.java:204-244): rideId, START|END, time, time, lon, lat,
# lon, lat, passengerCnt, taxiId, driverId.
TAXI_CSV_TOKEN_ORDER = [
    "rideId",
    "eventKind",
    "time1",
    "time2",
    "startLon",
    "startLat",
    "endLon",
    "endLat",
    "passengerCnt",
    "taxiId",
    "driverId",
]


def fads_output_schema(input_schema: T.StructType, cfg: FADSConfig) -> T.StructType:
    """Output schema of the generalizer: QID columns are replaced by
    ``<col>_lo``/``<col>_hi`` doubles, every other column passes through in
    input order (flattened form of Generalizer.java:259-269)."""
    fields = []
    for f in input_schema.fields:
        if f.name in cfg.qid_cols:
            fields.append(T.StructField(f"{f.name}_lo", T.DoubleType(), True))
            fields.append(T.StructField(f"{f.name}_hi", T.DoubleType(), True))
        else:
            fields.append(f)
    return T.StructType(fields)
