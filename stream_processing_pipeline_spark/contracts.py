"""Ready-made schema contracts.

``TRIP_CONTRACT`` is the reference pipeline's exact ingestion contract
(``/root/reference/src/spark_streaming.py:60-111``): 19 wire columns, all
strings off the Kafka JSON; empty-string -> NULL; renamed to snake_case;
``store_and_fwd_flag`` dropped. A user of the reference can point this at
their topic and get the same typed stream:

    stream = read_kafka_stream(spark, brokers, topic)
    typed = TRIP_CONTRACT.parse_json(stream)   # == reference's create_schema
                                               #    + column_types stages
"""

from __future__ import annotations

from .schema import ColumnRule, SchemaContract

__all__ = ["TRIP_CONTRACT"]

_TS = "yyyy-MM-dd HH:mm:ss"

TRIP_CONTRACT = SchemaContract(
    rules=[
        ColumnRule("VendorID", "int", name="vendor_id"),
        ColumnRule("tpep_pickup_datetime", "timestamp", name="pickup_datetime", ts_format=_TS),
        ColumnRule("tpep_dropoff_datetime", "timestamp", name="dropoff_datetime", ts_format=_TS),
        ColumnRule("passenger_count", "int"),
        ColumnRule("trip_distance", "double"),
        ColumnRule("RatecodeID", "int", name="ratecode_id"),
        ColumnRule("PULocationID", "int", name="pu_location_id"),
        ColumnRule("DOLocationID", "int", name="do_location_id"),
        ColumnRule("payment_type", "int"),
        ColumnRule("fare_amount", "double"),
        ColumnRule("extra", "double"),
        ColumnRule("mta_tax", "double"),
        ColumnRule("tip_amount", "double"),
        ColumnRule("tolls_amount", "double"),
        ColumnRule("improvement_surcharge", "double"),
        ColumnRule("total_amount", "double"),
        ColumnRule("congestion_surcharge", "double"),
        ColumnRule("Airport_fee", "double", name="airport_fee"),
    ],
    drop=("store_and_fwd_flag",),
)

# The seven components of the recomputed total in the reference's abnormal-fee
# check (/root/reference/src/spark_streaming.py:199-206).
FEE_COMPONENTS = [
    "fare_amount",
    "extra",
    "mta_tax",
    "tip_amount",
    "tolls_amount",
    "improvement_surcharge",
    "congestion_surcharge",
]
