#!/usr/bin/env python3
"""Rewrite events.parquet's int64-nanos `ts` column as parquet
TIMESTAMP(NANOS), matching the driver testdata's physical layout
(Tables.events reads raw nanos via spark.sql.legacy.parquet.nanosAsLong).
Spark cannot write nanosecond timestamps, so GenScaleData emits int64 and
this one-shot tool fixes the logical type in place.

Usage: python3 tools/events_to_ns.py <sfDir>
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq

d = sys.argv[1]
t = pq.read_table(f"{d}/events.parquet")
i = t.schema.get_field_index("ts")
assert pa.types.is_int64(t.schema.field(i).type), t.schema.field(i)
t = t.set_column(i, "ts", t.column("ts").cast(pa.timestamp("ns")))
pq.write_table(t, f"{d}/events.parquet")
print(f"rewrote {d}/events.parquet ts -> timestamp[ns], {t.num_rows} rows")
