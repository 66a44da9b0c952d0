#!/usr/bin/env python3
"""Repack a ScaleData output dir into the fixture layout.

Spark writes each table as a parquet DIRECTORY of part files; the driver
fixtures (and the DuckDB oracle's read_parquet calls) use one FILE per
table. This tool rewrites each `<table>.parquet` directory into a single
file of the same name, and retypes `events.ts` from raw int64 nanos to
parquet timestamp[us] (isAdjustedToUTC=false) so both engines read it
exactly like the current driver fixtures (Spark: TIMESTAMP_NTZ pass-
through; DuckDB: timestamp[us]). The generator's nanos carry no sub-
microsecond component, so the downcast is lossless. The legacy
TIMESTAMP(NANOS) generation is pinned separately by the checked-in
src/test/resources/events_nanos.parquet fixture.

Dev tool only — not part of the shipped library.

Usage: python3 tools/repack_scaledata.py <dir>
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.dataset as ds
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    root = sys.argv[1]
    for t in TABLES:
        path = os.path.join(root, f"{t}.parquet")
        if not os.path.isdir(path):
            print(f"[repack] skip {t}: not a directory")
            continue
        table = ds.dataset(path, format="parquet").to_table()
        if t == "events":
            i = table.schema.get_field_index("ts")
            table = table.set_column(
                i, pa.field("ts", pa.timestamp("us")),
                table.column("ts").cast(pa.timestamp("ns"))
                     .cast(pa.timestamp("us")))
        # Drop the carried-over Spark footer metadata: pyarrow preserves
        # the source files' key-value metadata, including Spark's
        # org.apache.spark.sql.parquet.row.metadata schema JSON — and
        # Spark TRUSTS that key over the parquet logical types on read.
        # After the ts retype above, the stale JSON still says bigint,
        # so Spark would scan ts as raw longs (and the loader's legacy
        # nanos branch would div actual-micros by 1000 — the 1970s-
        # timestamp bug the r11 sf1 oracle sweep caught). The driver
        # fixtures carry no Spark metadata; match them exactly.
        table = table.replace_schema_metadata(None)
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        shutil.rmtree(path)
        os.rename(tmp, path)
        print(f"[repack] {t}: {table.num_rows} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
