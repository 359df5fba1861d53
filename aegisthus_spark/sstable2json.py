"""sstable2json — single-file SSTable -> aeg-JSON debug tool.

Parity with the reference's ``scripts/sstable2json`` wrapper
(``scripts/README.md:1-17``: "use it to test aegisthus or to debug further
in your editor"; the wrapped Java class is no longer shipped there). Pure
Python, no Spark session — decodes one Data.db (compressed or not) and
prints one aeg-JSON line per row in file order, the exact rendering of the
snapshot job's output.

    python -m aegisthus_spark.sstable2json data/x-ib-1-Data.db
    python -m aegisthus_spark.sstable2json data/x-Data.db -comp data/x-CompressionInfo.db
    python -m aegisthus_spark.sstable2json --key-type UTF8Type --column-type UTF8Type x-Data.db
"""

from __future__ import annotations

import argparse
import sys

from . import types as aegtypes
from .output import render_row_json
from .sstable import scan_file


def rows_of_cells(cell_iter):
    """Group a file-order cell stream into (key, deleted_at, columns) rows.

    A single SSTable stores each partition contiguously, so consecutive-key
    grouping is exact (no merge semantics here: this is a raw dump of ONE
    file, like the classic tool — tombstones and all)."""
    key = None
    deleted_at = None
    cols: list = []
    for c in cell_iter:
        if c["partition_key"] != key and key is not None:
            yield key, deleted_at, cols
            cols = []
        key = c["partition_key"]
        deleted_at = c["row_deleted_at"]
        if c["kind"] != "r":  # row-only records carry no column entry
            cols.append({
                "name": c["cell_name"], "value": c["value"], "ts": c["ts"],
                "kind": c["kind"], "ttl": c["ttl"],
                "local_deletion_time": c["local_deletion_time"],
                "ts_of_last_delete": c["ts_of_last_delete"],
            })
    if key is not None:
        yield key, deleted_at, cols


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="sstable2json", description="dump one SSTable Data.db as aeg-JSON"
    )
    ap.add_argument("data_file")
    ap.add_argument("-comp", "--compression-info", default=None,
                    help="explicit CompressionInfo.db (default: auto-discover)")
    ap.add_argument("--key-type", default="BytesType")
    ap.add_argument("--column-type", default="BytesType")
    ap.add_argument("--column-value-type", default="BytesType")
    ap.add_argument("--max-col-size", type=int, default=None)
    ap.add_argument("--legacy-column-name-formatting", action="store_true")
    args = ap.parse_args(argv)

    kc = aegtypes.get(args.key_type)
    nc = aegtypes.get(args.column_type)
    vc = aegtypes.get(args.column_value_type)
    cells = scan_file(args.data_file, compression_path=args.compression_info)
    out = sys.stdout
    try:
        for key, deleted_at, cols in rows_of_cells(cells):
            out.write(
                render_row_json(
                    key, deleted_at, cols,
                    key_conv=kc, name_conv=nc, value_conv=vc,
                    max_col_size=args.max_col_size,
                    legacy_formatting=args.legacy_column_name_formatting,
                )
            )
            out.write("\n")
    except BrokenPipeError:  # piped through head/less — normal CLI use
        sys.stderr.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
