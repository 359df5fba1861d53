"""Freeze the reference's own golden aeg-JSON outputs into a parquet table
so the driver's DuckDB oracle can hash-compare our full decode pipeline
(sstable scan -> compact -> to_aeg_json) against reference bytes every round.

The golden files are the reference's checked-in integration expectations
(aegisthus-hadoop/src/test/resources/testdata/*/aeg_json_output/aeg-*,
asserted byte-exact by AegisthusIntegrationTest.groovy:181-195). This tool
copies their lines verbatim — no code from this repo touches the values —
giving an oracle that is independent of the decoder under test.

Usage: python tools/make_decode_golden.py   (writes tests/golden/decode_golden.parquet)
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq

TESTDATA = "/root/reference/aegisthus-hadoop/src/test/resources/testdata"

#: case name -> fixture dir; must match the sst_decode_* queries in
#: aegisthus_spark/queries.py
CASES = {
    "randomtable_jb": "2.0.10/randomtable",
    "rangetombstone_la": "2.2.4/rangetombstone",
    "compressed_jb": "2.0.10_compressed/randomtable",
    "combined_ic_jb": "2.0.10_1.2.18_combined/randomtable",
}


def main() -> None:
    names, lines = [], []
    for name, case in CASES.items():
        paths = sorted(glob.glob(f"{TESTDATA}/{case}/aeg_json_output/aeg-*"))
        assert paths, f"no golden files for {case}"
        for path in paths:
            with open(path) as f:
                for line in f:
                    line = line.rstrip("\n")
                    if line.strip():
                        names.append(name)
                        lines.append(line)
    table = pa.table({"case_name": pa.array(names, pa.string()),
                      "line": pa.array(lines, pa.string())})
    out = os.path.join(os.path.dirname(__file__), "..", "tests", "golden",
                       "decode_golden.parquet")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(table, out)
    print(f"wrote {len(lines)} golden lines for {len(CASES)} cases -> {out}")


if __name__ == "__main__":
    main()
