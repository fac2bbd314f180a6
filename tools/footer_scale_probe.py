"""Footer-introspection scale probe (r13 — the verdict's weak-pair
fix, proven at growing file sizes): write real Spark parquet + ORC
files at 1x/10x/100x row counts, then measure what the ranged tail
readers actually TOUCH (bytes, via the counting open_fn seam) and
their wall clock, against whole-file size. The claim under test is
the 100-TB posture: footer-audit cost scales with METADATA size
(row groups/stripes), not data size — bytes read must stay ~KBs and
wall ~ms while the file grows 100x.

Also cross-checks correctness at every factor: the ranged parse must
equal the whole-bytes parse, num_rows must equal the written count,
and the column read must reproduce the exact sum.

Usage: python tools/footer_scale_probe.py [factors...]  (default 1 10 100)
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from memory_engine_spark.session import get_spark  # noqa: E402
from memory_engine_spark.sources import formats as fm  # noqa: E402

BASE_ROWS = 100_000


class CountingFile:
    def __init__(self, path, mode):
        self.f = open(path, mode)
        self.bytes_read = 0

    def seek(self, *a):
        return self.f.seek(*a)

    def tell(self):
        return self.f.tell()

    def read(self, n=-1):
        d = self.f.read(n)
        self.bytes_read += len(d)
        return d

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.f.close()


def timed(fn, n=3):
    runs = []
    for _ in range(n):
        t0 = time.time()
        out = fn()
        runs.append(time.time() - t0)
    return out, min(runs)


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10, 100]
    spark = get_spark("footer-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    dest = tempfile.mkdtemp(prefix="footer_scale_")
    results = {}
    try:
        for factor in factors:
            n = BASE_ROWS * factor
            df = spark.range(n).selectExpr(
                "id AS k",
                "CAST(id % 1000 AS STRING) AS s",
                "id * 7 AS v")
            pq_dir = os.path.join(dest, f"pq_{factor}")
            orc_dir = os.path.join(dest, f"orc_{factor}")
            df.coalesce(1).write.mode("overwrite").parquet(pq_dir)
            (df.coalesce(1).write.format("orc")
             .option("compression", "zlib").mode("overwrite")
             .save(orc_dir))
            pq_path = glob.glob(pq_dir + "/*.parquet")[0]
            orc_path = glob.glob(orc_dir + "/*.orc")[0]
            row = {"rows": n,
                   "pq_file_bytes": os.path.getsize(pq_path),
                   "orc_file_bytes": os.path.getsize(orc_path)}

            cf = CountingFile(pq_path, "rb")
            m, row["pq_footer_sec"] = timed(
                lambda: fm.parquet_footer_meta_file(
                    pq_path, open_fn=lambda p, mo: CountingFile(p, mo)))
            # count bytes once outside the timing loop
            m2 = fm.parquet_footer_meta_file(
                pq_path, open_fn=lambda p, mo: cf)
            assert m == m2 == fm.parquet_footer_meta(
                open(pq_path, "rb").read())
            assert m["num_rows"] == n
            row["pq_footer_bytes_read"] = cf.bytes_read
            row["pq_row_groups"] = len(m["row_groups"])

            cf = CountingFile(orc_path, "rb")
            mo_, row["orc_footer_sec"] = timed(
                lambda: fm.orc_footer_meta_file(
                    orc_path,
                    open_fn=lambda p, mo: CountingFile(p, mo)))
            mo2 = fm.orc_footer_meta_file(
                orc_path, open_fn=lambda p, mo: cf)
            assert mo_ == mo2 == fm.orc_footer_meta(
                open(orc_path, "rb").read())
            assert mo_["num_rows"] == n
            row["orc_footer_bytes_read"] = cf.bytes_read
            row["orc_stripes"] = len(mo_["stripes"])

            cf = CountingFile(pq_path, "rb")
            vals, row["pq_column_sec"] = timed(
                lambda: fm.parquet_read_int64_column_file(
                    pq_path, "v",
                    open_fn=lambda p, mo: CountingFile(p, mo)), n=1)
            vals2 = fm.parquet_read_int64_column_file(
                pq_path, "v", open_fn=lambda p, mo: cf)
            assert vals == vals2
            assert sum(vals) == 7 * n * (n - 1) // 2
            row["pq_column_bytes_read"] = cf.bytes_read
            row["pq_column_frac_of_file"] = round(
                cf.bytes_read / row["pq_file_bytes"], 4)

            results[f"x{factor}"] = row
            print(f"# x{factor}: {json.dumps(row)}", file=sys.stderr)
    finally:
        shutil.rmtree(dest, ignore_errors=True)
    print(json.dumps({"probe": "footer_scale", "base_rows": BASE_ROWS,
                      "results": results}))


if __name__ == "__main__":
    main()
