"""r14 verdict item 2: isolated, calibration-normalized re-runs of
q79_triangles and q243_scc_exhaustive_peel (the two r13 sweep entries
past the 5 s budget on a host the calibration probe itself showed
degraded mid-sweep). Mirrors bench.py's methodology exactly: same
session config, sf0.001 warmup, prepare_indexes before timing,
noop-write materializer, gc between runs — but ONE query at a time
in a quiet window, 5 runs each, calibration pre/mid/post so each
wall can be divided by the r13 bases (SCALING.md round 13)."""
import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod            # noqa: E402
from bench import calibration                 # noqa: E402
from memory_engine_spark.session import get_spark  # noqa: E402

R13_BASE = {"cpu_spin_sec": 0.239, "file_read_sec": 0.0017,
            "dispatch_sec": 0.364}
SF = "/root/testdata/sf0.1"

def run(spark, qs, name, n=5):
    per = []
    for _ in range(n):
        gc.collect()
        t0 = time.time()
        qs[name](spark, SF).write.mode("overwrite").format("noop").save()
        per.append(round(time.time() - t0, 3))
    return per

def main():
    spark = get_spark("memory-engine-adjudicate")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    entrymod.entry(spark).count()
    entrymod.prepare_indexes(spark, SF)

    out = {"r13_base": R13_BASE}
    out["cal_pre"] = calibration(spark, SF)
    out["q79_triangles"] = run(spark, qs, "q79_triangles")
    out["cal_mid"] = calibration(spark, SF)
    out["q243_scc_exhaustive_peel"] = run(
        spark, qs, "q243_scc_exhaustive_peel")
    out["cal_post"] = calibration(spark, SF)
    for q in ("q79_triangles", "q243_scc_exhaustive_peel"):
        runs = out[q]
        spin = min(out["cal_pre"]["cpu_spin_sec"],
                   out["cal_mid"]["cpu_spin_sec"],
                   out["cal_post"]["cpu_spin_sec"])
        factor = spin / R13_BASE["cpu_spin_sec"]
        out[q + "_norm_min"] = round(min(runs) / factor, 3)
        out[q + "_cal_factor"] = round(factor, 4)
    print(json.dumps(out, indent=1))

if __name__ == "__main__":
    main()
