"""r16 verdict item 1: isolated, calibration-recorded quiet-window
re-adjudication of q114_beam_search and q194_graph_stats — both read
1.3-1.7x over r15 in every r16 sweep (all three sweeps ran on
degraded/throttled hosts). Mirrors bench.py's methodology exactly:
same session config, sf0.001 warmup, prepare_indexes before timing,
noop-write materializer, gc between runs — ONE query at a time in a
quiet window, N runs each, calibration pre/mid/post so each wall can
be compared against the r13/r15 bases (SCALING.md round 13).

Usage: python tools/adjudicate_r17.py [--runs N] [query ...]
"""
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
R15_MIN = {"q114_beam_search": 1.231, "q194_graph_stats": 3.370}
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
    args = sys.argv[1:]
    n = 5
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            n = int(args[i + 1]); i += 2
        else:
            names.append(args[i]); i += 1
    if not names:
        names = ["q114_beam_search", "q194_graph_stats"]

    spark = get_spark("memory-engine-adjudicate-r17")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    entrymod.entry(spark).count()
    entrymod.prepare_indexes(spark, SF)

    out = {"r13_base": R13_BASE, "r15_min": R15_MIN, "runs_per": n}
    out["cal_pre"] = calibration(spark, SF)
    for name in names:
        per = run(spark, qs, name, n)
        out[name] = {"runs": per, "min": min(per)}
        out["cal_mid_" + name] = calibration(spark, SF)
        print(f"# {name}: runs={per} min={min(per)}", file=sys.stderr)
    out["cal_post"] = calibration(spark, SF)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
