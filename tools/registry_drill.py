"""Registry migration drill (r10 verdict item 5): run the full
byte-exact oracle gate under a DELIBERATELY perturbed session conf and
record which queries survive — the TRIAGE path REGISTRY.md prescribes
for a Spark-version or conf migration, validated before it is needed.

Perturbations:
- ``shuffle7``: spark.sql.shuffle.partitions=7 (a hostile, prime,
  non-default width). Rule 7 of the canonicalization contract claims
  the registry is order-insensitive — every hash must survive any
  shuffle width, so the expected survival is 100%.
- ``tz``: spark.sql.session.timeZone=America/New_York, set AFTER the
  first table load (load_tables defensively re-pins UTC at the load
  boundary, so setting it before would just be undone — the drill
  probes what the pin does NOT cover: a foreign conf sneaking in
  mid-session). Queries that format/bucket timestamps through the
  session zone are expected to flip; the survival matrix documents
  exactly which.

Usage: python tools/registry_drill.py {shuffle7|tz} [sf_dir] [out.json]
"""

from __future__ import annotations

import importlib.util
import sys

sys.path.insert(0, "/root/repo")

from memory_engine_spark.session import get_spark  # noqa: E402


def main() -> None:
    mode = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    out = (sys.argv[3] if len(sys.argv) > 3
           else f"DRILL_{mode}.json")

    spark = get_spark(f"registry-drill-{mode}")
    if mode == "shuffle7":
        spark.conf.set("spark.sql.shuffle.partitions", "7")
    elif mode == "tz":
        import __spark_entry__ as entrymod
        # Production behavior since r12: a mid-session zone change
        # LOUD-FAILS at the _t boundary (tz-drift guard, r11 verdict
        # item 3; pinned by test_tz_drift_guard_raises_and_names_
        # frontier). The drill disables the guard to measure the raw
        # frontier the guard protects against — the 238/243 survival
        # matrix REGISTRY.md documents.
        entrymod.TZ_GUARD = False
        # trigger the one-time load_tables UTC pin FIRST, then perturb
        entrymod._t(spark, sf_dir)["nation"].count()
        spark.conf.set("spark.sql.session.timeZone",
                       "America/New_York")
    else:
        raise SystemExit(f"unknown drill mode {mode!r}")

    spec = importlib.util.spec_from_file_location(
        "oracle_check", "/root/repo/tools/oracle_check.py")
    oc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(oc)
    oc.get_spark = lambda *a, **k: spark          # keep the perturbation
    sys.argv = ["oracle_check", "--exact", "--allow-version-drift",
                "--json", out, sf_dir]
    oc.main()


if __name__ == "__main__":
    main()
