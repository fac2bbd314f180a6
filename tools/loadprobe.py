"""Multi-core throttle probe (r17): the r16/r17 hosts intermittently
throttle MULTI-core work 3-10x while single-core spin stays at base
(load-average 13-14 with an idle CPU meter). bench.py's cpu_spin
calibration is single-core and misses it; this probe runs the same
spin on 1 process and on N processes simultaneously and reports the
parallel-efficiency ratio. Quiet host: ratio ~1.0-1.3. Throttled:
3-10. Use it to gate A/B measurement windows.
"""
import json
import multiprocessing as mp
import os
import time


def _spin(n: int) -> float:
    t0 = time.time()
    x = 0
    for i in range(n):
        x += i * i
    return time.time() - t0


def main() -> None:
    n = int(os.environ.get("LOADPROBE_ITERS", "3000000"))
    procs = min(32, os.cpu_count() or 8)
    single = min(_spin(n) for _ in range(3))
    with mp.Pool(procs) as pool:
        t0 = time.time()
        walls = pool.map(_spin, [n] * procs)
        par_wall = time.time() - t0
    ratio = round(max(walls) / single, 2)
    print(json.dumps({
        "single_sec": round(single, 3),
        "parallel_max_sec": round(max(walls), 3),
        "parallel_wall_sec": round(par_wall, 3),
        "procs": procs,
        "throttle_ratio": ratio,
        "loadavg": os.getloadavg(),
        "quiet": ratio < 1.6,
    }))


if __name__ == "__main__":
    main()
