"""Regression probe: run EVERY queries() entry at a small SF in one small
Ray session and print per-query wall time — the fastest way to catch
actor-pool starvation hangs (NOTES_NEXT_ROUND.md: fixed pools reserving
every CPU of a small session deadlock silently) and scheduling-floor
regressions before they hit the driver's correctness gate.

Usage (from the repo root):
    python tools/sweep_queries.py [sf_dir] [num_cpus] [name ...]
Defaults: /root/testdata/sf0.001, 4 CPUs, all queries. Exit code = number
of queries slower than --slow (default 30 s, the hang heuristic).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SLOW_S = float(os.environ.get("SWEEP_SLOW_S", "30"))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf = args.pop(0) if args and os.path.isdir(args[0]) else \
        "/root/testdata/sf0.001"
    cpus = int(args.pop(0)) if args and args[0].isdigit() else 4
    os.environ.setdefault(
        "RAY_DATA_LOGGING_CONFIG",
        os.path.join(os.path.dirname(__file__), "ray_data_logging.yaml"))
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import __ray_entry__ as ent
    qs = ent.queries()
    names = args or list(qs)
    slow = 0
    t_all = time.perf_counter()
    for name in names:
        t0 = time.perf_counter()
        out = qs[name](sf)
        dt = time.perf_counter() - t0
        flag = " SLOW" if dt > SLOW_S else ""
        slow += bool(flag)
        print(f"{dt:8.2f} {name}{flag}", flush=True)
        del out
    print(f"TOTAL {time.perf_counter() - t_all:.1f}s over {len(names)} "
          f"queries at {cpus} CPUs ({slow} slow)")
    ray.shutdown()
    return slow


if __name__ == "__main__":
    raise SystemExit(main())
