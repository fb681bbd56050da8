"""Edge-input sweep: run every queries() entry over a fixture dir and
record which raise, with exception type + message. Not a correctness gate —
a crash triage list. Loud guard ValueErrors with clear messages are OK;
internal IndexError/AttributeError/KeyError/ArrowInvalid are bugs."""
import logging
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False)
import ray.data

ray.data.DataContext.get_current().enable_progress_bars = False
logging.getLogger("ray.data").setLevel(logging.ERROR)

import __ray_entry__ as entry

sf = sys.argv[1]
qs = entry.queries()
only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
crashes = []
n_run = 0
since_restart = 0
for name, fn in qs.items():
    if only and name not in only:
        continue
    if since_restart >= 45:
        ray.shutdown()
        ray.init(address="local", num_cpus=8, include_dashboard=False)
        ray.data.DataContext.get_current().enable_progress_bars = False
        logging.getLogger("ray.data").setLevel(logging.ERROR)
        since_restart = 0
    since_restart += 1
    n_run += 1
    t0 = time.perf_counter()
    try:
        r = fn(sf)
        if hasattr(r, "to_pandas"):
            r = r.to_pandas()
        print(f"{name:32s} ok {len(r)} rows ({time.perf_counter()-t0:.1f}s)", flush=True)
    except Exception as e:
        tb = traceback.format_exc().strip().splitlines()
        # innermost repo frame for triage
        frame = next(
            (l.strip() for l in reversed(tb) if "/root/repo/" in l), "?"
        )
        msg = f"{type(e).__name__}: {str(e)[:160]}"
        crashes.append((name, msg, frame))
        print(f"{name:32s} RAISE {msg} | {frame}", flush=True)

print("\n=== CRASHES:", len(crashes), "of", n_run)
for n, m, f in crashes:
    print(f"  {n}: {m}\n      {f}")
ray.shutdown()
